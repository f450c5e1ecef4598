"""Decontamination gates for functions/contamination.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamicppr_spark.functions.contamination import (
    contamination,
    contamination_by_split,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id bigint, text string")


def test_contamination_exact_counts(spark):
    """Hand-checkable 3-gram overlaps: per-doc shingle and hit counts."""
    train = _docs(
        spark,
        [
            # shingles: "a b c", "b c d" — both in eval doc 100
            (1, "a b c d"),
            # shingles: "x y z" — absent from eval
            (2, "x y z"),
            # shingles: "a b c", "b c x", "c x y" — one hit
            (3, "a b c x y"),
            # too short for a 3-gram: absent from the output
            (4, "a b"),
        ],
    )
    ev = _docs(spark, [(100, "a b c d e")])
    got = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_contaminated"],
            r["contamination_frac"],
        )
        for r in contamination(train, ev).collect()
    }
    assert got == {
        1: (2, 2, 1.0),
        2: (1, 0, 0.0),
        3: (3, 1, round(1 / 3, 6)),
    }


def test_contamination_hot_shingle_multiplicity_is_one(spark):
    """A shingle in EVERY eval doc must count once per train doc — the
    eval-side distinct makes the join multiplicity-1 (the pair-explosion
    guard), not once per eval occurrence."""
    train = _docs(spark, [(1, "p q r")])
    ev = _docs(spark, [(100 + i, "p q r s") for i in range(20)])
    rows = contamination(train, ev).collect()
    assert len(rows) == 1
    assert rows[0]["n_shingles"] == 1
    assert rows[0]["n_contaminated"] == 1


def test_contamination_by_split_consistency(spark):
    """The split form scores exactly the train band, never the eval
    band, and equals the two-table form on the same split."""
    from dynamicppr_spark.functions.sample import hash_split

    docs = _docs(
        spark,
        [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3} common a b") for i in range(80)],
    )
    frac = 0.3
    got = contamination_by_split(docs, eval_frac=frac)
    s = hash_split(docs, "doc_id", {"train": 1 - frac, "eval": frac})
    want = contamination(
        s.filter(F.col("split") == "train"),
        s.filter(F.col("split") == "eval"),
    )
    as_map = lambda df: {  # noqa: E731
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"]) for r in df.collect()
    }
    gm, wm = as_map(got), as_map(want)
    assert gm == wm and len(gm) > 0
    eval_ids = {
        r["doc_id"] for r in s.filter(F.col("split") == "eval").collect()
    }
    assert eval_ids and not (set(gm) & eval_ids)
    with pytest.raises(ValueError, match="eval_frac"):
        contamination_by_split(docs, eval_frac=1.5)
