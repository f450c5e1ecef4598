"""Round-6 optimization gates: the rewrites must be *result-identical*
and must keep their plan-shape wins (no re-introduced shuffles or
pushdown-duplicated compute)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamicppr_spark.plans.partitioning import explain_str


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "spam spam spam spam spam"),
        (3, "a b"),  # < k tokens: no shingles
        (4, None),
        (5, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_narrow_matches_exploded_reference(spark):
    """The narrow array_min signature == the exploded groupBy-min form
    (same md5 family, same per-(doc, i) minimum)."""
    from dynamicppr_spark.functions.dedup import minhash_signatures
    from dynamicppr_spark.functions.text import shingle_table

    docs = _docs(spark)
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, num_hashes=4, k=3).collect()
    }
    # reference: the pre-round-6 exploded formulation, built inline
    sh = shingle_table(docs, k=3)
    salted = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))).alias("h"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("x"),
    ).select("doc_id", "x.i", "x.h")
    ref_rows = (
        salted.groupBy("doc_id", "i").agg(F.min("h").alias("mh")).collect()
    )
    ref: dict[int, list] = {}
    for r in ref_rows:
        ref.setdefault(r["doc_id"], [None] * 4)[r["i"]] = r["mh"]
    assert got == ref
    assert 3 not in got and 4 not in got  # no-shingle docs absent


def test_minhash_plan_single_exchange(spark):
    """Signature computation keeps exactly one exchange (the spread) —
    the explode + two groupBys of the old form must not come back."""
    from dynamicppr_spark.functions.dedup import minhash_signatures

    import re

    plan = explain_str(minhash_signatures(_docs(spark), num_hashes=4, k=3))
    # one numbered Exchange node (detail sections are "(n) Exchange")
    assert len(re.findall(r"\(\d+\) \w*Exchange", plan)) == 1, plan


def test_repetition_filter_not_pushed_below_spread(spark):
    """A caller filter on a derived stat must NOT be pushed below the
    spread exchange (it would re-run the whole run-length aggregate on
    the single-task scan side — the round-6 q_hygiene regression)."""
    from dynamicppr_spark.functions.repetition import repetition_stats

    bad = repetition_stats(_docs(spark)).filter(
        F.col("top_bigram_frac") > 0.9
    )
    import re

    plan = explain_str(bad)
    # plan details are numbered bottom-up: any Filter with a LOWER node
    # number than the spread exchange sits on the single-task scan side,
    # and must not contain the run-length aggregate HOF (the filter
    # ABOVE the groupBy barrier legitimately evaluates it once)
    exch_no = None
    filters = []
    for block in plan.split("\n\n"):
        lines = block.splitlines()
        if not lines:
            continue
        m = re.match(r"\((\d+)\) (\w+)", lines[0])
        if not m:
            continue
        if "REPARTITION_BY_NUM" in block and m.group(2) == "Exchange":
            exch_no = int(m.group(1))
        if m.group(2) == "Filter":
            filters.append((int(m.group(1)), block))
    assert exch_no is not None, plan
    for no, block in filters:
        if no < exch_no:
            assert "aggregate(" not in block, block
    # and the filter still works
    assert {r["doc_id"] for r in bad.collect()} == {2, 3}


def test_repetition_duplicate_doc_ids_merge_like_exploded_form(spark):
    """Duplicate doc_id rows merge their token/bigram multisets (the
    pre-round-6 exploded-agg semantics), with no cross-row bigrams."""
    from dynamicppr_spark.functions.repetition import repetition_stats

    docs = spark.createDataFrame(
        [(1, "x y"), (1, "y x")], "doc_id bigint, text string"
    )
    r = repetition_stats(docs).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_tokens"] == 4 and row["distinct_tokens"] == 2
    # bigrams: {"x y", "y x"} each once -> top_bc=1 over n_tokens-1=3
    assert abs(row["top_bigram_frac"] - round(1 / 3, 6)) < 1e-9
    assert abs(row["top_token_frac"] - 0.5) < 1e-9


def test_canon_incremental_matches_full_recompute(spark, make_graph):
    """canon(new) patched from canon(old) == a fresh canonical distinct
    over the updated edge set, for inserts, deletes, re-inserts and
    no-op ops."""
    from dynamicppr_spark.operators.triangles import (
        _canon_cached,
        _canon_incremental,
    )
    import tests.fixtures as fixtures

    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    _canon_cached(g)  # prime the old cache
    batch = spark.createDataFrame(
        [
            ("+", 0, n - 1),   # new edge
            ("-", 0, 1),       # delete (both directions exist)
            ("+", 2, 3),       # no-op re-insert of an existing edge
            ("-", 5, 12345),   # no-op delete of a missing edge
        ],
        "op string, src bigint, dst bigint",
    )
    g2 = g.with_updates(batch)
    bp = batch.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    got = {
        (r["a"], r["b"])
        for r in _canon_incremental(g, g2, bp).collect()
    }
    want = {
        (r["a"], r["b"])
        for r in g2.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        ).distinct().collect()
    }
    assert got == want
    g2.release(keep=g)
    g.release()


def test_linkgraph_base_partitioned_on_src_after_fold(spark):
    """The folded dedup+layout must still leave the persisted base
    hash-partitioned on src with the requested width (the co-partitioned
    push join depends on it)."""
    from dynamicppr_spark.graph import LinkGraph

    e = spark.createDataFrame(
        [(i % 7, (i + 1) % 11) for i in range(200)] * 2,  # dupes on purpose
        "src bigint, dst bigint",
    )
    g = LinkGraph(e, num_partitions=8)
    assert g.edges.count() == g.edges.dropDuplicates(["src", "dst"]).count()
    plan = explain_str(g._base_edges)
    assert "hashpartitioning(src" in plan, plan
    g.release()


def test_make_local_frame_one_partition_and_empty_jvm_path(spark):
    """Driver-local frames must stay one-partition (the per-batch tagged
    job otherwise schedules min(rows, defaultParallelism) tasks per
    frame), and EMPTY frames must avoid the empty-pandas createDataFrame
    fallback (a 32-partition pickled-row path costing ~0.4 s per frame
    per batch)."""
    import pandas as pd

    from dynamicppr_spark.graph import make_local_frame

    pdf = pd.DataFrame({"src": [3, 1, 2], "dst": [4, 5, 6]})
    df = make_local_frame(spark, pdf, "src bigint, dst bigint")
    assert df.rdd.getNumPartitions() == 1
    assert sorted((r["src"], r["dst"]) for r in df.collect()) == [
        (1, 5), (2, 6), (3, 4)
    ]

    empty = pd.DataFrame({"src": pd.Series([], dtype="int64")})
    edf = make_local_frame(spark, empty, "src bigint")
    assert edf.schema.simpleString() == "struct<src:bigint>"
    assert edf.count() == 0
    assert edf.rdd.getNumPartitions() <= 1  # range(0) plans 0 partitions
    # the JVM range-based empty relation has no Python evaluation chain
    assert "PythonRDD" not in edf.rdd.toDebugString().decode()
