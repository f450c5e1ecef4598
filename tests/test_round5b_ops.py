"""Round-5b pipeline ops: cross-corpus line-level dedup (dedup_lines),
per-group token-budget mixture sampling (budget_sample), and PII
redaction (redact_pii). Each gate recomputes the expected result in pure
Python (brute force / md5 order statistics) — the engine-independent
oracle discipline the DuckDB driver rows then re-check at sf0.01."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _h(v) -> int:
    """The repo-wide 60-bit md5 order statistic (sketch._kmv_hash)."""
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


# ------------------------------------------------------------- dedup_lines
def test_dedup_lines_boilerplate_scrub(spark):
    from dynamicppr_spark.functions.dedup import dedup_lines

    rows = [
        (1, "alpha beta\ncookie banner\nunique one"),
        (2, "cookie banner\ngamma delta\nfooter (c) corp"),
        (3, "footer (c) corp\ncookie banner\nepsilon"),
        (4, "all unique\nnothing shared\n"),  # trailing '' line kept
        (5, "cookie banner\ncookie banner"),  # in-doc repeat: ONE doc
        (6, None),  # null text: absent from output
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_clean"])
        for r in dedup_lines(docs, min_docs=2).collect()
    }
    # 'cookie banner' in docs {1,2,3,5}; 'footer (c) corp' in {2,3};
    # '' appears only in doc 4 (once) -> kept
    assert got == {
        1: (3, 2, "alpha beta\nunique one"),
        2: (3, 1, "gamma delta"),
        3: (3, 1, "epsilon"),
        4: (3, 3, "all unique\nnothing shared\n"),
        5: (2, 0, ""),
    }
    # min_docs=1 scrubs every line; min_docs high keeps every line
    assert all(
        r["n_kept"] == 0 for r in dedup_lines(docs, min_docs=1).collect()
    )
    assert all(
        r["n_kept"] == r["n_lines"]
        for r in dedup_lines(docs, min_docs=99).collect()
    )
    with pytest.raises(ValueError):
        dedup_lines(docs, min_docs=0)


def test_dedup_lines_order_and_custom_sep(spark):
    """Survivor order is the original line order (not count or lexical
    order), and a literal multi-char / regex-metachar separator works."""
    from dynamicppr_spark.functions.dedup import dedup_lines

    rows = [
        (1, "z|common|a|common|m"),
        (2, "common|q"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_lines(docs, sep="|", min_docs=2).collect()
    }
    assert got == {1: "z|a|m", 2: "q"}


# ----------------------------------------------------------- budget_sample
def _expected_budget_sample(rows, budgets):
    """Pure-Python exclusive-prefix rule in (md5, id) order."""
    keep = set()
    for g in {r[1] for r in rows}:
        if g not in budgets:
            continue
        acc = 0
        for did, _, w in sorted(
            (r for r in rows if r[1] == g), key=lambda r: (_h(r[0]), r[0])
        ):
            if acc < budgets[g]:
                keep.add(did)
            acc += w
    return keep


def test_budget_sample_exact_rule_and_edges(spark):
    from dynamicppr_spark.functions.sample import budget_sample

    rows = [(i, "a" if i % 2 else "b", 10 + (i % 7)) for i in range(80)]
    rows += [(1000, "c", 50), (1001, "d", 5)]
    budgets = {"a": 100, "b": 37, "c": 20, "d": 0}
    df = spark.createDataFrame(rows, "doc_id bigint, g string, w bigint")
    got = {
        r["doc_id"]
        for r in budget_sample(df, budgets, "g", "doc_id", "w").collect()
    }
    assert got == _expected_budget_sample(rows, budgets)
    # the crossing row is kept: group c's single 50-token doc survives a
    # budget of 20; a zero budget keeps nothing; missing groups drop
    assert 1000 in got and 1001 not in got
    with pytest.raises(ValueError):
        budget_sample(df, {"a": -1}, "g", "doc_id", "w")
    with pytest.raises(ValueError):
        budget_sample(df, budgets, "g", "doc_id", "w", n_buckets=0)


def test_budget_sample_bucket_and_partition_invariance(spark):
    """Membership is a pure function of (ids, weights, budgets): the
    two-level bucket count and the physical partitioning must not change
    the sample (the df.sample failure mode this op exists to avoid)."""
    from dynamicppr_spark.functions.sample import budget_sample

    rows = [(i, f"g{i % 3}", 1 + (i % 11)) for i in range(300)]
    budgets = {"g0": 120, "g1": 55, "g2": 1}
    df = spark.createDataFrame(rows, "doc_id bigint, g string, w bigint")
    want = _expected_budget_sample(rows, budgets)
    for nb in (1, 7, 4096):
        got = {
            r["doc_id"]
            for r in budget_sample(
                df, budgets, "g", "doc_id", "w", n_buckets=nb
            ).collect()
        }
        assert got == want, nb
    got_rep = {
        r["doc_id"]
        for r in budget_sample(
            df.repartition(13, "w"), budgets, "g", "doc_id", "w"
        ).collect()
    }
    assert got_rep == want


# --------------------------------------------------------------- redact_pii
def test_redact_pii_exact(spark):
    from dynamicppr_spark.functions.text import redact_pii

    rows = [
        (1, "mail bob.smith+x@corp-site.co.uk or 10.0.0.1 now"),
        (2, "two mails a@b.io c.d@e-f.org and 192.168.1.255 8.8.8.8"),
        (3, "no pii here, just 1.2 floats and name@nodot"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["text_redacted"])
        for r in redact_pii(docs).collect()
    }
    assert got == {
        1: (1, 1, "mail <EMAIL> or <IP> now"),
        2: (2, 2, "two mails <EMAIL> <EMAIL> and <IP> <IP>"),
        3: (0, 0, "no pii here, just 1.2 floats and name@nodot"),
    }
    # narrow projection: no shuffle anywhere in the plan
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------- collapse_repeated_lines
def test_collapse_repeated_lines_exact(spark):
    from dynamicppr_spark.functions.dedup import collapse_repeated_lines

    rows = [
        (1, "a\na\nb\na\nc\nc\nc"),   # runs collapse, order kept
        (2, "x"),                      # single line unchanged
        (3, "\n\nq\n\n"),              # empty-string runs collapse too
        (4, None),                     # null absent
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_clean"])
        for r in collapse_repeated_lines(docs).collect()
    }
    assert got == {
        1: (7, 4, "a\nb\na\nc"),
        2: (1, 1, "x"),
        3: (5, 3, "\nq\n"),
    }
    # narrow projection: no shuffle, no explode, no Python UDF
    plan = (
        collapse_repeated_lines(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------- driver contract
def test_driver_registry_alignment():
    """Every queries() entry has an oracle_sql() entry (events_sketch is
    the one documented rows-only exception), no orphan oracles exist, and
    both registries only contain callables / non-empty SQL strings — the
    drift guard for the driver correctness contract."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) - set(o) == {"events_sketch"}
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())
