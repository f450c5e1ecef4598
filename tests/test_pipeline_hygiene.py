"""End-to-end gates for the corpus pipeline's hygiene stages
(repetition gate + benchmark decontamination in run_corpus_pipeline)."""

from __future__ import annotations

import json
import sys

from pyspark.sql import functions as F


def test_pipeline_hygiene_stages(spark, tmp_path, monkeypatch, capsys):
    """repetition gate -> dedup -> decontamination, each drop accounted
    per stage, final parquet matching the inline composition."""
    from dynamicppr_spark.functions.contamination import contamination
    from dynamicppr_spark.functions.dedup import dedup_corpus
    from dynamicppr_spark.functions.repetition import repetition_stats
    from dynamicppr_spark.rddtrack import persistent_rdd_ids
    from jobs.run_corpus_pipeline import main

    persisted_before = persistent_rdd_ids(spark.sparkContext)

    rows = []
    # 20 normal diverse docs
    for i in range(20):
        rows.append(
            (i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}", "en")
        )
    # 2 degenerate loops (top_bigram_frac = 1.0)
    rows += [(100, "spam spam spam spam spam", "en"),
             (101, "loop loop loop loop", "en")]
    # 2 exact duplicates of doc 0
    rows += [(102, rows[0][1], "en"), (103, rows[0][1], "en")]
    # 1 doc made entirely of eval text
    rows += [(104, "held out benchmark question answer pair", "en")]
    docs_path = tmp_path / "docs"
    spark.createDataFrame(
        rows, schema="doc_id bigint, text string, lang string"
    ).write.parquet(str(docs_path))

    eval_path = tmp_path / "eval"
    spark.createDataFrame(
        [(0, "held out benchmark question answer pair")],
        schema="doc_id bigint, text string",
    ).write.parquet(str(eval_path))

    out = tmp_path / "corpus"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_corpus_pipeline.py",
            "--docs", str(docs_path),
            "--out", str(out),
            "--max-top-bigram-frac", "0.9",
            "--decontam-eval", str(eval_path),
            "--max-contamination", "0.5",
        ],
    )
    main()
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    m = json.loads(line)

    assert m["docs_in"] == 25
    assert m["dropped_per_stage"]["repetition"] == 2  # 100, 101
    assert m["dropped_per_stage"]["dedup"] == 2  # 102, 103
    assert m["dropped_per_stage"]["contamination"] == 1  # 104
    assert m["dropped_as_dup"] == 2
    assert m["docs_out"] == 20

    # the written corpus equals the inline composition of the same ops
    docs = spark.read.parquet(str(docs_path))
    stats = repetition_stats(docs)
    bad = stats.filter(F.col("top_bigram_frac") > 0.9).select("doc_id")
    kept = dedup_corpus(docs.join(bad, "doc_id", "left_anti"))
    ev = spark.read.parquet(str(eval_path))
    cont = contamination(kept, ev).filter(
        F.col("contamination_frac") > 0.5
    ).select("doc_id")
    kept = kept.join(cont, "doc_id", "left_anti")
    want_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    got_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(out)).select("doc_id").collect()
    }
    assert got_ids == want_ids
    # no stray caches left behind by the job's stage accounting
    persisted_after = persistent_rdd_ids(spark.sparkContext)
    if persisted_before is not None and persisted_after is not None:
        assert persisted_after <= persisted_before
