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


def test_hygiene_stream_matches_cold_pipeline(spark, tmp_path):
    """CorpusHygieneStreamState under an in-order document feed: the
    final kept set EQUALS the cold composition repetition-gate ->
    exact-dedup(keep min doc_id) -> decontamination over the full
    corpus, and release() frees the state's blocks."""
    import numpy as np
    from dynamicppr_spark.functions.contamination import contamination
    from dynamicppr_spark.functions.repetition import repetition_stats
    from dynamicppr_spark.rddtrack import persistent_rdd_ids
    from dynamicppr_spark.streaming.updates import (
        DOC_STREAM_SCHEMA,
        CorpusHygieneStreamState,
        run_hygiene_stream,
    )

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(200)]
    texts: dict[int, str] = {}
    rows = []
    did = 0
    base_ts = 1_700_000_000
    for b in range(5):
        for j in range(5):
            if did >= 4 and j == 1:  # exact dup of an earlier doc
                t = texts[int(rng.integers(0, did - 1))]
            elif j == 2:  # degenerate loop -> repetition gate
                t = "junk junk junk junk junk"
            elif j == 3:  # poisoned with eval text -> decontamination
                t = "held out eval query answer here"
            else:
                t = " ".join(rng.choice(vocab, size=25))
            texts[did] = t
            rows.append((b, did, t))
            did += 1
    feed = tmp_path / "hygiene_docs"
    feed.mkdir()
    for b in range(5):
        spark.createDataFrame(
            [r for r in rows if r[0] == b],
            "batch_id bigint, doc_id bigint, text string",
        ).withColumn(
            "ts", F.timestamp_seconds(F.lit(base_ts + b))
        ).coalesce(1).write.mode("append").parquet(str(feed))

    ev = spark.createDataFrame(
        [(0, "held out eval query answer here")],
        schema="doc_id bigint, text string",
    )
    docs_all = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    # cold composition
    stats = repetition_stats(docs_all)
    bad = stats.filter(F.col("top_bigram_frac") > 0.9).select("doc_id")
    kept = docs_all.join(bad, "doc_id", "left_anti")
    cont = contamination(kept, ev).filter(
        F.col("contamination_frac") > 0.5
    ).select("doc_id")
    kept = kept.join(cont, "doc_id", "left_anti")
    want = {
        r["doc_id"]
        for r in kept.select(
            F.md5(F.trim(F.lower("text"))).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert want and len(want) < len(texts)

    state = CorpusHygieneStreamState(
        spark,
        eval_docs=ev,
        max_top_bigram_frac=0.9,
        max_contamination=0.5,
    )
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = run_hygiene_stream(state, stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.batches_applied == 5
    assert state.docs_in == len(texts)
    got = {r["doc_id"] for r in state.kept().collect()}
    assert got == want
    assert state.docs_kept == len(want)

    before = persistent_rdd_ids(spark.sparkContext)
    state.release()
    after = persistent_rdd_ids(spark.sparkContext)
    if before is not None and after is not None:
        assert len(after) < len(before)


def test_soak_hygiene_stream_30_batches(spark, tmp_path):
    """30-batch soak for CorpusHygieneStreamState (the repo's long-stream
    discipline): bounded persistent blocks, flat per-batch wall, exact
    final kept-set parity with the cold composition."""
    import time

    import numpy as np
    from dynamicppr_spark.functions.contamination import contamination
    from dynamicppr_spark.rddtrack import persistent_rdd_ids
    from dynamicppr_spark.streaming.updates import (
        DOC_STREAM_SCHEMA,
        CorpusHygieneStreamState,
        run_hygiene_stream,
    )

    rng = np.random.default_rng(71)
    vocab = np.array([f"w{i}" for i in range(80)])
    texts: dict[int, str] = {}
    rows = []
    base_ts = 1_700_000_000
    did = 0
    for b in range(30):
        for j in range(4):
            if did >= 6 and j == 1:
                t = texts[int(rng.integers(0, did - 1))]
            elif j == 2 and b % 3 == 0:
                t = "held out eval query answer here"
            else:
                t = " ".join(rng.choice(vocab, size=20))
            texts[did] = t
            rows.append((b, did, t))
            did += 1
    feed = tmp_path / "hyg30"
    feed.mkdir()
    for b in range(30):
        spark.createDataFrame(
            [r for r in rows if r[0] == b],
            "batch_id bigint, doc_id bigint, text string",
        ).withColumn(
            "ts", F.timestamp_seconds(F.lit(base_ts + b))
        ).coalesce(1).write.mode("append").parquet(str(feed))

    ev = spark.createDataFrame(
        [(0, "held out eval query answer here")],
        schema="doc_id bigint, text string",
    )
    state = CorpusHygieneStreamState(
        spark, eval_docs=ev, max_contamination=0.5
    )
    lat, blocks = [], []
    orig_apply = state.apply

    def timed_apply(batch_df):
        t0 = time.time()
        orig_apply(batch_df)
        lat.append(time.time() - t0)
        ids = persistent_rdd_ids(spark.sparkContext)
        blocks.append(len(ids) if ids is not None else 0)

    state.apply = timed_apply
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = run_hygiene_stream(state, stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.batches_applied == 30
    assert state.docs_in == len(texts)

    docs_all = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    cont = contamination(docs_all, ev).filter(
        F.col("contamination_frac") > 0.5
    ).select("doc_id")
    kept = docs_all.join(cont, "doc_id", "left_anti")
    want = {
        r["doc_id"]
        for r in kept.select(
            F.md5(F.trim(F.lower("text"))).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    got = {r["doc_id"] for r in state.kept().collect()}
    assert got == want

    q4 = max(1, len(blocks) // 4)
    assert max(blocks[-q4:]) <= max(blocks[:q4]) + 10, (blocks[:q4], blocks[-8:])
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    assert med(lat[-q4:]) <= 3.0 * med(lat[:q4]) + 1.0, (
        med(lat[:q4]), med(lat[-q4:])
    )
    state.release()
