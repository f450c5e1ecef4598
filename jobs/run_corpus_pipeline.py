"""spark-submit entrypoint: the training-data corpus pipeline end-to-end.

Chains the engine's LLM-data operators into the canonical prep flow —
repetition quality gate (`repetition_stats`) → dedup (exact +
MinHash-LSH near-dup, `dedup_corpus`) → benchmark decontamination
(`contamination` vs an eval parquet) → optional per-group quota
(`stratified_sample`) → deterministic train/val/test split
(`hash_split`) — and writes the prepared corpus plus one JSON metrics
line with a per-stage drop count (no silent drops). Everything
downstream of the parquet scan is a pure dataflow: no collect of
corpus-sized data, no windows over full groups, and every
sampling/split decision is an md5-hash function of the row key
(reproducible across engines, re-runs, repartitions, and corpus growth).

    python tools/package.py
    spark-submit --master <cluster> \
        --py-files dist/dynamicppr_spark.zip \
        jobs/run_corpus_pipeline.py --docs <parquet> --out <parquet> \
        [--splits train=0.8,val=0.1,test=0.1] \
        [--quota-col lang --quota 100000] [--no-dedup] \
        [--max-top-bigram-frac 0.2] [--min-distinct-ratio 0.1] \
        [--decontam-eval <parquet> --max-contamination 0.05]

On a cluster pass no --master here; locally defaults to local[*].
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet with (doc_id,text,...)")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument(
        "--splits", default="train=0.8,val=0.1,test=0.1",
        help="name=weight[,name=weight...]; weights sum to 1",
    )
    ap.add_argument(
        "--quota-col", default=None,
        help="optional group column for a per-group row quota",
    )
    ap.add_argument("--quota", type=int, default=None)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument(
        "--max-top-bigram-frac", type=float, default=None,
        help="drop docs whose most frequent bigram exceeds this share",
    )
    ap.add_argument(
        "--min-distinct-ratio", type=float, default=None,
        help="drop docs whose distinct-token ratio is below this",
    )
    ap.add_argument(
        "--decontam-eval", default=None,
        help="eval-set parquet (doc_id,text); drops contaminated docs",
    )
    ap.add_argument("--max-contamination", type=float, default=None)
    args = ap.parse_args()
    if (args.quota_col is None) != (args.quota is None):
        ap.error("--quota-col and --quota must be given together")
    if (args.decontam_eval is None) != (args.max_contamination is None):
        ap.error(
            "--decontam-eval and --max-contamination must be given together"
        )

    from dynamicppr_spark.functions.contamination import contamination
    from dynamicppr_spark.functions.dedup import dedup_corpus
    from dynamicppr_spark.functions.repetition import repetition_stats
    from dynamicppr_spark.functions.sample import hash_split, stratified_sample
    from dynamicppr_spark.session import ENGINE_CONFS

    builder = SparkSession.builder.appName("dynamicppr-corpus-pipeline")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()
    dropped = {}
    kept = docs
    prev = n_in
    # Per-stage drop accounting costs ONE cached count per enabled stage
    # (the stage output is persisted, so the count materializes the cache
    # the next stage then reads — never a recomputation of the whole
    # chain). All caches are owned here and released after the write.
    pinned = []

    def _stage(df, name):
        nonlocal kept, prev
        kept = df.persist()
        pinned.append(kept)
        cur = kept.count()
        dropped[name] = prev - cur
        prev = cur

    if (
        args.max_top_bigram_frac is not None
        or args.min_distinct_ratio is not None
    ):
        # repetition gate first: cheapest signal, shrinks everything after
        stats = repetition_stats(kept)
        bad = F.lit(False)
        if args.max_top_bigram_frac is not None:
            bad = bad | (
                F.col("top_bigram_frac") > args.max_top_bigram_frac
            )
        if args.min_distinct_ratio is not None:
            bad = bad | (F.col("distinct_ratio") < args.min_distinct_ratio)
        bad_ids = stats.filter(bad).select("doc_id")
        _stage(kept.join(bad_ids, "doc_id", "left_anti"), "repetition")

    if not args.no_dedup:
        _stage(dedup_corpus(kept), "dedup")

    if args.decontam_eval is not None:
        ev = spark.read.parquet(args.decontam_eval)
        contaminated = (
            contamination(kept, ev)
            .filter(F.col("contamination_frac") > args.max_contamination)
            .select("doc_id")
        )
        _stage(kept.join(contaminated, "doc_id", "left_anti"), "contamination")

    if args.quota_col is not None:
        _stage(
            stratified_sample(kept, [args.quota_col], "doc_id", args.quota),
            "quota",
        )

    splits = {}
    for part in args.splits.split(","):
        name, w = part.split("=")
        splits[name.strip()] = float(w)
    out = hash_split(kept, "doc_id", splits)

    out.write.mode("overwrite").partitionBy("split").parquet(args.out)
    for df in pinned:
        df.unpersist()

    per_split = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.out)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_out = sum(per_split.values())
    print(
        json.dumps(
            {
                "docs_in": n_in,
                "docs_out": n_out,
                "dropped_as_dup": dropped.get("dedup"),
                "dropped_per_stage": dropped,
                "per_split": per_split,
                "wall_seconds": round(time.time() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
