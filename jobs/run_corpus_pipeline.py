"""spark-submit entrypoint: the training-data corpus pipeline end-to-end.

Chains the engine's LLM-data operators into the canonical prep flow —
dedup (exact + MinHash-LSH near-dup, `dedup_corpus`) → deterministic
train/val/test split (`hash_split`) → optional per-group quota
(`stratified_sample`) — and writes the prepared corpus plus one JSON
metrics line. Everything downstream of the parquet scan is a pure
dataflow: no collect of corpus-sized data, no windows over full groups,
and every sampling/split decision is an md5-hash function of the row key
(reproducible across engines, re-runs, repartitions, and corpus growth).

    python tools/package.py
    spark-submit --master <cluster> \
        --py-files dist/dynamicppr_spark.zip \
        jobs/run_corpus_pipeline.py --docs <parquet> --out <parquet> \
        [--splits train=0.8,val=0.1,test=0.1] \
        [--quota-col lang --quota 100000] [--no-dedup]

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
    args = ap.parse_args()
    if (args.quota_col is None) != (args.quota is None):
        ap.error("--quota-col and --quota must be given together")

    from dynamicppr_spark.functions.dedup import dedup_corpus
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

    if args.no_dedup:
        kept = docs
    else:
        kept = dedup_corpus(docs)

    if args.quota_col is not None:
        kept = stratified_sample(kept, [args.quota_col], "doc_id", args.quota)

    splits = {}
    for part in args.splits.split(","):
        name, w = part.split("=")
        splits[name.strip()] = float(w)
    out = hash_split(kept, "doc_id", splits)

    out.write.mode("overwrite").partitionBy("split").parquet(args.out)

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
                "dropped_as_dup": (n_in - n_out)
                if (args.no_dedup is False and args.quota_col is None)
                else None,
                "per_split": per_split,
                "wall_seconds": round(time.time() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
