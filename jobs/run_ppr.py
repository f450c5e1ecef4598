"""spark-submit entrypoint: static + dynamic PPR over an edge parquet.

Ship the package alongside (BASELINE.json north_star: "ships via
spark-submit --py-files to multi-executor clusters"):

    python tools/package.py                      # builds dist/dynamicppr_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/dynamicppr_spark.zip \
        jobs/run_ppr.py --edges <parquet> --sources 0,1 \
        [--updates <parquet>] [--eps 1e-6] [--alpha 0.15] \
        [--mode df|csr|bcsr|auto] [--ckpt-dir <dir>] [--resume] \
        [--out <parquet>]

With --resume (requires --ckpt-dir), a killed run continues from its
latest durable checkpoint instead of starting over; alpha/eps/sources
are restored from the checkpoint manifest, so re-submitting the same
command line after a failure is safe even if those flags are omitted.

On a cluster pass no --master here; locally defaults to local[*].
Emits one JSON metrics line on stdout and (optionally) writes scores.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True, help="parquet with (src,dst)")
    ap.add_argument(
        "--sources",
        help="comma-separated vids (optional with --resume: restored "
        "from the checkpoint manifest)",
    )
    ap.add_argument("--updates", help="parquet with (batch_id,op,src,dst)")
    ap.add_argument("--alpha", type=float, default=0.15)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument(
        "--mode", choices=["df", "csr", "bcsr", "auto"], default="df",
        help="df=distributed scatter (100 TB path); csr=per-partition "
        "gather-scatter; bcsr=broadcast-CSR local push (size-gated); "
        "auto=bcsr when the graph fits, else df",
    )
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument(
        "--resume", action="store_true",
        help="continue from the latest checkpoint under --ckpt-dir",
    )
    ap.add_argument(
        "--max-supersteps", type=int, default=None,
        help="stop (checkpointed, resumable) after this many supersteps",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.resume and not args.ckpt_dir:
        ap.error("--resume requires --ckpt-dir")
    if not args.resume and not args.sources:
        ap.error("--sources is required (unless resuming)")

    from dynamicppr_spark.graph import LinkGraph
    from dynamicppr_spark.operators.ppr import PPREngine
    from dynamicppr_spark.session import ENGINE_CONFS

    builder = SparkSession.builder.appName("dynamicppr-run-ppr")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graph = LinkGraph(
        spark.read.parquet(args.edges), num_partitions=args.num_partitions
    )
    sources = (
        [int(s) for s in args.sources.split(",")] if args.sources else None
    )
    if args.resume:
        # alpha/eps (and sources, if omitted) come from the manifest;
        # flags explicitly given on the command line still win
        kw = {}
        if "--alpha" in sys.argv:
            kw["alpha"] = args.alpha
        if "--eps" in sys.argv:
            kw["eps"] = args.eps
        if args.max_supersteps is not None:
            kw["max_supersteps"] = args.max_supersteps
        eng = PPREngine.resume(
            graph, sources, ckpt_dir=args.ckpt_dir, mode=args.mode, **kw
        )
    else:
        kw = (
            {"max_supersteps": args.max_supersteps}
            if args.max_supersteps is not None
            else {}
        )
        eng = PPREngine(
            graph,
            sources,
            alpha=args.alpha,
            eps=args.eps,
            ckpt_dir=args.ckpt_dir,
            mode=args.mode,
            **kw,
        )
    eng.push_to_convergence()
    if args.updates:
        upd = spark.read.parquet(args.updates)
        bids = [r[0] for r in upd.select("batch_id").distinct().orderBy("batch_id").collect()]
        for bid in bids:
            eng.apply_updates(
                upd.filter(F.col("batch_id") == bid).select("op", "src", "dst")
            )
    if args.out:
        eng.scores().write.mode("overwrite").parquet(args.out)
    m = eng.metrics
    print(
        json.dumps(
            {
                "supersteps": m.supersteps,
                "wall_seconds": round(m.wall_seconds, 3),
                "supersteps_per_sec": round(m.supersteps_per_sec, 4),
                "updates_applied": m.updates_applied,
                "updates_per_sec": round(m.updates_per_sec, 4),
                "batches_applied": m.batches_applied,
                "mode": args.mode,
                "sources": eng.sources,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
