"""spark-submit entrypoint: batch kernels (PageRank / CC / LPA / triangles /
seed distances / k-core).

    spark-submit --py-files dist/dynamicppr_spark.zip jobs/run_batch_kernels.py \
        --edges <parquet> --kernel pagerank|components|lpa|triangles|distances|kcore \
        [--tol 1e-6] [--seeds 0,7] [--k 10] [--out <parquet>]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument(
        "--kernel",
        required=True,
        choices=[
            "pagerank", "components", "lpa", "triangles",
            "distances", "kcore",
        ],
    )
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--n-iter", type=int, default=10)
    ap.add_argument(
        "--mode", choices=["df", "local", "auto"], default="df",
        help="pagerank/components: df (distributed, default), local "
        "(gated driver kernel), auto (local when the graph fits)",
    )
    ap.add_argument(
        "--seeds", default="0",
        help="distances: comma-separated seed vertex ids",
    )
    ap.add_argument(
        "--k", type=int, default=10, help="kcore: minimum within-core degree"
    )
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from dynamicppr_spark.graph import LinkGraph
    from dynamicppr_spark.operators import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from dynamicppr_spark.session import ENGINE_CONFS

    builder = SparkSession.builder.appName(f"dynamicppr-{args.kernel}")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graph = LinkGraph(
        spark.read.parquet(args.edges), num_partitions=args.num_partitions
    )
    t0 = time.time()
    if args.kernel == "pagerank":
        out = pagerank(
            graph, tol=args.tol, ckpt_dir=args.ckpt_dir, mode=args.mode
        )
    elif args.kernel == "components":
        out = connected_components(
            graph, ckpt_dir=args.ckpt_dir, mode=args.mode
        )
    elif args.kernel == "lpa":
        out = label_propagation(graph, n_iter=args.n_iter, ckpt_dir=args.ckpt_dir)
    elif args.kernel == "distances":
        from dynamicppr_spark.operators.distances import seed_distances

        seeds = [int(s) for s in args.seeds.split(",") if s != ""]
        out = seed_distances(graph, seeds, ckpt_dir=args.ckpt_dir)
    elif args.kernel == "kcore":
        from dynamicppr_spark.operators.kcore import k_core

        out = k_core(graph, args.k, ckpt_dir=args.ckpt_dir)
    else:
        out = triangle_count(graph, orient_by_degree=True)
    n = out.count()
    wall = time.time() - t0
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"kernel": args.kernel, "rows": n, "wall_seconds": round(wall, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
