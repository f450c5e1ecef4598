"""Isolated profile of the K2 df update path (q_ppr_updates_df shape).

Replicates bench.py's eng3 setup (32 sources, eps=1e-3, mode='df'),
converges once outside the timed window, then applies N batches with
DYNPPR_PROFILE=1 phase laps. Separate from bench.py (frozen); numbers are
cited in OPTIMIZATION_r06.md per guide §1.4.
"""
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dynamicppr_spark.session import get_spark  # noqa: E402
from dynamicppr_spark.graph import LinkGraph  # noqa: E402
from dynamicppr_spark.operators.ppr import PPREngine  # noqa: E402
from dynamicppr_spark.sources.tpch_graph import (  # noqa: E402
    part_cooccurrence_edges,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BATCHES = int(os.environ.get("PROF_BATCHES", "3"))
UPDATES_PER_BATCH = 200


def _update_batches(spark, vmax, seed, n_batches):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        src = rng.integers(0, vmax, UPDATES_PER_BATCH)
        dst = rng.integers(0, vmax, UPDATES_PER_BATCH)
        ops = np.where(rng.random(UPDATES_PER_BATCH) < 0.8, "+", "-")
        rows = [
            (str(o), int(s), int(d))
            for o, s, d in zip(ops, src, dst)
            if s != d
        ]
        out.append(
            spark.createDataFrame(rows, "op string, src bigint, dst bigint")
        )
    return out


def main():
    parts = max(64, 2 * CPUS)
    spark = get_spark(
        "prof-updates-df", master=f"local[{CPUS}]", shuffle_partitions=parts
    )
    edges = part_cooccurrence_edges(spark, SF_DIR, directed_both_ways=True)
    g = LinkGraph(edges, num_partitions=parts)
    n_vertices = g.num_vertices
    _ = g.scatter_edges.count()
    top = [
        r["src"]
        for r in g.out_degrees.orderBy(F.desc("outdeg"), F.asc("src"))
        .limit(32)
        .collect()
    ]
    eng = PPREngine(g, top, eps=1e-3, mode="df", steps_per_job=1)
    t = time.time()
    eng.push_to_convergence()
    print(f"[prof] initial convergence: {time.time() - t:.2f}s", flush=True)
    seeds = itertools.count(7)
    for rep in range(int(os.environ.get("PROF_REPEATS", "1"))):
        batches = _update_batches(
            spark, n_vertices, seed=next(seeds), n_batches=N_BATCHES
        )
        t = time.time()
        for i, b in enumerate(batches):
            tb = time.time()
            eng.apply_updates(b)
            print(f"[prof] batch {rep}.{i}: {time.time() - tb:.2f}s", flush=True)
        print(f"[prof] repeat {rep} total: {time.time() - t:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
