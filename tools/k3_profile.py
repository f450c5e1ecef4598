"""K3 (PageRank-df) serial-vs-parallel time breakdown (round-4 scaling
evidence, BENCH/BASELINE.md).

Runs fixed-iteration PageRank at one parallelism level and splits wall
time using the Spark UI REST API's completed-stage metrics:

  - executor_run_s : sum of task run time across all tasks (the
    parallelizable work; /cores = its ideal parallel wall)
  - ideal_parallel_s : executor_run_s / cores
  - serial_resid_s : wall - ideal_parallel_s — scheduling, Catalyst,
    py4j round-trips, job submission barriers, driver-side observe reads;
    the part that does NOT shrink with more cores

If serial_resid_s dominates wall at local[32], the measured 8->32
efficiency ceiling for K3-df is (serial + parallel/4) Amdahl, not a
fixable shuffle/stall — the breakdown VERDICT r3 asked for.

Usage: python tools/k3_profile.py [cpus] [iters] [clones]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dynamicppr_spark.graph import LinkGraph  # noqa: E402
from dynamicppr_spark.operators.pagerank import pagerank  # noqa: E402
from dynamicppr_spark.session import get_spark  # noqa: E402
from dynamicppr_spark.sources.tpch_graph import (  # noqa: E402
    part_cooccurrence_edges,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _stage_rows(ui: str) -> list[dict]:
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=30)
    )
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=60,
        )
    )


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    clones = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark(
        "k3-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_confs={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.enabled": "true",
        },
    )
    edges = part_cooccurrence_edges(spark, SF_DIR, directed_both_ways=True)
    if clones > 1:
        stride = (
            edges.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]
            + 1
        )
        edges = edges.withColumn(
            "c", F.explode(F.array(*[F.lit(i) for i in range(clones)]))
        ).select(
            (F.col("src") + F.col("c") * F.lit(stride)).alias("src"),
            (F.col("dst") + F.col("c") * F.lit(stride)).alias("dst"),
        )
    g = LinkGraph(edges, num_partitions=64)
    g.edges.count()
    g.scatter_edges.count()
    ui = spark.sparkContext.uiWebUrl

    before = {s["stageId"] for s in _stage_rows(ui)}
    t0 = time.time()
    pagerank(g, tol=0.0, max_iter=iters, steps_per_job=int(
        os.environ.get("BENCH_PR_STEPS_PER_JOB", "4")
    ))
    wall = time.time() - t0
    time.sleep(2)  # let the last stage land in the UI store
    stages = [s for s in _stage_rows(ui) if s["stageId"] not in before]

    run_ms = sum(s.get("executorRunTime", 0) for s in stages)
    cpu_ns = sum(s.get("executorCpuTime", 0) for s in stages)
    deser_ms = sum(s.get("executorDeserializeTime", 0) for s in stages)
    gc_ms = sum(s.get("jvmGcTime", 0) for s in stages)
    n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
    ideal = run_ms / 1000.0 / cpus
    print(
        json.dumps(
            {
                "cpus": cpus,
                "iters": iters,
                "clones": clones,
                "n_edges": g.num_edges,
                "wall_s": round(wall, 2),
                "n_stages": len(stages),
                "n_tasks": n_tasks,
                "executor_run_s": round(run_ms / 1000.0, 2),
                "executor_cpu_s": round(cpu_ns / 1e9, 2),
                "executor_deser_s": round(deser_ms / 1000.0, 2),
                "jvm_gc_s": round(gc_ms / 1000.0, 2),
                "ideal_parallel_s": round(ideal, 2),
                "serial_resid_s": round(wall - ideal, 2),
                "serial_frac": round((wall - ideal) / wall, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
