"""SparkSession construction with the engine's default configuration.

Defaults chosen for the iterative link-graph workload:
  - AQE on (runtime re-plan, skew-join splitting) — BASELINE.json north_star
    calls for "AQE-tuned shuffles".
  - Arrow on for all pandas/Arrow UDF boundaries (no per-row Python).
  - UTC session timezone so results compare bit-stably against DuckDB.
  - shuffle partitions sized to cores by default; iterative kernels
    re-partition explicitly on their keys (see plans/partitioning.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst stays at its default TRUE: an experiment with
    # byte-derived coalescing (parallelismFirst=false, 32m advisory) cut
    # task counts but serialized the CPU-heavy small-byte aggregations
    # (graph kernels shuffle ~50 MB but burn ~100 ms/MB of CPU) —
    # q_pagerank 25s -> 69s, q_kcore 9s -> 19s. Byte-sized partitions are
    # the right rule only when bytes, not CPU, dominate (guide §2.2).
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # iterative kernels: hash joins beat sort-merge (no per-superstep
    # re-sort of the persisted scatter table)
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Always use the sort-based (Unsafe) shuffle writer: the bypass-merge
    # writer engages whenever R <= 200 reduce partitions and opens R file
    # streams PER MAP TASK — the engine's V-sized reductions at M=64/R=64
    # paid ~4096 stream opens+merges per superstep (measured: the
    # PageRank iteration's union-reduce drops 1.56 s -> 0.42 s with the
    # sort writer, same plan). On a real cluster R > 200 so bypass never
    # applies — this makes local execution match cluster behavior rather
    # than tuning for local[32].
    "spark.shuffle.sort.bypassMergeThreshold": "1",
    "spark.sql.session.timeZone": "UTC",
    # iterative kernels checkpoint to truncate lineage; keep plans small
    "spark.sql.execution.arrow.maxRecordsPerBatch": "100000",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "dynamicppr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass None and let spark-submit set it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and os.environ.get("SPARK_GRAFT_CPUS"):
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    confs = dict(ENGINE_CONFS)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
