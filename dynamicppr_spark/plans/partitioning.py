"""Partitioning, skew and plan-inspection policy (SURVEY.md §4).

The engine hand-rolls NO Catalyst rules: Catalyst/AQE already do pushdown,
pruning, join strategy and skew-split. What lives here is the algorithmic
layer Spark cannot infer:

  - choose_num_partitions: size the shuffle width to the data (at 100 TB:
    a small multiple of total executor cores; locally: cores).
  - salted_scatter_sum: two-phase (salt -> partial agg -> final agg)
    reduction for scatter/groupBy(dst) when hub in-degree skews a reducer.
    Associative+commutative sums make this exact — float64 at 1e-6 is
    validated in tests.
  - hub_vertices: degree-threshold hub detection from the degree table.
  - explain_str: capture a formatted plan for plan-shape assertions.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, functions as F


def choose_num_partitions(
    spark, est_rows: int | None = None, rows_per_partition: int = 2_000_000
) -> int:
    """Cores-based floor, scaled up when the edge count calls for it."""
    cores = spark.sparkContext.defaultParallelism
    if est_rows is None:
        return cores
    return max(cores, min(20000, (est_rows + rows_per_partition - 1) // rows_per_partition))


def spread_for_compute(df: DataFrame, key: str, n: int | None = None) -> DataFrame:
    """Hash-repartition ``df`` on high-cardinality ``key`` across the
    cluster's cores BEFORE CPU-heavy narrow compute (guide §2.3 "project
    before the exchange" + §6 input splits): a single-file / one-row-group
    parquet source scans as ONE task, so an expression-heavy projection
    (md5 shingle transforms, per-doc token sorts, pair expansion) placed
    before the first exchange runs single-threaded no matter how many
    cores exist. The exchange here moves the RAW, pre-expansion bytes —
    the cheap side of the expansion — and the explicit partition count
    (defaultParallelism: local cores locally, total executor cores on a
    cluster) keeps AQE's coalescing from folding the small-byte exchange
    back into one partition. On a many-split 100 TB input the exchange
    costs one pass of the projected columns, still dwarfed by the
    downstream expansion it parallelizes; width scales with the cluster,
    not a local constant."""
    spark = df.sparkSession
    if n is None:
        n = spark.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))


def hub_vertices(out_degrees: DataFrame, threshold: int | None = None) -> DataFrame:
    """(src, outdeg) rows whose degree marks them as skew hubs.

    Default threshold: mean + 10x stddev, floor 64 (power-law tail).
    """
    if threshold is None:
        stats = out_degrees.agg(
            F.mean("outdeg").alias("mu"), F.stddev_pop("outdeg").alias("sd")
        ).collect()[0]
        threshold = max(64, int(stats["mu"] + 10 * (stats["sd"] or 0)))
    return out_degrees.filter(F.col("outdeg") >= threshold)


def salted_scatter_sum(
    deltas: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact two-phase sum of ``value`` by ``key`` under key skew.

    Phase 1 groups by (key, salt) — spreading a hot key over ``n_salts``
    reducers — phase 2 sums the ≤n_salts partials per key. Equivalent to
    a plain groupBy().sum() (sum is associative+commutative); use when a
    hub vertex would otherwise bottleneck one reducer.
    """
    salted = deltas.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(value))


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, "unexpected cartesian product:\n" + plan
