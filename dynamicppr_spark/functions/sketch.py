"""Deterministic sketches (SURVEY.md §2d 'sketch/approx' surface).

Spark's built-in sketches (HyperLogLog++ `approx_count_distinct`, GK
`percentile_approx`) are engine-specific: their internals differ from
DuckDB's, so the driver query over them is rows-only checkable. The KMV
(k-minimum-values) distinct-count sketch here is the exactly-checkable
member of the family: hash values come from the md5 family every other
deterministic op in this repo uses, and the estimator is a closed-form
expression over the k smallest DISTINCT hashes — DuckDB computes the
identical value from the identical SQL, so the driver gets a value-hash
green row for a sketch, not just a row count.

KMV estimator [Bar-Yossef et al., RANDOM'02]: hash each value into
[0, 1); if the k-th smallest distinct hash is u_k, the distinct count is
estimated by (k-1)/u_k (unbiased for the uniform order statistic), with
relative standard error ~ 1/sqrt(k-2). Exact below k distinct values.

Scale shape: one map-side-combined DISTINCT on the 60-bit hash, then a
bounded k-smallest merge tree (per input-partition slice, per salt, then
one flatten-slice — ``two_level_kmin``) — the same salted
bounded-aggregation discipline as the LSH bucket cap; no global sort, no
window, and no aggregation buffer that scales with the distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 15 hex chars = 60 bits: fits a signed 64-bit int both in Spark's
# conv(...,16,10) and DuckDB's ('0x'||...)::BIGINT, and 16^15 = 2^60
# exactly so the normalizer is float-exact
_HASH_SPAN = float(1 << 60)
_KMV_SALTS = 32


def _kmv_hash(col: str):
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def two_level_kmin(
    df: DataFrame, group_cols: list[str], h_col: str, k: int
) -> DataFrame:
    """Per-group k smallest values of ``h_col`` as a sorted array ``hs``.

    Exact by the covering-subset argument: any globally k-smallest value
    ranks <= k within every subset containing it, so k-min of per-subset
    k-mins = the global k-min at each merge level.

    Three bounded levels, so NO aggregation buffer ever scales with group
    cardinality: (1) per (group, salt, input-partition) — each such group
    lives entirely in one scan partition, so its collect_list buffer is
    bounded by partition size (maxPartitionBytes), not by the group's
    total distinct count, and is sliced to k before moving on; (2) per
    (group, salt) — merges <= n_partitions arrays of k; (3) per group —
    merges salts arrays of k. No global sort, no window. Shared by the
    KMV sketches and the stratified sampler (functions/sample.py).
    """
    lvl0 = (
        df.withColumn("_salt", F.pmod(F.col(h_col), F.lit(_KMV_SALTS)))
        .withColumn("_p", F.spark_partition_id())
        .groupBy(*group_cols, "_salt", "_p")
        .agg(F.slice(F.array_sort(F.collect_list(h_col)), 1, k).alias("hs"))
    )
    lvl1 = lvl0.groupBy(*group_cols, "_salt").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("hs"))), 1, k
        ).alias("hs")
    )
    return lvl1.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("hs"))), 1, k
        ).alias("hs")
    )


def _kmv_estimate(k: int):
    """(n_hashes, kth_hash, est_distinct) columns over a sorted ``hs``
    array of distinct hashes: exact below k, else (k-1)/u_k."""
    n = F.size("hs")
    kth = F.when(n > 0, F.element_at("hs", n))  # NULL-safe on empty input
    return [
        n.cast("bigint").alias("n_hashes"),
        kth.alias("kth_hash"),
        F.when(n < k, n.cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1) * _HASH_SPAN) / kth.cast("double"), 6
            )
        )
        .alias("est_distinct"),
    ]


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One row (n_hashes, kth_hash, est_distinct): KMV distinct estimate.

    ``n_hashes`` = min(k, true distinct count), ``kth_hash`` the k-th
    smallest distinct 60-bit hash (integer check column — exact oracle
    comparisons prefer ints over rounded floats), ``est_distinct`` the
    estimate: exact when fewer than k distinct values exist, else
    round((k-1) * 2^60 / kth_hash, 6).
    """
    hs = df.select(_kmv_hash(col).alias("h")).distinct()
    return two_level_kmin(hs, [], "h", k).select(*_kmv_estimate(k))


def kmv_distinct_by(
    df: DataFrame, group_cols: list[str], col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV distinct estimate: one row per ``group_cols`` value
    with the same (n_hashes, kth_hash, est_distinct) contract as
    ``kmv_distinct``. The per-group sketch is the mergeable form — the
    k-smallest arrays of two partials union-sort-slice to the sketch of
    the union, which is exactly what ``two_level_kmin``'s second level
    does — so a 100 TB rollup (distinct users per shard, then global)
    composes without rescanning."""
    hs = df.select(*group_cols, _kmv_hash(col).alias("h")).distinct()
    merged = two_level_kmin(hs, group_cols, "h", k)
    return merged.select(*group_cols, *_kmv_estimate(k))


def kmv_distinct_by_sql(
    table: str, group_cols: list[str], col: str, k: int = 256
) -> str:
    """DuckDB-exact oracle for ``kmv_distinct_by`` (per-group row_number
    window in SQL, the salted two-level merge in Spark — same result)."""
    g = ", ".join(group_cols)
    span = float(k - 1) * _HASH_SPAN
    return f"""
    WITH h AS (
      SELECT DISTINCT {g},
        ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}
    ),
    r AS (
      SELECT {g}, h,
             row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn
      FROM h
    ),
    agg AS (
      SELECT {g}, count(*) AS n, max(h) AS kth
      FROM r WHERE rn <= {k} GROUP BY {g}
    )
    SELECT {g},
      CAST(n AS BIGINT) AS n_hashes,
      kth AS kth_hash,
      CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
           ELSE round({span} / CAST(kth AS DOUBLE), 6)
      END AS est_distinct
    FROM agg
    """


def kmv_distinct_sql(table: str, col: str, k: int = 256) -> str:
    """The DuckDB-exact oracle form of ``kmv_distinct`` (same hash family,
    same estimator expression, same rounding)."""
    span = float(k - 1) * _HASH_SPAN
    return f"""
    WITH h AS (
      SELECT DISTINCT
        ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}
    ),
    kmin AS (SELECT h FROM h ORDER BY h LIMIT {k}),
    agg AS (SELECT count(*) AS n, max(h) AS kth FROM kmin)
    SELECT
      CAST(n AS BIGINT) AS n_hashes,
      kth AS kth_hash,
      CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
           ELSE round({span} / CAST(kth AS DOUBLE), 6)
      END AS est_distinct
    FROM agg
    """
