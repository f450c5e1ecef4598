"""Graph builders over the driver's TPC-H-ish parquet tables.

These exist so the engine's SQL-expressible operators can be checked
against the DuckDB oracle (__spark_entry__.py contract): the edge table is
derived from ``lineitem`` by part co-occurrence (two parts appearing in
the same order), which a plain SQL self-join reproduces exactly.

This is the stand-in for the production corpus graph: at 100 TB the same
shape comes out of sources/repo_files.py (dependency/co-commit links).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def part_cooccurrence_edges(
    spark: SparkSession, sf_dir: str, directed_both_ways: bool = True
) -> DataFrame:
    """(src, dst): parts appearing in the same order (src < dst canonical).

    SQL-oracle equivalent: self-join of lineitem on l_orderkey with
    l_partkey inequality. ``directed_both_ways`` materializes the
    undirected pair in both directions for the directed kernels.
    """
    from dynamicppr_spark.plans.partitioning import spread_for_compute

    # the driver's tables are single-row-group parquet files => the scan
    # is ONE task, and the self-join's probe + partial-distinct would run
    # single-threaded. One tiny exchange of the projected 2-column input
    # spreads the O(sum deg^2) pair expansion across the cores; both join
    # sides derive from the same repartitioned frame, so the exchange is
    # planned once (reused) and the ok-keyed join needs no further shuffle.
    li = spread_for_compute(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    und = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    if not directed_both_ways:
        return und
    return und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def supplier_customer_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=suppkey-space, dst=custkey-space) bipartite order-flow edges.

    Vertex ids are disjoint: suppliers keep s_suppkey, customers are
    offset by 1_000_000 so the two key spaces never collide.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").cast("bigint").alias("src"),
            (F.col("o_custkey") + F.lit(1_000_000)).cast("bigint").alias("dst"),
        )
        .distinct()
    )
