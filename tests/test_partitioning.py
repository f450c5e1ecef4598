"""Skew/partitioning policy: salted two-phase sum exactness, hub detection,
plan-shape assertions (pushdown + no cartesian)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dynamicppr_spark.plans.partitioning import (
    assert_no_cartesian,
    choose_num_partitions,
    explain_str,
    hub_vertices,
    salted_scatter_sum,
)
from tests import fixtures


def test_salted_sum_exact(spark):
    """Two-phase salted reduction == plain groupBy sum (float64, 1e-12)."""
    rng = np.random.default_rng(42)
    rows = [(int(k), float(v)) for k, v in
            zip(rng.integers(0, 5, 4000), rng.standard_normal(4000))]
    df = spark.createDataFrame(rows, "vid bigint, dr double")
    plain = {r.vid: r.s for r in df.groupBy("vid").agg(F.sum("dr").alias("s")).collect()}
    salted = {r.vid: r.dr for r in salted_scatter_sum(df, "vid", "dr", n_salts=8).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-12


def test_hub_detection(spark, make_graph):
    edges, n = fixtures.star_graph(200)  # hub 0 with outdeg 199
    g = make_graph(edges, n)
    hubs = hub_vertices(g.out_degrees).collect()
    assert [r.src for r in hubs] == [0]


def test_choose_num_partitions(spark):
    cores = spark.sparkContext.defaultParallelism
    assert choose_num_partitions(spark) == cores
    assert choose_num_partitions(spark, est_rows=10**9) >= 500


def test_scan_pushdown(spark):
    """Filter + projection reach the parquet scan (100 TB hygiene)."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_orderkey") == 7)
        .select("l_orderkey", "l_partkey")
    )
    plan = explain_str(df)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan


def test_no_cartesian_in_kernels(spark, make_graph):
    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    assert_no_cartesian(g.scatter_edges)
    from dynamicppr_spark.operators.triangles import triangle_count

    assert_no_cartesian(triangle_count(g))
