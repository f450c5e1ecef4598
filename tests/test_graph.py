"""LinkGraph core: normalization, degrees, CSR blocks, update application."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tests import fixtures, oracle


def test_dedup_and_self_loops(spark, make_graph):
    edges = np.array([[0, 1], [0, 1], [1, 1], [1, 2]])
    g = make_graph(edges)
    got = sorted((r.src, r.dst) for r in g.edges.collect())
    assert got == [(0, 1), (1, 2)]
    assert g.num_vertices == 3


def test_out_degrees(spark, make_graph):
    edges, n = fixtures.star_graph(10)
    g = make_graph(edges, n)
    degs = {r.src: r.outdeg for r in g.out_degrees.collect()}
    assert degs[0] == 9
    assert all(degs[i] == 1 for i in range(1, 10))


def test_csr_blocks_roundtrip(spark, make_graph):
    """CSR blocks must reproduce the exact edge set, sorted per src."""
    edges, n = fixtures.rmat_graph(n=300, m=2000)
    g = make_graph(edges, n)
    blocks = g.csr_blocks().collect()
    rebuilt = []
    for b in blocks:
        srcs, indptr, dsts = b.srcs, b.indptr, b.dsts
        assert len(indptr) == len(srcs) + 1
        assert indptr[-1] == len(dsts)
        for i, s in enumerate(srcs):
            assert s % g.num_partitions == b.part
            for d in dsts[indptr[i] : indptr[i + 1]]:
                rebuilt.append((s, d))
    expect = sorted((int(a), int(b)) for a, b in np.unique(edges, axis=0))
    assert sorted(rebuilt) == expect


def test_with_updates(spark, make_graph):
    edges, n = fixtures.path_graph(5)
    g = make_graph(edges, n)
    batch = spark.createDataFrame(
        [("+", 4, 0), ("-", 0, 1), ("+", 0, 1), ("-", 3, 4)],
        schema="op string, src bigint, dst bigint",
    )
    g2 = g.with_updates(batch)
    got = sorted((r.src, r.dst) for r in g2.edges.collect())
    # '-' then '+' of (0,1) in one batch nets to present (delete applies to
    # the OLD edge set, inserts are unioned after)
    assert got == [(0, 1), (1, 2), (2, 3), (4, 0)]


def test_incremental_csr_patch(spark, make_graph):
    """E9: patched CSR blocks == CSR blocks rebuilt from scratch."""
    edges, n = fixtures.rmat_graph(n=200, m=1500)
    g = make_graph(edges, n)
    _ = g.csr_blocks().count()  # materialize so with_updates patches
    batch = spark.createDataFrame(
        [("+", 3, 180), ("+", 3, 181), ("-", int(edges[0][0]), int(edges[0][1]))],
        "op string, src bigint, dst bigint",
    )
    g2 = g.with_updates(batch)

    def flatten(blocks):
        out = []
        for b in blocks:
            for i, s in enumerate(b.srcs):
                for d in b.dsts[b.indptr[i] : b.indptr[i + 1]]:
                    out.append((s, d))
        return sorted(out)

    patched = flatten(g2.csr_blocks().collect())
    from dynamicppr_spark.graph import LinkGraph

    fresh = LinkGraph(g2.edges, num_partitions=g.num_partitions)
    assert patched == flatten(fresh.csr_blocks().collect())
    assert sorted(patched) == sorted(
        (r.src, r.dst) for r in g2.edges.collect()
    )


def test_sha256_invariant(spark):
    """Content sha256 must survive a Spark round trip (BASELINE.json:15)."""
    pdf = fixtures.repo_files(n_repos=1, paths_per_repo=5, commits_per_repo=2)
    df = spark.createDataFrame(pdf)
    got = df.select("content", F.sha2("content", 256).alias("h")).collect()
    for r in got:
        assert r.h == fixtures.sha256_hex(r.content)
