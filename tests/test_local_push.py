"""Broadcast-CSR local push (mode='bcsr', operators/local_push.py).

Same gates as the distributed path: static allclose vs the exact linear
solve, the K2 metamorphic gate (dynamic == exact on the final graph), and
equality of the lazily-rebuilt distributed graph with the true edge set.
"""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.operators.local_push import (
    LocalCSR,
    apply_batch_local,
    build_local_csr,
)
from dynamicppr_spark.operators.ppr import PPREngine
from tests import fixtures, oracle

EPS = 1e-6


def _scores(eng, n, source):
    out = np.zeros(n, dtype=np.float64)
    for r in eng.scores().collect():
        if int(r["source"]) == source:
            out[int(r["vid"])] = float(r["score"])
    return out


def test_local_csr_roundtrip():
    edges, n = fixtures.rmat_graph(n=300, m=2000)
    uniq = np.unique(edges, axis=0)
    csr = build_local_csr(uniq[:, 0], uniq[:, 1])
    rebuilt = []
    for i in range(csr.n):
        for p in csr.dst_pos[csr.indptr[i] : csr.indptr[i + 1]]:
            rebuilt.append((int(csr.vids[i]), int(csr.vids[p])))
    assert sorted(rebuilt) == sorted(map(tuple, uniq.tolist()))


def test_apply_batch_local_matches_numpy_semantics():
    edges, n = fixtures.path_graph(5)
    csr = build_local_csr(edges[:, 0], edges[:, 1], universe=np.arange(n))
    # same script as test_graph.py::test_with_updates
    new = apply_batch_local(
        csr,
        ["+", "-", "+", "-"],
        np.array([4, 0, 0, 3]),
        np.array([0, 1, 1, 4]),
    )
    got = []
    for i in range(new.n):
        for p in new.dst_pos[new.indptr[i] : new.indptr[i + 1]]:
            got.append((int(new.vids[i]), int(new.vids[p])))
    assert sorted(got) == [(0, 1), (1, 2), (2, 3), (4, 0)]
    assert list(new.vids) == list(range(5))  # universe preserved


def test_static_bcsr_matches_exact(spark, make_graph):
    edges, n = fixtures.two_cliques_bridge()
    eng = PPREngine(make_graph(edges, n), [0], eps=EPS, mode="bcsr")
    eng.push_to_convergence()
    np.testing.assert_allclose(
        _scores(eng, n, 0), oracle.ppr_exact(edges, n, 0), atol=EPS
    )
    assert eng.metrics.supersteps > 0


@pytest.mark.parametrize("kind", ["inserts", "deletes", "mixed"])
def test_dynamic_bcsr_metamorphic(spark, make_graph, kind):
    edges, n = fixtures.two_cliques_bridge()
    script = fixtures.update_script(edges, n, kind, n_batches=2)
    final = fixtures.apply_script_numpy(edges, script)
    eng = PPREngine(make_graph(edges, n), [0], eps=EPS, mode="bcsr")
    eng.push_to_convergence()
    for bid in sorted(script["batch_id"].unique()):
        b = script[script["batch_id"] == bid][["op", "src", "dst"]]
        eng.apply_updates(spark.createDataFrame(b))
    np.testing.assert_allclose(
        _scores(eng, n, 0), oracle.ppr_exact(final, n, 0), atol=EPS
    )
    # the lazily-rebuilt distributed mirror equals the true final edge set
    got = sorted((r.src, r.dst) for r in eng.graph.edges.collect())
    assert got == sorted(map(tuple, final.tolist()))


def test_dynamic_bcsr_multi_source_hub(spark, make_graph):
    edges, _ = fixtures.star_graph(30)
    eng = PPREngine(make_graph(edges, 40), [0, 3], eps=EPS, mode="bcsr")
    eng.push_to_convergence()
    extra = [("+", 0, d) for d in range(30, 40)]
    eng.apply_updates(
        spark.createDataFrame(extra, "op string, src bigint, dst bigint")
    )
    alle = np.vstack([edges, [(0, d) for d in range(30, 40)]])
    for s in (0, 3):
        np.testing.assert_allclose(
            _scores(eng, 40, s), oracle.ppr_exact(alle, 40, s), atol=EPS
        )


def test_bcsr_isolated_source_and_auto_mode(spark, make_graph):
    edges, n = fixtures.cycle_graph(8)
    eng = PPREngine(make_graph(edges, n), [999], eps=1e-4, mode="auto")
    assert eng._resolved_mode() == "bcsr"  # tiny graph fits the gate
    eng.push_to_convergence()
    rows = eng.scores().collect()
    assert len(rows) == 1
    assert rows[0]["vid"] == 999
    assert abs(rows[0]["score"] - 1.0) < 1e-3


def test_bcsr_weighted_matches_weighted_oracle(spark):
    from dynamicppr_spark.graph import LinkGraph

    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0)]
    n = 3
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    vdf = spark.createDataFrame([(i,) for i in range(n)], "vid bigint")
    g = LinkGraph(edf, vertices=vdf, num_partitions=4)
    eng = PPREngine(g, [0], eps=EPS, mode="bcsr")
    eng.push_to_convergence()
    # exact weighted PPR: pi = alpha * e_s (I - (1-alpha) P^T)^-1
    P = np.zeros((n, n))
    for s, d, w in edges:
        P[s, d] = w
    row = P.sum(axis=1, keepdims=True)
    P = P / row
    alpha = 0.15
    pi = alpha * np.linalg.solve(
        np.eye(n) - (1 - alpha) * P.T, np.eye(n)[:, 0]
    )
    np.testing.assert_allclose(_scores(eng, n, 0), pi, atol=EPS)


def test_bcsr_gate_refuses_oversized(spark, make_graph):
    edges, n = fixtures.cycle_graph(12)
    eng = PPREngine(make_graph(edges, n), [0], eps=1e-4, mode="auto")
    eng.max_local_edges = 4  # force the gate below the graph size
    assert eng._resolved_mode() == "df"  # falls back to the distributed path
    eng.push_to_convergence()
    np.testing.assert_allclose(
        _scores(eng, n, 0), oracle.ppr_exact(edges, n, 0), atol=1e-3
    )
