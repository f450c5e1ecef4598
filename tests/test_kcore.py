"""k-core kernel (operators/kcore.py): synchronous peel, pinned by the
pure-Python peel in tests/oracle.py — stable cores on structured and
random graphs, the fixed-iteration intermediate state, duplicate-edge
normalization, and argument validation."""

from __future__ import annotations

import numpy as np
import pytest

from tests import fixtures, oracle


def _core_map(df):
    return {r["vid"]: r["deg"] for r in df.collect()}


def test_k_core_structured_graphs(spark, make_graph):
    from dynamicppr_spark.operators.kcore import k_core

    # path: 2-core empty (peels from both ends); cycle: 2-core = itself
    edges, n = fixtures.path_graph(10)
    g = make_graph(edges, n)
    assert _core_map(k_core(g, 2)) == {}
    g.release()

    edges, n = fixtures.cycle_graph(12)
    g = make_graph(edges, n)
    assert _core_map(k_core(g, 2)) == {v: 2 for v in range(n)}
    with pytest.raises(ValueError):
        k_core(g, 0)
    g.release()

    # two 6-cliques + bridge: 5-core keeps both cliques (bridge endpoints
    # have degree 6); oracle cross-check
    edges, n = fixtures.two_cliques_bridge(6)
    g = make_graph(edges, n)
    assert _core_map(k_core(g, 5)) == oracle.k_core(edges, n, 5)
    assert _core_map(k_core(g, 6)) == oracle.k_core(edges, n, 6)
    g.release()


def test_k_core_random_and_duplicates(spark, make_graph):
    """Random graph vs the numpy peel at several k, and parallel /
    reversed duplicate edges must not double-count degrees."""
    from dynamicppr_spark.operators.kcore import k_core

    edges, n = fixtures.rmat_graph(n=70, m=420, seed=13)
    g = make_graph(edges, n)
    for k in (2, 4, 7):
        assert _core_map(k_core(g, k)) == oracle.k_core(edges, n, k), k
    g.release()

    dup = np.vstack([edges, edges[::-1, ::-1], edges[:50]])
    g2 = make_graph(dup, n)
    assert _core_map(k_core(g2, 4)) == oracle.k_core(edges, n, 4)
    g2.release()


def test_k_core_fixed_iteration_intermediate(spark, make_graph):
    """until_stable=False exposes the exact synchronous intermediate the
    DuckDB oracle unrolls: after ONE round on a 10-path with k=2 the two
    endpoints are gone and their neighbors' degrees have dropped to 1."""
    from dynamicppr_spark.operators.kcore import k_core

    edges, n = fixtures.path_graph(10)
    g = make_graph(edges, n)
    got = _core_map(k_core(g, 2, n_iter=1, until_stable=False))
    want = {v: 2 for v in range(1, 9)}
    want[1] = want[8] = 1
    assert got == want
    g.release()
