"""K4 connected components, K5 LPA, K6 triangle counting vs oracles."""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.operators.components import connected_components
from dynamicppr_spark.operators.lpa import label_propagation
from dynamicppr_spark.operators.triangles import per_vertex_triangles, triangle_count
from tests import fixtures, oracle
from tests.conftest import df_to_map


@pytest.mark.parametrize("name", ["path", "cliques", "rmat"])
def test_connected_components_exact(spark, make_graph, name):
    edges, n = fixtures.ALL_GRAPHS[name]()
    g = make_graph(edges, n)
    got = df_to_map(connected_components(g), ["vid"], "component")
    want = oracle.connected_components(edges, n)
    assert {v: got[v] for v in range(n)} == {v: int(want[v]) for v in range(n)}


def test_components_two_islands(spark, make_graph):
    edges = np.array([[0, 1], [1, 2], [5, 6], [6, 7]])
    g = make_graph(edges, n=8)
    got = df_to_map(connected_components(g), ["vid"], "component")
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 5}


@pytest.mark.parametrize("name", ["path", "cliques", "star"])
def test_lpa_exact(spark, make_graph, name):
    edges, n = fixtures.ALL_GRAPHS[name]()
    g = make_graph(edges, n)
    got = df_to_map(label_propagation(g, n_iter=10), ["vid"], "label")
    want = oracle.label_propagation(edges, n, n_iter=10)
    assert {v: got[v] for v in range(n)} == {v: int(want[v]) for v in range(n)}


@pytest.mark.parametrize("name,expected", [("cliques", 40), ("star", 0), ("cycle", 0)])
def test_triangle_count_known(spark, make_graph, name, expected):
    edges, n = fixtures.ALL_GRAPHS[name]()
    g = make_graph(edges, n)
    assert triangle_count(g).collect()[0]["n"] == expected
    assert (
        triangle_count(g, orient_by_degree=True).collect()[0]["n"] == expected
    )


def test_triangle_count_rmat(spark, make_graph):
    edges, n = fixtures.rmat_graph(n=400, m=3000)
    g = make_graph(edges, n)
    want = oracle.triangle_count(edges, n)
    assert triangle_count(g).collect()[0]["n"] == want


def test_per_vertex_triangles(spark, make_graph):
    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    got = df_to_map(per_vertex_triangles(g), ["vid"], "triangles")
    # every clique vertex is in C(5,2)=10 triangles; bridge adds none
    assert all(got[v] == 10 for v in range(n))


def test_clustering_coefficients(spark, make_graph):
    """lcc = 2*tri / (deg*(deg-1)), 0 when deg < 2 — checked against a
    brute-force set computation on the bridged-cliques fixture and a
    random graph."""
    from dynamicppr_spark.operators.triangles import clustering_coefficients

    def brute(edges, n):
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        nbrs: dict[int, set[int]] = {v: set() for v in range(n)}
        for a, b in und:
            nbrs[int(a)].add(int(b))
            nbrs[int(b)].add(int(a))
        out = {}
        for v in range(n):
            d = len(nbrs[v])
            if d < 2:
                if d > 0:
                    out[v] = 0.0
                continue
            t = sum(
                len(nbrs[v] & nbrs[w]) for w in nbrs[v]
            ) // 2
            out[v] = round(2.0 * t / (d * (d - 1)), 6)
        return out

    for edges, n in (
        fixtures.two_cliques_bridge(),
        fixtures.rmat_graph(n=120, m=700, seed=21),
    ):
        g = make_graph(edges, n)
        got = df_to_map(clustering_coefficients(g), ["vid"], "lcc")
        assert got == brute(edges, n)
        g.release()
