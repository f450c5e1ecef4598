"""K3 batch PageRank vs numpy power-iteration oracle."""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.operators.pagerank import pagerank
from tests import fixtures, oracle
from tests.conftest import scores_to_array


@pytest.mark.parametrize("name", ["cycle", "star", "cliques"])
def test_pagerank_parity(spark, make_graph, name):
    """Same stopping rule as the oracle -> same trajectory -> ~identical."""
    edges, n = fixtures.ALL_GRAPHS[name]()
    g = make_graph(edges, n)
    got = scores_to_array(pagerank(g, tol=1e-4, max_iter=100), n)
    want, _ = oracle.pagerank(edges, n, tol=1e-4, max_iter=100)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_pagerank_converged_1e6(spark, make_graph):
    """Full-precision gate: allclose 1e-6 (BASELINE.md), incl. dangling."""
    edges, n = fixtures.path_graph(10)  # vertex 9 dangles
    g = make_graph(edges, n)
    got = scores_to_array(pagerank(g, tol=1e-6, max_iter=300), n)
    want, _ = oracle.pagerank(edges, n, tol=1e-6, max_iter=300)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6  # probability mass conserved


def test_pagerank_rmat(spark, make_graph):
    edges, n = fixtures.rmat_graph(n=500, m=3000)
    g = make_graph(edges, n)
    got = scores_to_array(pagerank(g, tol=1e-4, max_iter=100), n)
    want, _ = oracle.pagerank(edges, n, tol=1e-4, max_iter=100)
    np.testing.assert_allclose(got, want, atol=1e-9)
