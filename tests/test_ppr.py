"""K1 static forward-push PPR vs numpy oracles (push parity + exact)."""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.operators.ppr import PPREngine, ppr
from tests import fixtures, oracle
from tests.conftest import scores_to_array


def _engine_scores(df, n: int, source: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.float64)
    for r in df.collect():
        if int(r["source"]) == source:
            out[int(r["vid"])] = float(r["score"])
    return out


@pytest.mark.parametrize("name,source", [("path", 0), ("star", 0), ("cycle", 3)])
def test_ppr_push_parity(spark, make_graph, name, source):
    """Engine executes the exact synchronous push schedule of the oracle."""
    edges, n = fixtures.ALL_GRAPHS[name]()
    g = make_graph(edges, n)
    eng = PPREngine(g, [source], eps=1e-3)
    m = eng.push_to_convergence()
    got = _engine_scores(eng.scores(), n, source)
    want_pi, _, want_steps = oracle.ppr_push_sync(edges, n, source, eps=1e-3)
    assert m.supersteps == want_steps
    np.testing.assert_allclose(got, want_pi, atol=1e-12)


def test_ppr_converged_1e6_vs_exact(spark, make_graph):
    """Headline gate: scores within 1e-6 of the exact linear-system PPR."""
    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    got_df = ppr(g, [0], eps=1e-6)
    got = _engine_scores(got_df, n, 0)
    want = oracle.ppr_exact(edges, n, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ppr_multi_source(spark, make_graph):
    """K8: concurrent sources converge independently and correctly."""
    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    eng = PPREngine(g, [0, 7], eps=1e-5)
    eng.push_to_convergence()
    for s in (0, 7):
        got = _engine_scores(eng.scores(), n, s)
        want_pi, _, _ = oracle.ppr_push_sync(edges, n, s, eps=1e-5)
        np.testing.assert_allclose(got, want_pi, atol=1e-10)


def test_ppr_top_k(spark, make_graph):
    edges, n = fixtures.star_graph(20)
    g = make_graph(edges, n)
    eng = PPREngine(g, [1], eps=1e-4)
    eng.push_to_convergence()
    top = eng.top_k(3).collect()
    # hub absorbs every walk (all spokes point to it), then the source
    assert [int(r.vid) for r in top][:2] == [0, 1]
    assert [int(r.rank) for r in top] == [1, 2, 3]


def test_ppr_dangling_self_loop(spark, make_graph):
    """Dangling semantics: residual at outdeg-0 vertex self-loops."""
    edges, n = fixtures.path_graph(4)  # 0->1->2->3, 3 dangles
    g = make_graph(edges, n)
    got = _engine_scores(ppr(g, [0], eps=1e-6), n, 0)
    want = oracle.ppr_exact(edges, n, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got[3] > 0
