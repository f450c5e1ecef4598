"""CSR gather-scatter fast path (K1 'csr' mode) == DataFrame path == oracle."""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.operators.ppr import PPREngine
from tests import fixtures, oracle


def _scores(eng: PPREngine, n: int, source: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.float64)
    for r in eng.scores().collect():
        if int(r["source"]) == source:
            out[int(r["vid"])] = float(r["score"])
    return out


@pytest.mark.parametrize("name,source", [("path", 0), ("star", 0), ("rmat", 7)])
def test_csr_mode_matches_oracle(spark, make_graph, name, source):
    edges, n = fixtures.ALL_GRAPHS[name]()
    g = make_graph(edges, n)
    eng = PPREngine(g, [source], eps=1e-3, mode="csr")
    m = eng.push_to_convergence()
    want_pi, _, want_steps = oracle.ppr_push_sync(edges, n, source, eps=1e-3)
    assert m.supersteps == want_steps
    np.testing.assert_allclose(_scores(eng, n, source), want_pi, atol=1e-12)


def test_csr_mode_dynamic_updates(spark, make_graph):
    """Dynamic maintenance works identically through the CSR path."""
    edges, n = fixtures.two_cliques_bridge()
    script = fixtures.update_script(edges, n, "mixed", n_batches=2)
    final_edges = fixtures.apply_script_numpy(edges, script)
    eng = PPREngine(make_graph(edges, n), [0], eps=1e-5, mode="csr")
    eng.push_to_convergence()
    import pandas as pd

    for bid in sorted(script["batch_id"].unique()):
        b = script[script["batch_id"] == bid][["op", "src", "dst"]]
        eng.apply_updates(spark.createDataFrame(b))
    want = oracle.ppr_exact(final_edges, n, 0)
    np.testing.assert_allclose(_scores(eng, n, 0), want, atol=1e-5)
