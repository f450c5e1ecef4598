"""K2 dynamic PPR maintenance — the metamorphic gate (SURVEY.md §5.2).

Dynamic maintenance over any update script must match a static recompute
on the final graph. Both runs push to ||r||_1 <= eps, so each is within
eps of the exact linear-system PPR on the final graph; we therefore
compare each against the EXACT solution at atol=eps (the strongest sound
check — stronger than comparing the two eps-accurate runs to each other).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dynamicppr_spark.operators.ppr import PPREngine
from tests import fixtures, oracle

EPS = 1e-6


def _batches(spark, script: pd.DataFrame):
    for bid in sorted(script["batch_id"].unique()):
        b = script[script["batch_id"] == bid][["op", "src", "dst"]]
        yield spark.createDataFrame(b)


def _scores(eng: PPREngine, n: int, source: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.float64)
    for r in eng.scores().collect():
        if int(r["source"]) == source:
            out[int(r["vid"])] = float(r["score"])
    return out


@pytest.mark.parametrize("kind", ["inserts", "deletes", "mixed"])
def test_dynamic_matches_static_on_final_graph(spark, make_graph, kind):
    edges, n = fixtures.two_cliques_bridge()
    script = fixtures.update_script(edges, n, kind, n_batches=2)
    final_edges = fixtures.apply_script_numpy(edges, script)

    eng = PPREngine(make_graph(edges, n), [0], eps=EPS)
    eng.push_to_convergence()
    for batch in _batches(spark, script):
        eng.apply_updates(batch)
    got = _scores(eng, n, 0)

    want = oracle.ppr_exact(final_edges, n, 0)
    np.testing.assert_allclose(got, want, atol=EPS)
    assert eng.metrics.batches_applied == 2
    assert eng.metrics.updates_applied == len(script)


def test_insert_then_delete_is_noop(spark, make_graph):
    """Script (c): +e then -e across batches — state returns to original."""
    edges, n = fixtures.two_cliques_bridge()
    eng = PPREngine(make_graph(edges, n), [0], eps=EPS)
    eng.push_to_convergence()
    before = _scores(eng, n, 0)
    e = (0, 11)  # not in the original graph
    eng.apply_updates(
        spark.createDataFrame([("+", e[0], e[1])], "op string, src bigint, dst bigint")
    )
    mid = _scores(eng, n, 0)
    assert not np.allclose(mid, before, atol=EPS)  # insert had an effect
    eng.apply_updates(
        spark.createDataFrame([("-", e[0], e[1])], "op string, src bigint, dst bigint")
    )
    after = _scores(eng, n, 0)
    np.testing.assert_allclose(after, before, atol=2 * EPS)


def test_hub_targeted_inserts(spark, make_graph):
    """Script (d): all inserts at the star hub (skew path)."""
    edges, n = fixtures.star_graph(30)
    extra = [( "+", 0, d) for d in range(30, 40)]  # hub gains 10 new spokes
    all_edges = np.vstack([edges, [(0, d) for d in range(30, 40)]])
    eng = PPREngine(make_graph(edges, n=40), [0], eps=EPS)
    eng.push_to_convergence()
    eng.apply_updates(
        spark.createDataFrame(extra, "op string, src bigint, dst bigint")
    )
    got = _scores(eng, 40, 0)
    want = oracle.ppr_exact(all_edges, 40, 0)
    np.testing.assert_allclose(got, want, atol=EPS)


def test_dynamic_multi_source(spark, make_graph):
    edges, n = fixtures.cycle_graph(12)
    script = fixtures.update_script(edges, n, "mixed", n_batches=2, seed=7)
    final_edges = fixtures.apply_script_numpy(edges, script)
    eng = PPREngine(make_graph(edges, n), [0, 5], eps=EPS)
    eng.push_to_convergence()
    for batch in _batches(spark, script):
        eng.apply_updates(batch)
    for s in (0, 5):
        np.testing.assert_allclose(
            _scores(eng, n, s), oracle.ppr_exact(final_edges, n, s), atol=EPS
        )
