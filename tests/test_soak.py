"""Long-update-stream soak (VERDICT round-2 item 10): 50+ batches through
the df dynamic path, crossing >=2 auto-compactions, asserting

  - bounded block-manager storage (persistent-RDD count does not grow
    with batch index — the overlay/rotator/compaction bookkeeping frees
    what it allocates),
  - stable per-batch latency (no compounding plan/partition growth),
  - scores still track the exact solve at the end (loose eps: this test
    gates RESOURCE boundedness; precision is gated by the metamorphic
    suite at 1e-5/1e-6).

Marked slow: ~50 distributed batches on local[4].
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from dynamicppr_spark.operators.ppr import PPREngine
from dynamicppr_spark.rddtrack import persistent_rdd_ids
from tests import fixtures, oracle

pytestmark = pytest.mark.slow


def test_soak_50_batches_two_compactions(spark, make_graph):
    edges, n = fixtures.rmat_graph(n=120, m=900)
    g = make_graph(edges, n)
    # force a compaction roughly every ~20 batches (3 rows per batch)
    g.compact_threshold_rows = 60

    eng = PPREngine(g, [0], eps=5e-3, mode="df")
    eng.push_to_convergence()

    rng = np.random.default_rng(17)
    cur = [tuple(e) for e in np.unique(edges, axis=0)]
    cur_set = set(cur)
    lat = []
    blocks = []
    n_batches = 52
    for b in range(n_batches):
        rows = []
        for _ in range(3):
            if cur_set and rng.random() < 0.4:
                s, d = list(cur_set)[int(rng.integers(0, len(cur_set)))]
                rows.append(("-", int(s), int(d)))
                cur_set.discard((s, d))
            else:
                s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
                if s != d:
                    rows.append(("+", s, d))
                    cur_set.add((s, d))
        if not rows:
            continue
        batch = spark.createDataFrame(rows, "op string, src bigint, dst bigint")
        t0 = time.time()
        eng.apply_updates(batch)
        lat.append(time.time() - t0)
        ids = persistent_rdd_ids(spark.sparkContext)
        blocks.append(len(ids) if ids is not None else 0)

    # >=2 compactions actually happened (delta_rows reset below threshold)
    # 52 batches x ~3 rows = ~156 delta rows vs threshold 60 => >=2 folds
    assert eng.graph._delta_rows < 60

    # bounded storage: the last-quarter block count must not exceed the
    # first-quarter count by more than a small constant (leak = monotone
    # growth ~ O(batches))
    q = max(1, len(blocks) // 4)
    first, last = blocks[:q], blocks[-q:]
    assert max(last) <= max(first) + 10, (max(first), max(last), blocks[-8:])

    # stable latency: median of the last quarter within 3x of the first
    # quarter's median (generous — shared noisy box)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    assert med(lat[-q:]) <= 3.0 * med(lat[:q]) + 1.0, (med(lat[:q]), med(lat[-q:]))

    # exactness after the whole stream
    final_edges = np.array(sorted(cur_set), dtype=np.int64)
    want = oracle.ppr_exact(final_edges, n, 0)
    got = np.zeros(n)
    for r in eng.scores().collect():
        if int(r["source"]) == 0 and int(r["vid"]) < n:
            got[int(r["vid"])] = float(r["score"])
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_soak_triangles_30_batches(spark, make_graph):
    """Round-4 soak for the incremental-K6 path: 30 maintained batches
    (crossing compaction), bounded block storage, stable latency, exact
    final count — the r3 exponential-driver-cost bug class only shows up
    on long streams, so every maintained kernel gets a soak."""
    from dynamicppr_spark.operators.triangles import (
        triangle_count,
        triangle_count_incremental,
    )

    edges, n = fixtures.rmat_graph(n=80, m=400, seed=23)
    g = make_graph(edges, n)
    g.compact_threshold_rows = 40
    count = triangle_count(g).collect()[0]["n"]

    rng = np.random.default_rng(29)
    cur_set = {tuple(e) for e in np.unique(edges, axis=0)}
    lat, blocks = [], []
    for b in range(30):
        rows = []
        for _ in range(3):
            if cur_set and rng.random() < 0.4:
                s, d = list(cur_set)[int(rng.integers(0, len(cur_set)))]
                rows.append(("-", int(s), int(d)))
                cur_set.discard((s, d))
            else:
                s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
                if s != d:
                    rows.append(("+", s, d))
                    cur_set.add((s, d))
        if not rows:
            continue
        batch = spark.createDataFrame(rows, "op string, src bigint, dst bigint")
        t0 = time.time()
        count, g2 = triangle_count_incremental(g, count, batch)
        lat.append(time.time() - t0)
        g.release(keep=g2)
        g = g2
        ids = persistent_rdd_ids(spark.sparkContext)
        blocks.append(len(ids) if ids is not None else 0)

    q = max(1, len(blocks) // 4)
    assert max(blocks[-q:]) <= max(blocks[:q]) + 10, (
        max(blocks[:q]), max(blocks[-q:]), blocks[-8:]
    )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    assert med(lat[-q:]) <= 3.0 * med(lat[:q]) + 1.0, (med(lat[:q]), med(lat[-q:]))

    final_edges = np.array(sorted(cur_set), dtype=np.int64)
    assert count == oracle.triangle_count(final_edges, n)
    g.release()
