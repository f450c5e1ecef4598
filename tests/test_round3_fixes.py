"""Round-3 regression tests for the round-2 advice findings:

- compaction use-after-free (graph.py compact(): the compacted vertex
  cache must be materialized before the predecessor chain's delta
  checkpoint blocks are freed),
- deterministic duplicate-'+' weight rule (df and bcsr agree on max-w),
- bcsr per-source convergence flag (max per-source ||r||_1 vs eps, not
  the sum over sources).
"""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.operators.local_push import (
    apply_batch_local,
    build_local_csr,
)
from dynamicppr_spark.operators.ppr import PPREngine
from tests import fixtures


def test_compaction_then_vertex_scan_survives_release(spark, make_graph):
    """compact_threshold_rows small enough that batch 3 triggers
    auto-compaction; with_updates then release()s the pre-compaction
    child. The compacted graph's vertices/degrees must still be scannable
    (regression: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the lazy vertex
    plan referencing freed nv-slice blocks)."""
    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    g.compact_threshold_rows = 5
    _ = g.out_degrees.count()  # build the derived tables like a kernel would
    _ = g.scatter_edges.count()

    cur = g
    for b in range(3):
        # each batch adds edges to BRAND-NEW vertices -> nv delta slices
        rows = [("+", int(v), int(n + 10 * b + j)) for j, v in enumerate((0, 1))]
        batch = spark.createDataFrame(rows, "op string, src bigint, dst bigint")
        new = cur.with_updates(batch)
        if cur is not g:
            cur.release(keep=new)
        cur = new

    # the crash was on the first action touching the compacted vertices
    nv = cur.vertices.count()
    assert nv == n + 6
    assert cur.out_degrees.count() > 0
    assert cur.num_edges == len(np.unique(edges, axis=0)) + 6
    cur.release()
    g.release()


def test_weighted_duplicate_insert_rule_df_vs_bcsr(spark, make_graph):
    """Duplicate '+' of the same (src,dst) in one batch: both paths keep
    the MAX weight (deterministic, order-free)."""
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)]
    edf = spark.createDataFrame(rows, "src bigint, dst bigint, w double")
    from dynamicppr_spark.graph import LinkGraph

    g = LinkGraph(edf, num_partitions=4)
    batch = spark.createDataFrame(
        [("+", 0, 2, 2.0), ("+", 0, 2, 7.0), ("+", 0, 2, 5.0)],
        "op string, src bigint, dst bigint, w double",
    )
    g2 = g.with_updates(batch)
    got_df = {(r.src, r.dst): r.w for r in g2.edges.collect()}
    assert got_df[(0, 2)] == 7.0

    csr = build_local_csr(
        np.array([0, 1, 2]), np.array([1, 2, 0]), np.array([1.0, 1.0, 1.0])
    )
    csr2 = apply_batch_local(
        csr,
        ["+", "+", "+"],
        np.array([0, 0, 0]),
        np.array([2, 2, 2]),
        np.array([2.0, 7.0, 5.0]),
    )
    # edge (0,2) sits in 0's slice; find its weight
    s, e = csr2.indptr[0], csr2.indptr[1]
    dsts = csr2.vids[csr2.dst_pos[s:e]]
    w02 = csr2.w[s:e][list(dsts).index(2)]
    assert w02 == 7.0
    g2.release()
    g.release()


def test_bcsr_converged_flag_is_per_source(spark, make_graph):
    """With N sources each converged to eps, the engine must report
    converged even though the summed L1 could exceed eps."""
    edges, n = fixtures.two_cliques_bridge()
    eng = PPREngine(
        make_graph(edges, n), [0, 1, 2, 6, 7], eps=1e-5, mode="bcsr"
    )
    eng.push_to_convergence()
    assert eng._converged is True
    assert eng.metrics.history[-1]["max_l1"] <= 1e-5


@pytest.mark.parametrize("n_batches", [2])
def test_bcsr_adjust_broadcast_freed(spark, make_graph, n_batches):
    """The per-batch AdjustmentPlan broadcast is unpersisted after its
    push job consumes it (no accumulation over update streams)."""
    edges, n = fixtures.two_cliques_bridge()
    eng = PPREngine(make_graph(edges, n), [0], eps=1e-5, mode="bcsr")
    eng.push_to_convergence()
    for b in range(n_batches):
        batch = spark.createDataFrame(
            [("+", 0, n + b, None)], "op string, src bigint, dst bigint, w double"
        ).select("op", "src", "dst")
        eng.apply_updates(batch)
    assert eng._pending_adjust is None


def test_lsh_cap_no_window_hot_bucket_bounded(spark):
    """The LSH bucket cap must not plan a (band,bsig) window — a hot
    bucket would sort in one task. The salted two-level agg keeps the
    same semantics: smallest max_bucket doc_ids per bucket."""
    from dynamicppr_spark.functions.dedup import minhash_lsh_pairs

    # 30 identical docs -> every band has ONE bucket of size 30 (hot)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)],
        "doc_id bigint, text string",
    )
    pairs = minhash_lsh_pairs(docs, num_hashes=8, bands=4, max_bucket=10)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = pairs.collect()
    assert len(rows) == 10 * 9 // 2      # cap -> C(10,2) pairs
    assert all(r.n_bands == 4 for r in rows)
    # deterministic: the 10 SMALLEST doc_ids survive
    assert max(max(r.doc_a, r.doc_b) for r in rows) == 9


def _plan_as_maps(plan):
    """AdjustmentPlan -> (dict[(u,t)] summed coef, dict[u] factor)."""
    dr = {}
    for u, t, c in zip(plan.u_pos, plan.t_pos, plan.coef):
        dr[(int(u), int(t))] = dr.get((int(u), int(t)), 0.0) + float(c)
    fa = {int(u): float(f) for u, f in zip(plan.ru_pos, plan.factor)}
    return {k: v for k, v in dr.items() if abs(v) > 1e-15}, fa


@pytest.mark.parametrize("weighted", [False, True])
def test_build_adjustment_vectorized_parity(weighted):
    """Vectorized build_adjustment == per-vertex reference formulation on
    random update batches (inserts, deletes, weight changes, dangling
    transitions, brand-new vertices)."""
    from dynamicppr_spark.operators.local_push import (
        _build_adjustment_loop,
        apply_batch_local,
        build_adjustment,
    )

    rng = np.random.default_rng(3)
    n, m = 60, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)) if weighted else None
    # make vertex 59 dangling and 58 isolated for transition coverage
    src = src[(src != 59) & (src != 58) | (dst[: len(src)] == -1)]
    dst = dst[: len(src)]
    if w is not None:
        w = w[: len(src)]
    old = build_local_csr(src, dst, w, universe=np.arange(n))

    ops = ["+"] * 30 + ["-"] * 20
    bs = rng.integers(0, n + 5, 50)   # includes brand-new vertices
    bd = rng.integers(0, n + 5, 50)
    bw = rng.uniform(0.5, 2.0, 50) if weighted else None
    new = apply_batch_local(old, ops, bs, bd, bw)

    got = build_adjustment(old, new, 0.15, touched_vids=bs)
    want = _build_adjustment_loop(old, new, 0.15, touched_vids=bs)
    g_dr, g_fa = _plan_as_maps(got)
    w_dr, w_fa = _plan_as_maps(want)
    assert set(g_dr) == set(w_dr)
    for k in w_dr:
        assert abs(g_dr[k] - w_dr[k]) < 1e-12, k
    assert g_fa == pytest.approx(w_fa)


def test_build_adjustment_large_batch_is_fast():
    """10^5-row batch adjustment builds without a per-vertex driver loop
    (the round-2 bcsr bottleneck): well under a second of driver time."""
    import time

    from dynamicppr_spark.operators.local_push import (
        apply_batch_local,
        build_adjustment,
    )

    rng = np.random.default_rng(5)
    n, m = 200_000, 2_000_000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    old = build_local_csr(src[keep], dst[keep], universe=np.arange(n))

    nb = 100_000
    bs = rng.integers(0, n, nb)
    bd = rng.integers(0, n, nb)
    ops = np.where(rng.random(nb) < 0.7, "+", "-").tolist()
    new = apply_batch_local(old, ops, bs, bd)
    t0 = time.time()
    plan = build_adjustment(old, new, 0.15, touched_vids=bs)
    dt = time.time() - t0
    assert len(plan.u_pos) > 0
    assert dt < 5.0, f"adjustment build took {dt:.2f}s"  # ~0.1-0.5s typical


def _weighted_exact_ppr(edges_w, n, source, alpha=0.15):
    """pi = alpha * (I - (1-alpha) P^T)^-1 e_s with P row-normalized by
    out-weight sums; dangling rows self-loop."""
    P = np.zeros((n, n))
    for s, d, w in edges_w:
        P[int(s), int(d)] += w
    row = P.sum(axis=1)
    for i in range(n):
        if row[i] > 0:
            P[i] /= row[i]
        else:
            P[i, i] = 1.0
    e = np.eye(n)[:, source]
    return alpha * np.linalg.solve(np.eye(n) - (1 - alpha) * P.T, e)


def _df_scores(eng, n, source):
    out = np.zeros(n)
    for r in eng.scores().collect():
        if int(r["source"]) == source:
            out[int(r["vid"])] = float(r["score"])
    return out


def test_weighted_static_ppr_df_matches_exact(spark):
    """VERDICT round-2 item 6: df-mode WEIGHTED static PPR vs the exact
    linear solve (only the bcsr path had this gate)."""
    from dynamicppr_spark.graph import LinkGraph

    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
             (2, 3, 4.0), (3, 0, 0.5)]
    n = 4
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    vdf = spark.createDataFrame([(i,) for i in range(n)], "vid bigint")
    g = LinkGraph(edf, vertices=vdf, num_partitions=4)
    eng = PPREngine(g, [0], eps=1e-6, mode="df")
    eng.push_to_convergence()
    np.testing.assert_allclose(
        _df_scores(eng, n, 0), _weighted_exact_ppr(edges, n, 0), atol=1e-6
    )


def test_weighted_dynamic_ppr_df_metamorphic(spark):
    """df-mode WEIGHTED K2: dynamic maintenance over weighted update
    batches (insert, delete, weight change, dangling transition) ==
    exact solve on the final graph."""
    from dynamicppr_spark.graph import LinkGraph

    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
             (2, 3, 4.0), (3, 0, 0.5), (4, 0, 1.0)]
    n = 5
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    vdf = spark.createDataFrame([(i,) for i in range(n)], "vid bigint")
    g = LinkGraph(edf, vertices=vdf, num_partitions=4)
    eng = PPREngine(g, [0], eps=1e-5, mode="df")
    eng.push_to_convergence()

    batches = [
        # weight change on (0,1), new weighted edge, delete (2,3)
        [("+", 0, 1, 5.0), ("+", 1, 3, 1.5), ("-", 2, 3, None)],
        # dangling transition: 3 loses its only out-edge; 4 -> dangling
        [("-", 3, 0, None), ("-", 4, 0, None)],
        # re-insert from a dangling vertex
        [("+", 3, 2, 2.5)],
    ]
    final = {(s, d): w for s, d, w in edges}
    for b in batches:
        bdf = spark.createDataFrame(
            b, "op string, src bigint, dst bigint, w double"
        )
        eng.apply_updates(bdf)
        for op, s, d, w in b:
            if op == "+":
                final[(s, d)] = w
            else:
                final.pop((s, d), None)

    want = _weighted_exact_ppr(
        [(s, d, w) for (s, d), w in final.items()], n, 0
    )
    np.testing.assert_allclose(_df_scores(eng, n, 0), want, atol=2e-5)


def test_decremental_cc_split_exact(spark, make_graph):
    """Deleting a bridge SPLITS a component: the decremental path (affected
    -subgraph recompute + warm merge pass) must be exact, and must only
    recompute the affected component."""
    from dynamicppr_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )
    from tests import oracle
    from tests.conftest import df_to_map

    # component A: two cliques + bridge (vertices 0..11); component B:
    # disjoint cycle (vertices 100..107)
    edges_a, _ = fixtures.two_cliques_bridge()
    cyc = np.array([[100 + i, 100 + (i + 1) % 8] for i in range(8)])
    edges = np.vstack([edges_a, cyc])
    n_all = list(range(12)) + list(range(100, 108))
    g = make_graph(edges)
    base = connected_components(g)

    # delete the clique bridge (5-6 both directions in the fixture)
    batch = spark.createDataFrame(
        [("-", 5, 6, None), ("-", 6, 5, None), ("+", 100, 105, None)],
        "op string, src bigint, dst bigint, w double",
    ).select("op", "src", "dst")
    info = {}
    # 12 of 20 vertices are affected: raise the round-4 fraction gate so
    # this test keeps exercising the subgraph path (the gate's own
    # behavior is pinned in test_round4_fixes.py)
    labels, g2 = connected_components_incremental(
        g, base, batch, info=info, affected_fraction_max=0.9
    )
    got = df_to_map(labels, ["vid"], "component")

    final = [
        (s, d) for s, d in (tuple(e) for e in edges)
        if (s, d) not in [(5, 6), (6, 5)]
    ] + [(100, 105)]
    fe = np.array(final)
    remap = {v: i for i, v in enumerate(sorted(n_all))}
    fe_d = np.array([[remap[s], remap[d]] for s, d in fe])
    want_d = oracle.connected_components(fe_d, len(n_all))
    inv = {i: v for v, i in remap.items()}
    want = {inv[i]: inv[int(c)] for i, c in enumerate(want_d)}
    assert got == want
    assert info["mode"] == "decremental_subgraph"
    # only component A (12 vertices) recomputed, not the 8-vertex cycle
    assert info["subgraph_vertices"] == 12
    assert info["affected_components"] == 1
    g2.release()
    g.release()


def test_lpa_incremental_warm_stable(spark, make_graph):
    """Warm-started LPA equals the cold run when the previous labeling is
    already stable on the updated graph (intra-community insert), and
    terminates without re-flooding."""
    from dynamicppr_spark.operators.lpa import (
        label_propagation,
        label_propagation_incremental,
    )
    from tests.conftest import df_to_map

    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    cold = label_propagation(g, n_iter=10)
    cold_map = df_to_map(cold, ["vid"], "label")

    # insert an edge INSIDE clique 1 that the dedup removed? use a brand
    # new intra-clique pair that keeps communities identical: connect two
    # clique-0 members via a fresh parallel-free pair is already present;
    # instead add a pendant vertex attached to clique 0's center
    batch = spark.createDataFrame(
        [("+", 0, 500, None), ("+", 500, 0, None)],
        "op string, src bigint, dst bigint, w double",
    ).select("op", "src", "dst")
    warm, g2 = label_propagation_incremental(g, cold, batch)
    warm_map = df_to_map(warm, ["vid"], "label")
    # old vertices keep their stable labels; the pendant joins 0's side
    for v in cold_map:
        assert warm_map[v] == cold_map[v], v
    assert warm_map[500] == cold_map[0]
    g2.release()
    g.release()


def test_update_fast_path_matches_distributed_fallback(spark, make_graph):
    """The gated driver-collected batch context (PreparedBatch) and the
    fully distributed formulation must produce identical dynamic-PPR
    results — same algebra, different evaluation site."""
    edges, n = fixtures.two_cliques_bridge()
    script = fixtures.update_script(edges, n, "mixed", n_batches=2)

    def run(gate):
        g = make_graph(edges, n)
        g.driver_batch_max_rows = gate
        eng = PPREngine(g, [0], eps=1e-5, mode="df")
        eng.push_to_convergence()
        for bid in sorted(script["batch_id"].unique()):
            b = script[script["batch_id"] == bid][["op", "src", "dst"]]
            eng.apply_updates(spark.createDataFrame(b))
        out = np.zeros(n)
        for r in eng.scores().collect():
            if int(r["source"]) == 0 and int(r["vid"]) < n:
                out[int(r["vid"])] = float(r["score"])
        return out

    fast = run(1_000_000)
    slow = run(0)  # gate 0 -> every batch takes the distributed path
    np.testing.assert_allclose(fast, slow, atol=2e-5)


def test_pagerank_local_matches_df_and_oracle(spark, make_graph):
    """Gated local-mode K3 == oracle == df path (incl. dangling mass)."""
    from dynamicppr_spark.operators.pagerank import pagerank
    from tests import oracle

    edges, n = fixtures.rmat_graph(n=80, m=400)
    g = make_graph(edges, n)  # rmat leaves some vertices dangling
    want, _ = oracle.pagerank(np.unique(edges, axis=0), n)
    got_local = np.zeros(n)
    for r in pagerank(g, tol=1e-10, max_iter=300, mode="local").collect():
        got_local[int(r["vid"])] = float(r["score"])
    np.testing.assert_allclose(got_local, want, atol=1e-6)
    # auto resolves to local under the gate
    got_auto = np.zeros(n)
    for r in pagerank(g, tol=1e-10, max_iter=300, mode="auto").collect():
        got_auto[int(r["vid"])] = float(r["score"])
    np.testing.assert_allclose(got_auto, got_local, atol=1e-12)
