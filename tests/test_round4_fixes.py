"""Round-4 gates (VERDICT r3 "Next round" items).

1. Decremental CC scale guards: affected-fraction gate falls back to a
   cold recompute; the induced-subgraph probe does not broadcast an O(V)
   vertex table past the size cap (plan-level assert); diagnostics jobs
   run only when requested.
2. Incremental triangle counting: global + per-vertex maintenance under
   random ± batches matches a full recount (metamorphic, like K2's gate).
3. md5-derived hyperplane LSH: plane family pinned against the hash
   definition, so the DuckDB oracle for embedding_lsh_ann is exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tests import fixtures, oracle
from tests.conftest import df_to_map


def _batch_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["op", "src", "dst"])
    )


# --------------------------------------------------------- decremental CC
def test_decremental_cc_fraction_gate_full_recompute(spark, make_graph):
    """A delete inside the giant component (affected fraction > gate)
    must skip the subgraph machinery for a plain cold recompute — and
    stay exact."""
    from dynamicppr_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    edges, n = fixtures.two_cliques_bridge()  # one 12-vertex component
    g = make_graph(edges, n)
    base = connected_components(g)
    batch = _batch_df(spark, [("-", 5, 6), ("-", 6, 5)])
    info = {}
    labels, g2 = connected_components_incremental(
        g, base, batch, info=info, affected_fraction_max=0.2
    )
    assert info["mode"] == "full_recompute"
    assert info["affected_vertices"] == 12  # the whole (only) component
    got = df_to_map(labels, ["vid"], "component")
    final = np.array(
        [(s, d) for s, d in edges if (s, d) not in [(5, 6), (6, 5)]]
    )
    want = oracle.connected_components(final, n)
    assert got == {v: int(want[v]) for v in range(n)}
    g2.release()
    g.release()


def test_decremental_cc_shuffled_semi_join_exact(spark, make_graph):
    """broadcast_max_rows=0 forces the shuffled semi-join probe: the
    decremental subgraph path must be exact without any forced broadcast
    of the affected vertex set."""
    from dynamicppr_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    edges_a, _ = fixtures.two_cliques_bridge()
    cyc = np.array([[100 + i, 100 + (i + 1) % 8] for i in range(8)])
    edges = np.vstack([edges_a, cyc])
    g = make_graph(edges)
    base = connected_components(g)
    batch = _batch_df(spark, [("-", 5, 6), ("-", 6, 5)])
    info = {}
    labels, g2 = connected_components_incremental(
        g,
        base,
        batch,
        info=info,
        affected_fraction_max=0.9,
        broadcast_max_rows=0,
    )
    assert info["mode"] == "decremental_subgraph"
    got = df_to_map(labels, ["vid"], "component")
    vids = sorted({int(v) for e in edges for v in e})
    remap = {v: i for i, v in enumerate(vids)}
    final = [
        (s, d) for s, d in (tuple(e) for e in edges)
        if (s, d) not in [(5, 6), (6, 5)]
    ]
    fe = np.array([[remap[s], remap[d]] for s, d in final])
    want_d = oracle.connected_components(fe, len(vids))
    inv = {i: v for v, i in remap.items()}
    assert got == {inv[i]: inv[int(c)] for i, c in enumerate(want_d)}
    g2.release()
    g.release()


def test_induced_subgraph_probe_broadcast_gated(spark):
    """Plan-level: the affected-vertex probe broadcasts below the cap and
    does NOT broadcast above it (the round-3 O(V) forced broadcast is
    gone)."""
    from dynamicppr_spark.operators.components import _induced_subgraph_edges

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "src bigint, dst bigint"
    )
    vids = spark.createDataFrame([(i,) for i in range(30)], "vid bigint")

    # optimized LOGICAL plan: the gate controls the FORCED hint only —
    # the physical planner stays free to auto-broadcast a genuinely small
    # side (at real O(V) sizes its stats exceed the threshold)
    over = _induced_subgraph_edges(edges, vids, n_aff=30, broadcast_max_rows=10)
    plan_over = over._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in plan_over

    under = _induced_subgraph_edges(edges, vids, n_aff=5, broadcast_max_rows=10)
    plan_under = under._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in plan_under
    # both produce identical row sets either way
    assert sorted(map(tuple, over.collect())) == sorted(
        map(tuple, under.collect())
    )


def test_decremental_cc_diag_jobs_gated(spark, make_graph):
    """The affected_components diagnostic count runs ONLY when an info
    dict is passed (it is an extra Spark job per delete batch)."""
    from dynamicppr_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    base = connected_components(g).persist()
    base.count()
    sc = spark.sparkContext

    def jobs_for(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))

    batch = _batch_df(spark, [("-", 5, 6), ("-", 6, 5)])

    def run(diag):
        labels, g2 = connected_components_incremental(
            g, base, batch, info=({} if diag else None),
            affected_fraction_max=0.9,
        )
        labels.count()
        g2.release(keep=g)

    n_without = jobs_for("cc-inc-nodiag", lambda: run(False))
    n_with = jobs_for("cc-inc-diag", lambda: run(True))
    assert n_without < n_with
    base.unpersist()
    g.release()


# --------------------------------------------------- incremental triangles
@pytest.mark.parametrize("kind", ["inserts", "deletes", "mixed"])
def test_triangle_count_incremental_metamorphic(spark, make_graph, kind):
    """Maintained global count across random ± batches == full recount on
    the final graph (and on every intermediate graph)."""
    from dynamicppr_spark.operators.triangles import (
        triangle_count,
        triangle_count_incremental,
    )

    edges, n = fixtures.rmat_graph(n=64, m=300, seed=11)
    script = fixtures.update_script(edges, n, kind, n_batches=3)
    g = make_graph(edges, n)
    count = triangle_count(g).collect()[0]["n"]
    assert count == oracle.triangle_count(edges, n)

    cur_edges = edges
    for bid in sorted(script["batch_id"].unique()):
        b = script[script["batch_id"] == bid][["op", "src", "dst"]]
        info = {}
        count, g2 = triangle_count_incremental(
            g, count, spark.createDataFrame(b), info=info
        )
        cur_edges = fixtures.apply_script_numpy(
            cur_edges, script[script["batch_id"] == bid]
        )
        assert count == oracle.triangle_count(cur_edges, n), (
            f"batch {bid}: {info}"
        )
        g.release(keep=g2)
        g = g2
    g.release()


def test_per_vertex_triangles_incremental(spark, make_graph):
    """Maintained per-vertex counts under a mixed batch == per-vertex
    recount on the updated graph."""
    from dynamicppr_spark.operators.triangles import (
        per_vertex_triangles,
        per_vertex_triangles_incremental,
    )

    edges, n = fixtures.rmat_graph(n=48, m=220, seed=5)
    script = fixtures.update_script(edges, n, "mixed", n_batches=2, seed=3)
    g = make_graph(edges, n)
    counts = per_vertex_triangles(g)

    cur_edges = edges
    for bid in sorted(script["batch_id"].unique()):
        b = script[script["batch_id"] == bid][["op", "src", "dst"]]
        counts, g2 = per_vertex_triangles_incremental(
            g, counts, spark.createDataFrame(b)
        )
        # maintained-state discipline: cut the counts' lineage before
        # releasing the predecessor graph they were derived from
        counts = counts.localCheckpoint()
        cur_edges = fixtures.apply_script_numpy(
            cur_edges, script[script["batch_id"] == bid]
        )
        g.release(keep=g2)
        g = g2
    got = df_to_map(counts, ["vid"], "triangles")
    want = df_to_map(per_vertex_triangles(g), ["vid"], "triangles")
    assert got == want
    g.release()


def test_triangle_noop_batch_is_noop(spark, make_graph):
    """'+' on an existing edge / '-' on a missing edge must not move the
    maintained count (membership change derives from the graphs, not the
    batch ops)."""
    from dynamicppr_spark.operators.triangles import (
        triangle_count,
        triangle_count_incremental,
    )

    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    count = triangle_count(g).collect()[0]["n"]
    batch = _batch_df(
        spark, [("+", 0, 1), ("-", 0, 11)]  # 0->1 exists; 0->11 does not
    )
    info = {}
    count2, g2 = triangle_count_incremental(g, count, batch, info=info)
    assert count2 == count
    assert info == {"gained": 0, "lost": 0}
    g2.release()
    g.release()


def test_triangle_wedge_broadcast_gated(spark):
    """The closing-probe join broadcasts the wedge set only under the row
    cap (a hub delete makes wedges O(deg) — unbounded). The wedge is
    materialized (persisted + counted) before this join, so the
    batch-probe's own broadcast hint lives INSIDE the cached relation's
    plan; the outer logical plan carries exactly the wedge hint — present
    under the cap, absent at cap 0. Results identical either way."""
    from dynamicppr_spark.operators.triangles import _triangles_touching

    edges = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)], "a bigint, b bigint"
    )  # K6 clique, canonical pairs
    delta = spark.createDataFrame([(0, 1)], "a bigint, b bigint")

    # keep= makes this caller the wedge-cache owner AND keeps the result
    # lazy so the plan-level broadcast assertions below see the join
    # (keep=None eagerly checkpoints the result — round-5 leak fix)
    keep: list = []
    tri_b = _triangles_touching(delta, edges, keep=keep)
    plan_b = tri_b._jdf.queryExecution().optimizedPlan().toString()
    assert plan_b.count("strategy=broadcast") == 1

    tri_s = _triangles_touching(
        delta, edges, keep=keep, wedge_broadcast_max_rows=0
    )
    plan_s = tri_s._jdf.queryExecution().optimizedPlan().toString()
    assert plan_s.count("strategy=broadcast") == 0
    assert sorted(map(tuple, tri_b.collect())) == sorted(
        map(tuple, tri_s.collect())
    )
    for df in keep:
        df.unpersist()


# ------------------------------------------------------- md5 LSH planes
def test_md5_planes_pinned():
    """Plane family pinned to its definition: p[j][d-1] =
    md5(f"{j}:{d}")[:8] / 2^31 - 1 — the exact formula the DuckDB oracle
    for embedding_lsh_ann reproduces in SQL."""
    from dynamicppr_spark.functions.similarity import md5_planes

    p = md5_planes(3, 5)
    assert p.shape == (3, 5)
    for j in range(3):
        for d in range(1, 6):
            h = hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:8]
            assert p[j, d - 1] == int(h, 16) / 2**31 - 1
    assert (p >= -1).all() and (p < 1).all()


def test_hyperplane_signatures_match_numpy(spark):
    """Spark-side signatures == straight numpy evaluation of the same
    md5 plane family (UDF plumbing adds nothing)."""
    from dynamicppr_spark.functions.similarity import (
        hyperplane_signatures,
        md5_planes,
    )

    rng = np.random.default_rng(123)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id bigint, embedding array<float>",
    )
    got = df_to_map(
        hyperplane_signatures(emb, dim=16, n_planes=8), ["vec_id"], "bucket"
    )
    planes = md5_planes(8, 16)
    bits = (vecs.astype(np.float64) @ planes.T) > 0
    weights = (1 << np.arange(8)).astype(np.int64)
    want = bits.astype(np.int64) @ weights
    assert got == {i: int(want[i]) for i in range(40)}


def test_min_vid_cache_populated(spark):
    import __spark_entry__ as entrymod

    entrymod._MIN_VID_CACHE.clear()
    df = entrymod.queries()["ppr_top20"](spark, entrymod.SF0001)
    assert df.count() > 0
    assert entrymod.SF0001 in entrymod._MIN_VID_CACHE


def test_ivf_ann_recall(spark):
    """IVF with label-mean centroids: a near-twin in the same cluster is
    retrieved at rank 1 (exactness vs DuckDB is the driver oracle's job —
    this pins retrieval QUALITY on clustered data)."""
    from dynamicppr_spark.functions import similarity as S

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(24):
        lab = i % 4
        v = centers[lab] + rng.standard_normal(16) * 0.3
        twin = v + rng.standard_normal(16) * 0.01
        rows.append((i, [float(x) for x in v], lab))
        rows.append((100 + i, [float(x) for x in twin], lab))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = S.ivf_topk(emb, k=1, n_probe=2, n_queries=10).collect()
    hits = sum(
        1 for r in got if r.rank == 1 and r.vec_id == r.query_id + 100
    )
    assert hits >= 9  # twin shares the cell and dominates cosine


def test_asof_join_semantics(spark):
    """As-of join edge semantics: inclusive tie (right at equal ts is
    taken), no-match -> NULL, latest-wins across multiple earlier rows."""
    from dynamicppr_spark.functions.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, "2026-01-01 00:00:05"),
         (2, 10, "2026-01-01 00:00:10"),
         (3, 10, "2026-01-01 00:00:02"),
         (4, 20, "2026-01-01 00:00:07")],
        "event_id bigint, user_id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2026-01-01 00:00:03", 1.0),
         (10, "2026-01-01 00:00:10", 2.0)],
        "user_id bigint, ts string, pval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, keys=["user_id"], ts="ts",
                    right_values=["pval"])
    got = {r.event_id: r.pval_asof for r in out.collect()}
    # e1 @5s -> 1.0 (latest <= 5); e2 @10s -> 2.0 (inclusive tie);
    # e3 @2s -> None (no earlier); e4 user 20 -> None (no rows)
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None}


@pytest.mark.parametrize("n_sources", [32, 33])
def test_dynamic_df_many_sources(spark, make_graph, n_sources):
    """K2 df-mode at the bench's 32 maintained sources (and at 33 — one
    past the per-source-freeze boundary, exercising the aggregated-L1
    path): every source's maintained scores match the exact solve on the
    final graph. This is the correctness side of the round-4
    edge_updates_per_sec_df-at-32-sources bench number."""
    from dynamicppr_spark.operators.ppr import PPREngine

    edges, n = fixtures.rmat_graph(n=60, m=320, seed=41)
    script = fixtures.update_script(edges, n, "mixed", n_batches=2, seed=13)
    final_edges = fixtures.apply_script_numpy(edges, script)
    eps = 1e-4
    sources = list(range(n_sources))
    eng = PPREngine(make_graph(edges, n), sources, eps=eps, mode="df")
    eng.push_to_convergence()
    for bid in sorted(script["batch_id"].unique()):
        b = script[script["batch_id"] == bid][["op", "src", "dst"]]
        eng.apply_updates(spark.createDataFrame(b))
    got = {(int(r["source"]), int(r["vid"])): float(r["score"])
           for r in eng.scores().collect()}
    rng = np.random.default_rng(7)
    for s in rng.choice(n_sources, size=6, replace=False):
        want = oracle.ppr_exact(final_edges, n, int(s))
        sv = np.zeros(n)
        for (src, vid), sc in got.items():
            if src == int(s) and vid < n:
                sv[vid] = sc
        np.testing.assert_allclose(sv, want, atol=eps)
