"""Batch PageRank (SURVEY.md §2 K3) — power iteration over the edge table.

Semantics pinned by tests/oracle.py::pagerank (teleport alpha, uniform
dangling redistribution, stop at max|rank'-rank| <= tol).

Scale design:
  - The (huge) scatter table (src, dst, inv_outdeg) is persisted
    pre-partitioned on src (LinkGraph.scatter_edges); per iteration only
    the (small) rank side and the groupBy(dst) partial+final reduction
    shuffle (map-side combine is automatic).
  - EXACTLY ONE Spark job per iteration: the rank state carries a
    ``dang`` flag (computed once), and dangling mass + convergence delta +
    total mass are all captured via ``observe`` during the superstep's
    checkpoint job — no separate scalar aggregates. The dangling mass
    observed at iteration i-1 feeds iteration i's teleport term.
  - Lineage truncated every superstep by the harness; pass ``ckpt_dir``
    for a durable, resumable run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.superstep import SuperstepResult, run_superstep_loop


def pagerank_local(
    graph: LinkGraph,
    alpha: float = 0.15,
    tol: float = 1e-6,
    max_iter: int = 200,
    max_local_edges: int = 32_000_000,
) -> DataFrame:
    """Gated local-mode K3 (round-3): the same power iteration as the
    distributed path, run as one vectorized numpy loop over the collected
    LocalCSR (identical semantics: teleport alpha, uniform dangling
    redistribution, stop at max|rank'-rank| <= tol; exactness gated in
    tests against both the oracle and the df path).

    Same regime split as PPR's broadcast-CSR mode: a single rank VECTOR
    has no per-source parallel axis, so when the CSR fits in memory the
    honest fast path is one dense sweep per iteration (~ms per 10^6
    edges) instead of a distributed shuffle per iteration; beyond the
    ``max_local_edges`` gate the caller uses the df path (mode='auto'
    arbitrates). Raises ValueError past the gate."""
    import numpy as np
    import pandas as pd

    from dynamicppr_spark.operators.local_push import csr_from_graph

    csr = csr_from_graph(graph, max_edges=max_local_edges)
    n = csr.n
    if n == 0:
        return graph.spark.createDataFrame([], "vid bigint, score double")
    has_out = csr.wout > 0.0
    src_per_edge = np.repeat(np.arange(n), np.diff(csr.indptr))
    inv_wout = np.zeros(n)
    inv_wout[has_out] = 1.0 / csr.wout[has_out]
    frac = (
        inv_wout[src_per_edge]
        if csr.w is None
        else csr.w * inv_wout[src_per_edge]
    )
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.bincount(
            csr.dst_pos, weights=r[src_per_edge] * frac, minlength=n
        )
        dm = float(r[~has_out].sum())
        new = alpha / n + (1.0 - alpha) * (dm / n + contrib)
        delta = float(np.abs(new - r).max())
        r = new
        if delta <= tol:
            break
    return graph.spark.createDataFrame(
        pd.DataFrame({"vid": csr.vids, "score": r})
    )


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.15,
    tol: float = 1e-6,
    max_iter: int = 200,
    ckpt_dir: str | None = None,
    ckpt_every: int = 8,
    return_result: bool = False,
    steps_per_job: int = 1,
    init_scores: DataFrame | None = None,
    mode: str = "df",
) -> DataFrame | SuperstepResult:
    """PageRank scores as DataFrame (vid: bigint, score: double).

    ``mode``: 'df' (distributed, default — the 100 TB path), 'local'
    (gated in-memory numpy sweep, ``pagerank_local``), or 'auto' (local
    when the graph fits the gate, else df — the same arbitration as
    PPREngine's bcsr mode).

    ``steps_per_job > 1`` composes iterations into one Spark job each
    (superstep.py docstring). Composition requires a dangling-free graph
    (then the dangling mass is identically 0 and no per-step scalar
    feedback exists — any scalar re-broadcast per step would serialize the
    composed job into per-step broadcast jobs again); on graphs with
    dangling vertices the loop falls back to one step per job.

    ``init_scores`` (vid, score) warm-starts the power iteration — e.g.
    the previous converged ranks after an edge-update batch. Power
    iteration converges to the same fixpoint from any (normalized) start,
    so a warm start is the incremental-maintenance path for K3: a small
    graph delta leaves most scores near-converged and the loop exits in a
    few iterations instead of O(log(1/tol)).
    """
    if mode == "auto":
        mode = "local" if graph.num_edges <= 32_000_000 else "df"
    if mode == "local":
        if init_scores is not None or return_result or ckpt_dir is not None:
            raise ValueError(
                "mode='local' supports plain score computation only; use "
                "mode='df' for warm starts / checkpointing"
            )
        return pagerank_local(graph, alpha=alpha, tol=tol, max_iter=max_iter)
    n = graph.num_vertices
    scatter = graph.scatter_edges  # (src, dst, inv_outdeg), partitioned on src
    scatter.count()  # pre-materialize: checkpoint rotation must not capture it
    if steps_per_job > 1 and graph.maybe_has_dangling_vertex():
        steps_per_job = 1  # per-step dangling-mass feedback forbids composing

    outdeg_vids = graph.out_degrees.select(F.col("src").alias("vid"))
    if init_scores is not None:
        init = graph.vertices.join(
            init_scores.select("vid", F.col("score").alias("s0")), "vid", "left"
        ).select("vid", F.coalesce("s0", F.lit(1.0 / n)).alias("s0"))
    else:
        init = graph.vertices.select("vid", F.lit(1.0 / n).alias("s0"))
    ranks0 = (
        init.join(outdeg_vids.withColumn("dang", F.lit(False)), "vid", "left")
        .select(
            "vid",
            F.col("s0").alias("score"),
            F.lit(float("inf")).alias("delta"),
            F.coalesce("dang", F.lit(True)).alias("dang"),
        )
    )
    # dangling mass of the CURRENT state, observed during the previous
    # iteration's job (or computed once for the initial state); stays 0.0
    # forever on dangling-free graphs (the only composable case)
    dm_box = {
        "dm": float(
            ranks0.filter("dang").agg(F.sum("score")).collect()[0][0] or 0.0
        )
    }

    # broadcast the (small) rank side into the persisted, src-partitioned
    # scatter table: kills the per-iteration rank-side exchange, leaving
    # the groupBy(vid) reduction as the iteration's ONLY shuffle (guide
    # §2.4/§3.1). Byte-gated like PPR's frontier broadcast (~16 B/row);
    # beyond the gate the shuffled join below remains correct. Composed
    # blocks tolerate the broadcast: with AQE each lazily-checkpointed
    # sub-step executes its stages at definition anyway, so the broadcast
    # no longer "serializes" anything that was parallel.
    broadcast_ranks = n * 16 <= (128 << 20)
    # coalesce the V-sized state to a width derived from its ROW COUNT
    # (PPR's _state_parts rule): the state leaf is scanned 2x per
    # iteration (carrier + broadcast build) plus once to checkpoint, so
    # shuffle.partitions-wide leaves cost 3 waves of mostly-empty tasks
    # per iteration (same-process A/B: 5 iters 6.8 s -> 5.1 s at width 8)
    state_width = max(8, min(graph.num_partitions, n // 100_000 + 1))

    def step(ranks: DataFrame, _i: int) -> DataFrame:
        # single-shuffle iteration: raw contributions and the carrier row
        # (old score + dang flag) union into ONE groupBy(vid) reduction —
        # no separate aggregate + merge-join stages (stage barriers are
        # serial driver time that caps scaling efficiency)
        probe = ranks.select("vid", "score")
        if broadcast_ranks:
            probe = F.broadcast(probe)
        contribs = (
            probe
            .join(scatter, probe.vid == scatter.src)
            .select(
                F.col("dst").alias("vid"),
                (F.col("score") * F.col("inv_outdeg")).alias("c"),
                F.lit(None).cast("double").alias("old_score"),
                F.lit(None).cast("boolean").alias("dang"),
            )
        )
        carrier = ranks.select(
            "vid",
            F.lit(0.0).alias("c"),
            F.col("score").alias("old_score"),
            "dang",
        )
        agged = (
            carrier.unionByName(contribs)
            .groupBy("vid")
            .agg(
                F.sum("c").alias("c"),
                F.max("old_score").alias("old_score"),
                F.max("dang").alias("dang"),
            )
        )
        dm = dm_box["dm"]
        base_col = F.lit(alpha / n + (1.0 - alpha) * dm / n)
        new = (
            agged.select(
                "vid",
                (base_col + F.lit(1.0 - alpha) * F.col("c")).alias("score"),
                F.col("old_score"),
                "dang",
            )
            .select(
                "vid",
                "score",
                F.abs(F.col("score") - F.col("old_score")).alias("delta"),
                "dang",
            )
        )
        return new.coalesce(state_width)

    observe = {
        "delta": F.max("delta"),
        "mass": F.sum("score"),
        "dangling_mass": F.sum(F.when(F.col("dang"), F.col("score")).otherwise(0.0)),
        "frontier": F.count(F.lit(1)),
    }

    def on_metrics(m: dict) -> None:
        dm_box["dm"] = float(m.get("dangling_mass") or 0.0)

    result = run_superstep_loop(
        ranks0,
        lambda s, i: step(s, i),
        None,
        tol=tol,
        observe=observe,
        max_iter=max_iter,
        ckpt_dir=ckpt_dir,
        ckpt_every=ckpt_every,
        meta={
            "name": "pagerank",
            "alpha": alpha,
            "tol": tol,
            "partition_key": "vid",
            "num_partitions": graph.num_partitions,
        },
        on_metrics=on_metrics,
        steps_per_job=steps_per_job,
    )
    if return_result:
        result.state = result.state.select("vid", "score")
        return result
    return result.state.select("vid", "score")
