"""Multi-source seed distances (BFS hop count) — the link-graph seed
propagation primitive: distance from a trusted/spam/quality seed set is
the classic web-graph feature (TrustRank-style), and "within k hops of a
seed" is the standard crawl-frontier / subgraph-extraction predicate.

Semantics: directed relaxation along (src -> dst); ``dist(v)`` = minimum
hop count from any seed, seeds at 0. Deterministic (min-plus algebra has
a unique fixed point), so fixed-iteration runs are exactly
DuckDB-checkable via an unrolled union-min CTE chain and free-running
runs are pinned against the numpy BFS oracle.

Scale: the per-round push joins only the FRONTIER (rows whose dist
changed last round) against the edge table — after round i the frontier
is the distance-i shell, so total work is O(E) across the whole BFS,
not O(E x rounds). Same superstep discipline as every kernel here:
lineage truncated per round, convergence observed in the checkpoint job
(zero extra jobs), O(1)-row driver traffic.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.superstep import run_superstep_loop

# unreachable sentinel: any real hop count is < 2^62 by construction
_INF = 1 << 62


def seed_distances(
    graph: LinkGraph,
    seeds: Iterable[int],
    n_iter: int = 30,
    until_stable: bool = True,
    ckpt_dir: str | None = None,
    init_dists: DataFrame | None = None,
    weighted: bool = False,
) -> DataFrame:
    """(vid: bigint, dist: bigint) for every vertex REACHABLE from the
    seed set within ``n_iter`` hops (unreachable vertices are absent —
    the overwhelming majority on a sparse web graph, so the result table
    is frontier-sized, not V-sized).

    ``weighted=True`` relaxes with the graph's NON-NEGATIVE edge weight
    ``w`` instead of hop count (synchronous Bellman-Ford; rounds needed
    = the longest shortest path's EDGE count, which ``until_stable``
    handles) and emits ``dist`` as double. Value parity across engines
    still holds exactly: each round's dist is a min over identical
    (prev + w) doubles — no accumulation-order dependence anywhere.

    ``until_stable=True`` (default) stops as soon as a round relaxes
    nothing; ``until_stable=False`` runs exactly ``n_iter`` rounds — the
    fixed-iteration form the DuckDB oracle unrolls. ``init_dists``
    (vid, dist) warm-starts the relaxation (the incremental mode below);
    its rows are re-pushed in round one, and distances only decrease
    from a valid upper bound, so any admissible warm start converges to
    the same fixed point as a cold run.
    """
    seeds = sorted({int(s) for s in seeds})
    if not seeds:
        raise ValueError("seed_distances needs a non-empty seed set")
    if weighted and not graph.weighted:
        raise ValueError("weighted=True needs a weighted graph (w column)")
    p = graph.num_partitions
    step_cost = F.col("w") if weighted else F.lit(1)
    dist_t = "double" if weighted else "bigint"
    edges = graph.edges.select("src", "dst", *(["w"] if weighted else []))
    if graph._persist:
        # ride the graph's persisted base (+ tiny overlay probes per
        # scan) instead of writing a second full edge cache per call;
        # count() materializes the base BEFORE the loop so checkpoint
        # rotation never captures it
        edges.count()
        owned = None
    else:
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        edges.count()
        owned = edges

    seed_col = F.col("vid").isin(seeds)
    if init_dists is not None:
        state0 = graph.vertices.join(
            init_dists.select("vid", F.col("dist").alias("d0")),
            "vid",
            "left",
        ).select(
            "vid",
            F.when(seed_col, F.lit(0))
            .otherwise(F.coalesce("d0", F.lit(_INF)))
            .cast(dist_t)
            .alias("dist"),
        )
        # re-push every known-finite row once: new/updated edges may hang
        # anywhere off the known region
        state0 = state0.withColumn(
            "delta", (F.col("dist") < _INF).cast("double")
        )
    else:
        state0 = graph.vertices.select(
            "vid",
            F.when(seed_col, F.lit(0))
            .otherwise(F.lit(_INF))
            .cast(dist_t)
            .alias("dist"),
            seed_col.cast("double").alias("delta"),
        )
    state0 = state0.repartition(p, "vid")

    # NOTE (round-6): state coalescing (the pagerank.py trick) measured
    # slightly WORSE here (median 4.3 s vs 3.6 s) and was reverted —
    # same reason as kcore.py.

    def step(state: DataFrame, _i: int) -> DataFrame:
        relaxed = (
            state.filter(F.col("delta") > 0)
            .select("vid", "dist")
            .join(edges, F.col("vid") == edges.src)
            .groupBy("dst")
            .agg(F.min(F.col("dist") + step_cost).alias("cand"))
        )
        return (
            state.select("vid", F.col("dist").alias("old"))
            .join(relaxed, state.vid == relaxed.dst, "left")
            .select(
                "vid",
                F.least("old", F.coalesce("cand", F.lit(_INF))).alias(
                    "dist"
                ),
                (
                    F.coalesce("cand", F.lit(_INF)) < F.col("old")
                ).cast("double").alias("delta"),
            )
        )

    result = run_superstep_loop(
        state0,
        step,
        None,
        tol=0.0 if until_stable else -1.0,
        observe={"delta": F.sum("delta"), "n": F.count(F.lit(1))},
        max_iter=n_iter,
        ckpt_dir=ckpt_dir,
        meta={
            "name": "seed_distances",
            "partition_key": "vid",
            "num_partitions": p,
        },
    )
    if owned is not None:
        owned.unpersist()
    out = result.state.filter(F.col("dist") < _INF).select("vid", "dist")
    # ownership handle for maintained-stream callers (see components.py)
    out._dynppr_ckpt_ids = set(result.ckpt_ids)
    return out


def seed_distances_incremental(
    graph: LinkGraph,
    seeds: Iterable[int],
    prev_dists: DataFrame,
    batch: DataFrame,
    max_iter: int = 50,
) -> tuple[DataFrame, LinkGraph]:
    """Seed distances under edge updates: (dists, updated_graph).

    Insert-only batches can only SHORTEN distances, so the previous
    distance table is an admissible upper bound: warm-start the
    relaxation from it and converge in O(perturbation-diameter) rounds
    instead of a cold BFS from the seeds. Any '-' in the batch can
    LENGTHEN distances (the decremental case: a removed edge may have
    carried the only shortest path); like decremental CC before its
    guarded subgraph machinery, the honest answer at this operator's
    maturity is a cold recompute on the updated graph — the guard is
    explicit, not silent.
    """
    has_delete = (
        batch.filter(F.col("op") == "-").limit(1).count() > 0
    )
    g2 = graph.with_updates(batch)
    if has_delete:
        out = seed_distances(g2, seeds, n_iter=max_iter)
    else:
        out = seed_distances(
            g2, seeds, n_iter=max_iter, init_dists=prev_dists
        )
    return out, g2


def seed_distances_sql(
    edges_cte: str,
    seeds: Iterable[int],
    n_iter: int,
    weighted: bool = False,
) -> str:
    """DuckDB oracle form: ``n_iter`` unrolled union-min relaxations over
    an edge CTE exposing (src, dst[, w]) — after round i every vertex at
    true distance <= i (hops) carries its final value, exactly like the
    engine's fixed-iteration run (frontier pruning changes the plan, not
    the algebra). ``weighted=True`` relaxes with ``e.w`` and emits
    DOUBLE dist, mirroring the engine's weighted mode."""
    seed_rows = ", ".join(f"({s})" for s in sorted({int(s) for s in seeds}))
    cost = "e.w" if weighted else "1"
    out_t = "DOUBLE" if weighted else "BIGINT"
    ctes = [
        edges_cte,
        f"d0 AS (SELECT vid, CAST(0 AS {out_t}) AS dist"
        f" FROM (VALUES {seed_rows}) s(vid))",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""d{i} AS (
  SELECT vid, min(dist) AS dist FROM (
    SELECT vid, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS vid, d.dist + {cost} AS dist
    FROM d{i - 1} d JOIN e ON d.vid = e.src
  ) GROUP BY vid)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(vid AS BIGINT) AS vid,"
        f" CAST(dist AS {out_t}) AS dist FROM d{n_iter}"
    )
