"""k-core peeling — the link-graph density filter (vertices surviving
iterated removal of degree < k; the classic web-spam / community-seed
preprocessing step next to PageRank and components).

Semantics: UNDIRECTED (symmetrized, like CC/LPA/triangles). Synchronous
peel: every round removes ALL vertices whose current within-survivor
degree is < k at once — deterministic, engine-independent, and exactly
DuckDB-checkable at a fixed round count by unrolling the same
remove-and-decrement algebra.

Scale: the naive form recomputes degrees over the induced subgraph every
round (O(E) x rounds). Here each round joins only the JUST-REMOVED set
against the edge table and decrements its surviving neighbors — every
edge is touched at most twice across the whole peel (once per endpoint
removal), so total work is O(E) regardless of round count. Same
superstep discipline as the other kernels: lineage truncated per round,
convergence observed inside the checkpoint job, O(1)-row driver traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.superstep import run_superstep_loop


def k_core(
    graph: LinkGraph,
    k: int,
    n_iter: int = 100,
    until_stable: bool = True,
    ckpt_dir: str | None = None,
) -> DataFrame:
    """(vid: bigint, deg: bigint) — the vertices of the k-core with
    their within-core degrees (every ``deg`` >= k once stable; the
    result is empty when no k-core exists).

    ``until_stable=True`` (default) peels until a round removes nothing.
    ``until_stable=False`` runs exactly ``n_iter`` synchronous peel
    rounds — the fixed-iteration form the DuckDB oracle unrolls (``deg``
    is then the degree within the current survivor set, and rows with
    ``deg < k`` may remain if the peel has not yet converged; both
    engines compute the identical intermediate state).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    p = graph.num_partitions
    # degree semantics need the SIMPLE undirected graph: canonicalize to
    # distinct (min, max) pairs, then emit both directions (symmetrized()
    # keeps parallel duplicates, which is fine for min/mode kernels but
    # would double-count degrees here). Round-6: the canonical set is the
    # PER-GRAPH cache shared with the triangle kernels (_canon_cached) —
    # repeated peels on the same graph skip the O(E) distinct, and the
    # both-directions view is a narrow union over the cache instead of a
    # second 2x-sized persisted table. LinkGraph guarantees src != dst,
    # so the canon set needs no self-loop filter.
    from dynamicppr_spark.operators.triangles import _canon_cached

    und = _canon_cached(graph)
    und.count()  # pre-materialize: checkpoint rotation must not capture it
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )

    # init: undirected degree (vertices with no edges have no k>=1 core
    # membership and are absent by construction, matching the oracle)
    state0 = (
        edges.groupBy("src")
        .agg(F.count("*").cast("bigint").alias("deg"))
        .select(
            F.col("src").alias("vid"),
            "deg",
            (F.col("deg") < k).cast("double").alias("delta"),
        )
        .repartition(p, "vid")
    )

    # NOTE (round-6): coalescing each round's state output to a narrow
    # width (the pagerank.py trick) was measured here and REVERTED —
    # q_kcore 4.9 s -> 15.2 s (the peel's two per-round joins replan
    # around the unknown-partitioned narrow leaf); the win is specific
    # to PageRank's union-into-aggregate shape.

    def step(state: DataFrame, _i: int) -> DataFrame:
        doomed = state.filter(F.col("deg") < k).select("vid")
        dec = (
            doomed.join(edges, doomed.vid == edges.src)
            .groupBy("dst")
            .agg(F.count("*").alias("_c"))
        )
        return (
            state.filter(F.col("deg") >= k)
            .join(dec, state.vid == dec.dst, "left")
            .select(
                "vid",
                (F.col("deg") - F.coalesce("_c", F.lit(0)))
                .cast("bigint")
                .alias("deg"),
            )
            .withColumn("delta", (F.col("deg") < k).cast("double"))
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
            "name": "k_core",
            "partition_key": "vid",
            "num_partitions": p,
        },
    )
    # the canonical set stays cached on the graph (shared with the
    # triangle kernels; graph.release() frees it)
    out = result.state.select("vid", "deg")
    # ownership handle for maintained-stream callers (see components.py)
    out._dynppr_ckpt_ids = set(result.ckpt_ids)
    return out


def k_core_sql(edges_cte: str, k: int, n_iter: int) -> str:
    """DuckDB oracle form of the fixed-iteration ``k_core``: ``n_iter``
    unrolled remove-and-decrement rounds over an edge CTE exposing the
    SYMMETRIZED (src, dst) as ``e`` — the same delta algebra, so the
    intermediate state matches the engine's exactly even before the peel
    converges."""
    ctes = [
        edges_cte,
        "c0 AS (SELECT src AS vid, count(*) AS deg FROM e GROUP BY src)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT s.vid, s.deg - coalesce(d.c, 0) AS deg
  FROM (SELECT * FROM c{i - 1} WHERE deg >= {k}) s
  LEFT JOIN (
    SELECT e.dst AS vid, count(*) AS c
    FROM e JOIN (SELECT vid FROM c{i - 1} WHERE deg < {k}) x
      ON e.src = x.vid
    GROUP BY e.dst
  ) d ON s.vid = d.vid)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(vid AS BIGINT) AS vid,"
        f" CAST(deg AS BIGINT) AS deg FROM c{n_iter}"
    )
