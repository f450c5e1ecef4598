"""Batch PageRank (SURVEY.md §2 K3) — power iteration over the edge table.

Semantics pinned by tests/oracle.py::pagerank (teleport alpha, uniform
dangling redistribution, stop at max|rank'-rank| <= tol).

Scale design:
  - The (huge) scatter table (src, dst, inv_outdeg) is persisted
    pre-partitioned on src (LinkGraph.scatter_edges); the per-iteration
    rank join keys match that partitioning, so the only per-iteration
    shuffles are the rank side and the groupBy(dst) partial+final
    reduction (map-side combine is automatic).
  - Dangling mass is one scalar aggregate per iteration (skipped entirely
    when the graph has no dangling vertices).
  - Lineage is truncated by the superstep harness every ``ckpt_every``
    iterations; pass ``ckpt_dir`` for a durable, resumable run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.superstep import SuperstepResult, run_superstep_loop


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.15,
    tol: float = 1e-6,
    max_iter: int = 200,
    ckpt_dir: str | None = None,
    ckpt_every: int = 8,
    return_result: bool = False,
) -> DataFrame | SuperstepResult:
    """PageRank scores as DataFrame (vid: bigint, score: double)."""
    n = graph.num_vertices
    scatter = graph.scatter_edges  # (src, dst, inv_outdeg), partitioned on src
    p = graph.num_partitions

    dangling_vids = (
        graph.vertices.join(
            graph.out_degrees.select(F.col("src").alias("vid")), "vid", "left_anti"
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    has_dangling = dangling_vids.limit(1).count() > 0

    ranks0 = graph.vertices.select(
        "vid",
        F.lit(1.0 / n).alias("score"),
        F.lit(float("inf")).alias("delta"),
    ).repartition(p, "vid")

    def step(ranks: DataFrame, _i: int) -> DataFrame:
        dm = 0.0
        if has_dangling:
            dm = (
                ranks.join(dangling_vids, "vid", "left_semi")
                .agg(F.sum("score"))
                .collect()[0][0]
                or 0.0
            )
        contribs = (
            ranks.select("vid", "score")
            .join(scatter, ranks.vid == scatter.src)
            .groupBy("dst")
            .agg(F.sum(F.col("score") * F.col("inv_outdeg")).alias("c"))
        )
        base = alpha / n + (1.0 - alpha) * dm / n
        new = (
            ranks.select("vid", F.col("score").alias("old_score"))
            .join(contribs, ranks.vid == contribs.dst, "left")
            .select(
                "vid",
                (
                    F.lit(base)
                    + F.lit(1.0 - alpha) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("score"),
                F.col("old_score"),
            )
            .select(
                "vid",
                "score",
                F.abs(F.col("score") - F.col("old_score")).alias("delta"),
            )
            .repartition(p, "vid")
        )
        return new

    def metric(ranks: DataFrame) -> dict:
        row = ranks.agg(
            F.max("delta").alias("delta"), F.sum("score").alias("mass")
        ).collect()[0]
        return {"delta": float(row["delta"]), "mass": float(row["mass"])}

    result = run_superstep_loop(
        ranks0,
        step,
        metric,
        tol=tol,
        max_iter=max_iter,
        ckpt_dir=ckpt_dir,
        ckpt_every=ckpt_every,
        meta={
            "name": "pagerank",
            "alpha": alpha,
            "tol": tol,
            "partition_key": "vid",
            "num_partitions": p,
        },
    )
    dangling_vids.unpersist()
    if return_result:
        result.state = result.state.select("vid", "score")
        return result
    return result.state.select("vid", "score")
