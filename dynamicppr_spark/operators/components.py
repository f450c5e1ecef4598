"""Connected components (SURVEY.md §2 K4) — exact, undirected.

Iterative min-label propagation: label(v) <- min(label(v), min over
neighbors). Converges in O(diameter) supersteps (web-scale graphs:
~tens). Semantics pinned by tests/oracle.py::connected_components
(component id = min vid in component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.superstep import run_superstep_loop


def connected_components(
    graph: LinkGraph,
    max_iter: int = 100,
    ckpt_dir: str | None = None,
) -> DataFrame:
    """(vid: bigint, component: bigint) with component = min vid reachable."""
    sym = graph.symmetrized()
    p = graph.num_partitions
    edges = sym.edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()  # pre-materialize: checkpoint rotation must not capture it

    labels0 = graph.vertices.select(
        "vid", F.col("vid").alias("component"), F.lit(1.0).alias("delta")
    ).repartition(p, "vid")

    def step(labels: DataFrame, _i: int) -> DataFrame:
        cand = (
            labels.select("vid", "component")
            .join(edges, labels.vid == edges.src)
            .groupBy("dst")
            .agg(F.min("component").alias("cand"))
        )
        new = (
            labels.select("vid", F.col("component").alias("old"))
            .join(cand, labels.vid == cand.dst, "left")
            .select(
                "vid",
                F.least(F.col("old"), F.coalesce("cand", F.col("old"))).alias(
                    "component"
                ),
                F.col("old"),
            )
            .select(
                "vid",
                "component",
                (F.col("component") != F.col("old")).cast("double").alias("delta"),
            )
        )
        return new

    result = run_superstep_loop(
        labels0,
        step,
        None,
        tol=0.0,
        observe={"delta": F.sum("delta"), "n": F.count(F.lit(1))},
        max_iter=max_iter,
        ckpt_dir=ckpt_dir,
        meta={"name": "connected_components", "partition_key": "vid",
              "num_partitions": p},
    )
    return result.state.select("vid", "component")
