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
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """(vid: bigint, component: bigint) with component = min vid reachable.

    ``init_labels`` (vid, component) warm-starts the min-label iteration —
    used by the incremental path below. Seeds must be component ids of a
    COARSER-OR-EQUAL partition whose ids are vertex ids within the same
    component (e.g. a previous run's labels after only edge insertions);
    min-label then converges to the min seed per new component, which is
    the true component minimum, in O(#merged components) supersteps
    instead of O(diameter)."""
    sym = graph.symmetrized()
    p = graph.num_partitions
    edges = sym.edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()  # pre-materialize: checkpoint rotation must not capture it

    if init_labels is not None:
        labels0 = graph.vertices.join(
            init_labels.select("vid", F.col("component").alias("c0")),
            "vid",
            "left",
        ).select(
            "vid",
            F.coalesce("c0", F.col("vid")).alias("component"),
            F.lit(1.0).alias("delta"),
        )
    else:
        labels0 = graph.vertices.select(
            "vid", F.col("vid").alias("component"), F.lit(1.0).alias("delta")
        )
    labels0 = labels0.repartition(p, "vid")

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


def connected_components_incremental(
    graph: LinkGraph,
    prev_labels: DataFrame,
    batch: DataFrame,
    max_iter: int = 100,
) -> tuple[DataFrame, LinkGraph]:
    """K4 under edge updates: (labels, updated_graph).

    Insert-only batches MERGE components: seeding min-label from the
    previous labels converges in a few supersteps (labels are vertex ids
    inside their own component, so the min over merged seeds is the true
    new minimum — exactness gated in tests). Any deletion can SPLIT a
    component, which min-label cannot detect incrementally — those
    batches fall back to a full recompute (the classic
    decremental-connectivity gap; a spanning-forest maintenance structure
    would be the upgrade path)."""
    has_deletes = batch.filter(F.col("op") == "-").limit(1).count() > 0
    g2 = graph.with_updates(batch)
    if has_deletes:
        return connected_components(g2, max_iter=max_iter), g2
    return (
        connected_components(
            g2, max_iter=max_iter, init_labels=prev_labels
        ),
        g2,
    )
