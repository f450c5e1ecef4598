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
    info: dict | None = None,
) -> tuple[DataFrame, LinkGraph]:
    """K4 under edge updates: (labels, updated_graph).

    Insert-only batches MERGE components: seeding min-label from the
    previous labels converges in a few supersteps (labels are vertex ids
    inside their own component, so the min over merged seeds is the true
    new minimum — exactness gated in tests).

    DELETIONS (round-3): a delete can only SPLIT the component(s) its
    endpoints belong to. Instead of a full recompute, the kernel
      1. collects the affected component ids (old labels of the deleted
         pairs' endpoints — O(|batch|) lookups),
      2. re-runs min-label FROM SCRATCH on the induced subgraph of those
         components only (labels of every other vertex are reused),
      3. runs ONE warm-started min-label pass over the full graph seeded
         with (kept ∪ recomputed) labels — it converges in O(#merges)
         supersteps and finalizes any cross-component inserts in the same
         batch. Exact: every seed is a vertex id inside its own final
         component, and each final component contains its min-vid vertex
         as a seed (its subgraph piece label can only be that minimum),
         so warm min-label converges to the true per-component minimum.
    ``info`` (optional dict) receives diagnostics: mode,
    affected_components, subgraph_vertices.
    """
    if info is None:
        info = {}
    deleted = batch.filter(F.col("op") == "-").select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    del_ends = [
        int(v)
        for r in deleted.collect()
        for v in (r["src"], r["dst"])
    ]
    g2 = graph.with_updates(batch)
    if not del_ends:
        info.update(mode="insert_warm", affected_components=0)
        return (
            connected_components(g2, max_iter=max_iter, init_labels=prev_labels),
            g2,
        )

    spark = graph.spark
    ends_df = spark.createDataFrame(
        [(v,) for v in sorted(set(del_ends))], "vid bigint"
    )
    affected = (
        prev_labels.join(F.broadcast(ends_df), "vid", "left_semi")
        .select("component")
        .distinct()
    )
    aff_vids = prev_labels.join(
        F.broadcast(affected), "component", "left_semi"
    ).select("vid")
    # induced subgraph: post-update edges with BOTH endpoints affected
    # (one O(E) broadcast-probe scan; edges leaving the affected set are
    # finalized by the warm full-graph pass below)
    sym = g2.symmetrized()
    sub_edges = (
        sym.edges.join(F.broadcast(aff_vids.withColumnRenamed("vid", "src")), "src", "left_semi")
        .join(F.broadcast(aff_vids.withColumnRenamed("vid", "dst")), "dst", "left_semi")
        .select("src", "dst")
    )
    sub_graph = LinkGraph(
        sub_edges,
        vertices=aff_vids,
        num_partitions=graph.num_partitions,
    )
    recomputed = connected_components(sub_graph, max_iter=max_iter)
    kept = prev_labels.join(F.broadcast(affected), "component", "left_anti")
    seeds = kept.unionByName(recomputed)
    out = connected_components(g2, max_iter=max_iter, init_labels=seeds)
    n_aff = sub_graph.num_vertices
    sub_graph.release()
    info.update(
        mode="decremental_subgraph",
        affected_components=affected.count(),
        subgraph_vertices=n_aff,
    )
    return out, g2
