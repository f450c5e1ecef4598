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


def _components_local(graph: LinkGraph) -> DataFrame:
    """Gated local-mode K4 (same regime split as ``pagerank(mode='local')``
    and PPREngine's bcsr path): min-vid components computed on the driver
    over the collected edge list, as vectorized numpy min-label rounds
    with full pointer-jumping compression between rounds (O((E+V) log V)
    array work, no per-edge Python loop — a path graph converges in
    O(log V) rounds because compression doubles the spread per round).

    Only edge ENDPOINTS are collected (<= 2 x num_edges ids); the vertex
    universe — which can be >> the edge list — never leaves the cluster:
    isolated vertices get their own vid through the coalesce join, the
    same contract as the distributed path. Semantics identical to the df
    path (exactness gated in tests), so 'auto' arbitration is purely a
    cost decision."""
    import numpy as np
    import pandas as pd

    pdf = graph.edges.select("src", "dst").toPandas()
    spark = graph.spark
    if len(pdf) == 0:
        lbl = spark.createDataFrame([], "vid bigint, component bigint")
    else:
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        ids = np.unique(np.concatenate([src, dst]))
        s = np.searchsorted(ids, src)
        d = np.searchsorted(ids, dst)
        label = np.arange(len(ids), dtype=np.int64)
        while True:
            mn = np.minimum(label[s], label[d])
            new = label.copy()
            np.minimum.at(new, s, mn)
            np.minimum.at(new, d, mn)
            while True:
                nn = new[new]
                if np.array_equal(nn, new):
                    break
                new = nn
            if np.array_equal(new, label):
                break
            label = new
        # ids ascend, labels propagate the MIN dense index, so the root
        # index maps back to the component's minimum vid
        lbl = spark.createDataFrame(
            pd.DataFrame({"vid": ids, "component": ids[label]})
        )
    out = graph.vertices.join(lbl, "vid", "left").select(
        "vid", F.coalesce("component", F.col("vid")).alias("component")
    )
    out._dynppr_ckpt_ids = set()
    return out


def connected_components(
    graph: LinkGraph,
    max_iter: int = 100,
    ckpt_dir: str | None = None,
    init_labels: DataFrame | None = None,
    mode: str = "df",
    max_local_edges: int = 32_000_000,
) -> DataFrame:
    """(vid: bigint, component: bigint) with component = min vid reachable.

    ``init_labels`` (vid, component) warm-starts the min-label iteration —
    used by the incremental path below. Seeds must be component ids of a
    COARSER-OR-EQUAL partition whose ids are vertex ids within the same
    component (e.g. a previous run's labels after only edge insertions);
    min-label then converges to the min seed per new component, which is
    the true component minimum, in O(#merged components) supersteps
    instead of O(diameter).

    ``mode``: 'df' (distributed, default — the 100 TB path), 'local'
    (driver union over the collected edges, gated at ``max_local_edges``),
    'auto' (local when the edge count fits, else df — the arbitration the
    dup-pair CC of the dedup pipeline uses, where the pair graph is
    batch-dedup-sized by construction but unbounded in principle).
    ``init_labels``/``ckpt_dir`` only affect the df path's convergence
    trajectory; the result is identical in every mode."""
    if mode not in ("df", "local", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        mode = "local" if graph.num_edges <= max_local_edges else "df"
    if mode == "local":
        if graph.num_edges > max_local_edges:
            raise ValueError(
                f"mode='local' gated at {max_local_edges} edges "
                f"({graph.num_edges} present); use mode='auto'"
            )
        return _components_local(graph)
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
    # the final state is an eager checkpoint leaf — the edge cache has no
    # reader left; freeing it here keeps maintained streams (one CC run
    # per batch) from accumulating a MEMORY_AND_DISK block per call
    edges.unpersist()
    out = result.state.select("vid", "component")
    # ownership handle: the ids of the loop-final checkpoint blocks this
    # frame reads. A caller that copies the labels out (maintained stream)
    # frees them; one-shot callers just let GC take them as before.
    out._dynppr_ckpt_ids = set(result.ckpt_ids)
    return out


def _induced_subgraph_edges(
    sym_edges: DataFrame,
    aff_vids: DataFrame,
    n_aff: int,
    broadcast_max_rows: int,
) -> DataFrame:
    """Edges with BOTH endpoints in ``aff_vids`` (one O(E) probe scan).

    The probe side is broadcast only while it is provably small
    (``n_aff <= broadcast_max_rows``); past the cap a shuffled semi-join
    does the same probe without shipping an O(V) table to every executor
    — the round-3 version force-broadcast unconditionally, which on a
    power-law giant-component delete is an executor/driver OOM.
    """
    def _vids_as(name: str) -> DataFrame:
        v = aff_vids.withColumnRenamed("vid", name)
        return F.broadcast(v) if n_aff <= broadcast_max_rows else v

    return (
        sym_edges.join(_vids_as("src"), "src", "left_semi")
        .join(_vids_as("dst"), "dst", "left_semi")
        .select("src", "dst")
    )


def connected_components_incremental(
    graph: LinkGraph,
    prev_labels: DataFrame,
    batch: DataFrame,
    max_iter: int = 100,
    info: dict | None = None,
    affected_fraction_max: float = 0.2,
    broadcast_max_rows: int = 1_000_000,
) -> tuple[DataFrame, LinkGraph]:
    """K4 under edge updates: (labels, updated_graph).

    Insert-only batches MERGE components: seeding min-label from the
    previous labels converges in a few supersteps (labels are vertex ids
    inside their own component, so the min over merged seeds is the true
    new minimum — exactness gated in tests).

    DELETIONS (round-3, guards round-4): a delete can only SPLIT the
    component(s) its endpoints belong to. Instead of a full recompute,
    the kernel
      1. derives the affected component ids (old labels of the deleted
         pairs' endpoints) with dataflow joins — nothing is collected on
         the driver,
      2. re-runs min-label FROM SCRATCH on the induced subgraph of those
         components only (labels of every other vertex are reused),
      3. runs ONE warm-started min-label pass over the full graph seeded
         with (kept ∪ recomputed) labels — it converges in O(#merges)
         supersteps and finalizes any cross-component inserts in the same
         batch. Exact: every seed is a vertex id inside its own final
         component, and each final component contains its min-vid vertex
         as a seed (its subgraph piece label can only be that minimum),
         so warm min-label converges to the true per-component minimum.

    Scale guards (round-4, power-law reality: most deletes hit the giant
    component, making the affected set ~the whole vertex table):
      - the affected VERTEX COUNT is measured first; if it exceeds
        ``affected_fraction_max`` of the graph, the subgraph machinery is
        skipped for a plain cold recompute (same asymptotic cost as the
        subgraph pass would have had, none of its overhead),
      - below the fraction gate, ``aff_vids`` is broadcast only while it
        fits ``broadcast_max_rows`` (~8 MB of bigints at the default);
        beyond that the induced-subgraph probe uses shuffled semi-joins,
      - nothing O(|batch|) or O(V) is ever collect()ed on the driver.

    ``info`` (optional dict) receives diagnostics: mode,
    affected_vertices, and — only when a dict is PASSED (each is an extra
    Spark job) — affected_components.
    """
    want_diag = info is not None
    if info is None:
        info = {}
    deleted = batch.filter(F.col("op") == "-").select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    # O(|batch|) dataflow (no driver collect): distinct endpoints of
    # deleted pairs. The single count() below doubles as the empty check.
    ends_df = (
        deleted.select(F.explode(F.array("src", "dst")).alias("vid"))
        .distinct()
    )
    n_ends = ends_df.count()
    g2 = graph.with_updates(batch)
    if n_ends == 0:
        info.update(mode="insert_warm", affected_vertices=0)
        return (
            connected_components(g2, max_iter=max_iter, init_labels=prev_labels),
            g2,
        )

    affected = (
        prev_labels.join(F.broadcast(ends_df), "vid", "left_semi")
        .select("component")
        .distinct()
    )
    aff_vids = prev_labels.join(
        F.broadcast(affected), "component", "left_semi"
    ).select("vid")
    n_aff = aff_vids.count()
    info["affected_vertices"] = n_aff
    if want_diag:
        info["affected_components"] = affected.count()
    if n_aff > affected_fraction_max * max(1, graph.num_vertices):
        # giant-component delete: the induced subgraph IS (almost) the
        # graph — recompute cold, skip the broadcast/subgraph machinery
        info["mode"] = "full_recompute"
        return connected_components(g2, max_iter=max_iter), g2

    sym = g2.symmetrized()
    sub_edges = _induced_subgraph_edges(
        sym.edges, aff_vids, n_aff, broadcast_max_rows
    )
    sub_graph = LinkGraph(
        sub_edges,
        vertices=aff_vids,
        num_partitions=graph.num_partitions,
    )
    recomputed = connected_components(sub_graph, max_iter=max_iter)
    # ``affected`` is component IDS — bounded by 2*|batch| rows, safe to
    # broadcast regardless of graph size (unlike aff_vids above)
    kept = prev_labels.join(F.broadcast(affected), "component", "left_anti")
    seeds = kept.unionByName(recomputed)
    out = connected_components(g2, max_iter=max_iter, init_labels=seeds)
    sub_graph.release()
    # the warm pass consumed ``seeds`` eagerly (its loop checkpoints the
    # initial state) — the subgraph run's final checkpoint has no reader
    # left, so free it instead of leaking one block per delete batch
    from dynamicppr_spark.rddtrack import unpersist_rdd_ids

    unpersist_rdd_ids(
        out.sparkSession.sparkContext,
        getattr(recomputed, "_dynppr_ckpt_ids", set()),
    )
    info.update(mode="decremental_subgraph", subgraph_vertices=n_aff)
    return out, g2
