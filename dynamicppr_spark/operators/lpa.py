"""Label propagation (SURVEY.md §2 K5) — synchronous, deterministic.

Fixed iteration count; new label = most frequent neighbor label with ties
broken by MIN label, so results are exactly reproducible across runs and
platforms. Pinned by tests/oracle.py::label_propagation. Undirected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.superstep import run_superstep_loop


def label_propagation(
    graph: LinkGraph,
    n_iter: int = 10,
    ckpt_dir: str | None = None,
    init_labels: DataFrame | None = None,
    until_stable: bool = False,
) -> DataFrame:
    """(vid: bigint, label: bigint) after ``n_iter`` synchronous rounds.

    ``init_labels`` (vid, label) warm-starts the iteration (vertices
    absent from it — e.g. new endpoints after updates — seed with their
    own vid); ``until_stable=True`` stops as soon as a round changes no
    label instead of always running ``n_iter`` rounds — the incremental
    mode used by ``label_propagation_incremental``."""
    sym = graph.symmetrized()
    p = graph.num_partitions
    edges = sym.edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()  # pre-materialize: checkpoint rotation must not capture it

    if init_labels is not None:
        labels0 = graph.vertices.join(
            init_labels.select("vid", F.col("label").alias("l0")), "vid", "left"
        ).select(
            "vid",
            F.coalesce("l0", F.col("vid")).alias("label"),
            F.lit(1.0).alias("delta"),
        )
    else:
        labels0 = graph.vertices.select(
            "vid", F.col("vid").alias("label"), F.lit(1.0).alias("delta")
        )
    labels0 = labels0.repartition(p, "vid")

    def step(labels: DataFrame, _i: int) -> DataFrame:
        votes = (
            labels.select("vid", "label")
            .join(edges, labels.vid == edges.src)
            .groupBy("dst", "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("label"))
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("dst", F.col("label").alias("best"))
        )
        new = (
            labels.select("vid", F.col("label").alias("old"))
            .join(best, labels.vid == best.dst, "left")
            .select(
                "vid",
                F.coalesce("best", F.col("old")).alias("label"),
                (F.coalesce("best", F.col("old")) != F.col("old"))
                .cast("double")
                .alias("delta"),
            )
        )
        return new

    result = run_superstep_loop(
        labels0,
        step,
        None,
        # default: run exactly n_iter rounds (deterministic fixed-iter
        # semantics, oracle-pinned); until_stable: stop when no label moves
        tol=0.0 if until_stable else -1.0,
        observe={"delta": F.sum("delta"), "n": F.count(F.lit(1))},
        max_iter=n_iter,
        ckpt_dir=ckpt_dir,
        meta={"name": "lpa", "partition_key": "vid", "num_partitions": p},
    )
    # final state is an eager checkpoint leaf — free the per-call edge
    # cache now (maintained streams run one LPA per batch; see components)
    edges.unpersist()
    out = result.state.select("vid", "label")
    # ownership handle for maintained-stream callers (see components.py)
    out._dynppr_ckpt_ids = set(result.ckpt_ids)
    return out


def label_propagation_incremental(
    graph: LinkGraph,
    prev_labels: DataFrame,
    batch: DataFrame,
    max_iter: int = 50,
) -> tuple[DataFrame, LinkGraph]:
    """K5 under edge updates (round-3): warm-start synchronous LPA from
    the previous labels on the updated graph and run UNTIL STABLE (no
    label changes in a round). When the update does not perturb the
    converged community structure, this terminates after one verification
    round instead of re-flooding labels from scratch — the same warm-start
    pattern as PageRank's init_scores and CC's init_labels. Returns
    (labels, updated_graph).

    Note LPA (unlike PageRank/CC) has no unique fixed point: a warm start
    is guaranteed to return A stable labeling of the updated graph, equal
    to the cold-start labeling whenever the previous labeling is already
    stable on the updated graph (gated in tests); under heavy structural
    change its labeling may differ from a cold re-run's, which is inherent
    to incremental LPA, not an implementation gap."""
    g2 = graph.with_updates(batch)
    out = label_propagation(
        g2, n_iter=max_iter, init_labels=prev_labels, until_stable=True
    )
    return out, g2
