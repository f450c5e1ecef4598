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
) -> DataFrame:
    """(vid: bigint, label: bigint) after ``n_iter`` synchronous rounds."""
    sym = graph.symmetrized()
    p = graph.num_partitions
    edges = sym.edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()  # pre-materialize: checkpoint rotation must not capture it

    labels0 = graph.vertices.select(
        "vid", F.col("vid").alias("label"), F.lit(1.0).alias("delta")
    ).repartition(p, "vid")

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
        tol=-1.0,  # run exactly n_iter rounds (deterministic)
        observe={"delta": F.sum("delta"), "n": F.count(F.lit(1))},
        max_iter=n_iter,
        ckpt_dir=ckpt_dir,
        meta={"name": "lpa", "partition_key": "vid", "num_partitions": p},
    )
    return result.state.select("vid", "label")
