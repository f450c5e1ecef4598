"""Structured Streaming surface over the dynamic-PPR path (SURVEY.md §2 S2).

An edge-update feed (batch_id, op, src, dst, ts) is consumed micro-batch ==
update-batch via ``foreachBatch``: each micro-batch calls
PPREngine.apply_updates — the same code path as the static API, so
correctness properties (metamorphic gate) carry over verbatim.

Late data: a watermark on ts bounds state; updates arriving within the
watermark are folded into their micro-batch (PPR residual injections are
commutative within a batch, so intra-batch order never matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UPDATE_SCHEMA = "batch_id bigint, op string, src bigint, dst bigint, ts timestamp"


def run_update_stream(
    engine,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "ppr_updates",
):
    """Attach a PPREngine to a streaming update feed. Returns the query.

    ``stream_df`` must be a streaming DataFrame with UPDATE_SCHEMA columns.
    Call ``query.processAllAvailable()`` (tests) or awaitTermination (prod).
    """
    batches_seen: list[int] = []

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # within a micro-batch, apply update-batches in batch_id order
        bids = [
            r["batch_id"]
            for r in batch_df.select("batch_id").distinct().orderBy("batch_id").collect()
        ]
        for bid in bids:
            engine.apply_updates(
                batch_df.filter(F.col("batch_id") == bid).select("op", "src", "dst")
            )
            batches_seen.append(bid)

    q = (
        stream_df.withWatermark("ts", watermark)
        .writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(apply_batch)
        .start()
    )
    q._dynamicppr_batches_seen = batches_seen  # test hook
    return q


def run_state_stream(
    state,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "state_updates",
):
    """Attach any maintained-kernel state (an object with
    ``apply(batch_df)``) to a streaming update feed.

    One shared implementation of the micro-batch == update-batch
    discipline (split each micro-batch by batch_id, apply in batch_id
    order) — TriangleStreamState, ComponentsStreamState and LPAStreamState
    all ride this; two copies of the ordering logic drifted once and never
    will again. Returns the started StreamingQuery."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bids = [
            r["batch_id"]
            for r in batch_df.select("batch_id").distinct().orderBy("batch_id").collect()
        ]
        for bid in bids:
            state.apply(
                batch_df.filter(F.col("batch_id") == bid).select("op", "src", "dst")
            )

    return (
        stream_df.withWatermark("ts", watermark)
        .writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(apply_batch)
        .start()
    )


class TriangleStreamState:
    """Maintained triangle count under a streaming edge-update feed.

    Pairs with ``run_triangle_stream``: holds (graph, count) and applies
    ``triangle_count_incremental`` per update-batch — the K6 analogue of
    PPREngine under ``run_update_stream``, so the streaming surface
    maintains the same kernels the static API does."""

    def __init__(self, graph, count: int | None = None):
        from dynamicppr_spark.operators.triangles import triangle_count

        self.graph = graph
        self.count = (
            int(triangle_count(graph).collect()[0]["n"])
            if count is None
            else int(count)
        )
        self.batches_applied = 0

    def apply(self, batch_df: DataFrame) -> int:
        from dynamicppr_spark.operators.triangles import (
            triangle_count_incremental,
        )

        new_count, g2 = triangle_count_incremental(
            self.graph, self.count, batch_df
        )
        self.graph.release(keep=g2)
        self.graph = g2
        self.count = new_count
        self.batches_applied += 1
        return new_count


def run_triangle_stream(
    state: TriangleStreamState,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "triangle_updates",
):
    """K6 flavor of ``run_state_stream`` (kept as the public name)."""
    return run_state_stream(
        state, stream_df, watermark=watermark, query_name=query_name
    )


class _MaintainedLabelState:
    """Shared shape for CC/LPA maintained label tables under a stream:
    holds (graph, labels DataFrame) and applies the kernel's incremental
    function per update-batch, cutting the new labels' lineage
    (localCheckpoint) before releasing the predecessor graph — the
    maintained-state discipline every kernel here follows."""

    label_col: str = "component"

    def __init__(self, graph, labels: DataFrame | None = None):
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        self.graph = graph
        # rotate the labels checkpoint: each new eager checkpoint frees the
        # PREDECESSOR's RDD blocks explicitly (and severs the origin-plan
        # chain) instead of waiting on driver GC — the same long-stream
        # discipline as every other maintained state here
        self._rot = CheckpointRotator(graph.spark)
        self.labels = self._checkpoint_owned(
            self._cold(graph) if labels is None else labels
        )
        self.batches_applied = 0

    def _checkpoint_owned(self, labels: DataFrame) -> DataFrame:
        """Rotate ``labels`` into this state's own checkpoint, then free
        the kernel-internal loop-final blocks the input was reading (the
        ``_dynppr_ckpt_ids`` ownership handle components/lpa attach) —
        without this, every batch leaks one superstep-loop block."""
        from dynamicppr_spark.rddtrack import unpersist_rdd_ids

        loop_ids = getattr(labels, "_dynppr_ckpt_ids", set())
        out = self._rot.checkpoint(labels)
        unpersist_rdd_ids(
            self.graph.spark.sparkContext, set(loop_ids) - self._rot._prev_ids
        )
        return out

    def apply(self, batch_df: DataFrame) -> DataFrame:
        new_labels, g2 = self._incremental(self.graph, self.labels, batch_df)
        new_labels = self._checkpoint_owned(new_labels)
        self.graph.release(keep=g2)
        self.graph = g2
        self.labels = new_labels
        self.batches_applied += 1
        return new_labels


class ComponentsStreamState(_MaintainedLabelState):
    """K4 maintained under a stream: insert batches warm-merge, delete
    batches take the guarded decremental path (operators/components.py)."""

    label_col = "component"

    @staticmethod
    def _cold(graph):
        from dynamicppr_spark.operators.components import connected_components

        return connected_components(graph)

    @staticmethod
    def _incremental(graph, labels, batch):
        from dynamicppr_spark.operators.components import (
            connected_components_incremental,
        )

        return connected_components_incremental(graph, labels, batch)


class LPAStreamState(_MaintainedLabelState):
    """K5 maintained under a stream: warm-started until-stable LPA (a
    stable labeling of each updated graph; equals the cold labeling when
    the structure is unperturbed — see operators/lpa.py)."""

    label_col = "label"

    @staticmethod
    def _cold(graph):
        from dynamicppr_spark.operators.lpa import label_propagation

        return label_propagation(graph, n_iter=50, until_stable=True)

    @staticmethod
    def _incremental(graph, labels, batch):
        from dynamicppr_spark.operators.lpa import (
            label_propagation_incremental,
        )

        return label_propagation_incremental(graph, labels, batch)


def run_label_stream(
    state: _MaintainedLabelState,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "label_updates",
):
    """K4/K5 flavor of ``run_state_stream`` (kept as the public name)."""
    return run_state_stream(
        state, stream_df, watermark=watermark, query_name=query_name
    )


def windowed_update_stats(stream_df: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window op counts (monitoring surface)."""
    return (
        stream_df.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "op")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            "op",
            "n",
        )
    )
