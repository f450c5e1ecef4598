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
