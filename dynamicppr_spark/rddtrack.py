"""Guarded helpers around the JVM persistent-RDD registry.

``DataFrame.localCheckpoint(eager=True)`` materializes state into block-
manager RDD blocks that ``DataFrame.unpersist()`` does NOT release (it only
drops caches created via ``persist()``). Long dynamic-update streams would
otherwise accumulate checkpointed edge/degree/scatter blocks until JVM GC.

These helpers diff ``sc._jsc.getPersistentRDDs()`` around a checkpoint to
learn which RDD ids were created, so owners (LinkGraph, CheckpointRotator)
can free exactly their own blocks later.

``_jsc`` is a private JVM handle that is absent on Spark Connect and may
change across versions — every access is capability-guarded and the whole
facility degrades to a no-op (correctness unaffected; blocks then wait for
GC, exactly the pre-tracking behavior).
"""

from __future__ import annotations

from contextlib import contextmanager


def detach_plan_origin(df):
    """Rebuild ``df`` (typically a localCheckpoint leaf) as a bare
    LogicalRDD over its own materialized InternalRow RDD, WITHOUT the
    origin-plan linkage the checkpoint leaf carries for stats rewriting.

    Why: each localCheckpoint leaf references its ORIGIN logical plan
    (for statistics propagation), and an iterative kernel's origin plan
    contains the PREVIOUS leaf — so the origin chain grows by one full
    superstep plan per iteration and every stats visit (join strategy
    selection in each subsequent query) re-walks the whole chain: the
    driver-side cost of each checkpoint DOUBLES per call (measured 0.3s
    -> 17.6s within ~30 checkpoints on the round-3 soak). Severing the
    origin keeps per-checkpoint cost flat; the leaf merely loses its
    inherited size estimate (callers broadcast small sides explicitly).

    Capability-guarded like everything here: on Spark Connect or API
    drift it returns ``df`` unchanged (correct, just slower on very long
    update streams)."""
    try:
        jdf = df._jdf  # noqa: SLF001
        spark = df.sparkSession
        jrdd = jdf.queryExecution().toRdd()  # the checkpointed RDD, no job
        jdf2 = spark._jsparkSession.internalCreateDataFrame(  # noqa: SLF001
            jrdd, jdf.schema(), False
        )
        from pyspark.sql import DataFrame as _DF

        return _DF(jdf2, spark)
    except Exception:  # noqa: BLE001
        return df


def persistent_rdd_ids(sc) -> set[int] | None:
    """Ids of currently persisted RDDs, or None when the API is unavailable."""
    try:
        jmap = sc._jsc.getPersistentRDDs()  # noqa: SLF001
        return {int(k) for k in jmap.keySet().toArray()}
    except Exception:  # noqa: BLE001 — Spark Connect / future API drift
        return None


def unpersist_rdd_ids(sc, ids: set[int]) -> None:
    """Best-effort unpersist of the given RDD ids (no-op if unavailable)."""
    if not ids:
        return
    try:
        jmap = sc._jsc.getPersistentRDDs()  # noqa: SLF001
        for entry in jmap.entrySet().toArray():
            if int(entry.getKey()) in ids:
                try:
                    entry.getValue().unpersist(False)
                except Exception:  # noqa: BLE001
                    pass
    except Exception:  # noqa: BLE001
        pass


class _Created:
    def __init__(self) -> None:
        self.ids: set[int] = set()


@contextmanager
def track_new_rdds(sc):
    """Context manager yielding the set of persistent-RDD ids created inside.

    Yields an object with ``.ids`` (filled on exit; empty when tracking is
    unavailable so callers never special-case).
    """
    before = persistent_rdd_ids(sc)
    out = _Created()
    try:
        yield out
    finally:
        if before is not None:
            after = persistent_rdd_ids(sc)
            if after is not None:
                out.ids = after - before
