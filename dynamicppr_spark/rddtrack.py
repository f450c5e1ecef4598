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
