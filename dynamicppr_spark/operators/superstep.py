"""Generic superstep loop with lineage truncation, durable checkpoints and
mid-iteration resume (SURVEY.md §2 S4, §4 "the one truly mandatory
hand-rolled piece"; BASELINE.json north_star: "each superstep checkpoints
per-partition residual/frontier state with lineage + convergence metrics so
runs resume mid-iteration").

Driver-side control flow only: the driver sees scalar metrics; vertex state
never leaves the cluster (no collect of vectors).
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import Column, DataFrame, Observation, functions as F
from pyspark.storagelevel import StorageLevel

StepFn = Callable[[DataFrame, int], DataFrame]
MetricFn = Callable[[DataFrame], dict]


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: dict
    history: list[dict] = field(default_factory=list)
    wall_seconds: float = 0.0
    resumed_from: int = 0
    # RDD block ids backing ``state`` (the loop's FINAL eager checkpoint).
    # ``state`` reads these; a caller that copies the state out (e.g. a
    # maintained stream re-checkpointing it) should free them via
    # rddtrack.unpersist_rdd_ids — otherwise they wait for JVM GC.
    ckpt_ids: set = field(default_factory=set)


class CheckpointRotator:
    """Eagerly localCheckpoint a DataFrame and explicitly unpersist the
    PREVIOUS checkpoint's RDD blocks.

    Without rotation, every superstep's checkpointed state (hundreds of MB
    at bench scale) lingers in the block manager until JVM/Python GC gets
    around to it — storage churn/evictions make superstep times vary 2-3x.

    All JVM registry access goes through rddtrack's guarded helpers: on
    Spark Connect (or any runtime without ``_jsc``) rotation degrades to a
    plain eager localCheckpoint with no explicit block release (correct,
    just GC-paced — tests cover this fallback).
    """

    def __init__(self, spark) -> None:
        self._sc = spark.sparkContext
        self._prev_ids: set[int] = set()

    def checkpoint(self, df: DataFrame) -> DataFrame:
        import os

        from dynamicppr_spark.rddtrack import (
            detach_plan_origin,
            track_new_rdds,
            unpersist_rdd_ids,
        )

        if os.environ.get("DYNPPR_PROFILE") == "1":
            t0 = time.time()
            with track_new_rdds(self._sc) as created:
                out = detach_plan_origin(df.localCheckpoint(eager=True))
            t1 = time.time()
            unpersist_rdd_ids(self._sc, self._prev_ids - created.ids)
            t2 = time.time()
            print(
                f"[rot-prof] ckpt={t1 - t0:.2f}s unpersist={t2 - t1:.2f}s",
                flush=True,
            )
        else:
            with track_new_rdds(self._sc) as created:
                # detach_plan_origin severs the leaf's origin-plan chain —
                # without it, per-checkpoint driver cost DOUBLES per call
                # over long runs (stats re-walk; see rddtrack docstring)
                out = detach_plan_origin(df.localCheckpoint(eager=True))
            # drop the previous superstep's state blocks (no-op when
            # tracking is unavailable — created.ids stays empty and
            # _prev_ids never fills)
            unpersist_rdd_ids(self._sc, self._prev_ids - created.ids)
        self._prev_ids = created.ids
        return out

    def release(self) -> None:
        self._prev_ids = set()


def _manifest_paths(ckpt_dir: Path) -> list[tuple[int, Path]]:
    out = []
    for p in sorted(ckpt_dir.glob("manifest_*.json")):
        try:
            out.append((int(p.stem.split("_")[1]), p))
        except ValueError:
            continue
    return sorted(out)


def latest_checkpoint(ckpt_dir: str | Path) -> tuple[int, dict] | None:
    """Newest valid (iteration, manifest) under ``ckpt_dir``, else None."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    for it, mp in reversed(_manifest_paths(ckpt_dir)):
        try:
            manifest = json.loads(mp.read_text())
            if (ckpt_dir / f"it={it}" / "_SUCCESS").exists():
                return it, manifest
        except (json.JSONDecodeError, OSError):
            continue
    return None


def _write_checkpoint(
    state: DataFrame,
    ckpt_dir: Path,
    iteration: int,
    metrics: dict,
    meta: dict,
    keep: int = 2,
) -> DataFrame:
    """Durable per-partition checkpoint: parquet state + JSON manifest.

    The parquet round-trip also truncates lineage: the returned DataFrame's
    plan is a fresh scan. Per-partition stats (row/frontier counts keyed by
    the state's hash partition) go into the manifest as the "lineage".
    """
    path = ckpt_dir / f"it={iteration}"
    state.write.mode("overwrite").parquet(str(path))
    spark = state.sparkSession
    reread = spark.read.parquet(str(path))
    part_col = meta.get("partition_key", "vid")
    nparts = int(meta.get("num_partitions", 32))
    per_part = (
        reread.groupBy(
            F.pmod(F.col(part_col), F.lit(nparts)).cast("int").alias("part")
        )
        .count()
        .collect()
    )
    manifest = {
        "name": meta.get("name", "kernel"),
        "iteration": iteration,
        "metrics": metrics,
        "meta": {k: v for k, v in meta.items() if isinstance(v, (str, int, float, bool))},
        "schema": reread.schema.simpleString(),
        "partitions": {str(r["part"]): r["count"] for r in per_part},
        "written_at": time.time(),
    }
    (ckpt_dir / f"manifest_{iteration}.json").write_text(json.dumps(manifest))
    # bound disk: drop all but the newest ``keep`` checkpoints
    existing = _manifest_paths(ckpt_dir)
    for it, mp in existing[:-keep] if len(existing) > keep else []:
        shutil.rmtree(ckpt_dir / f"it={it}", ignore_errors=True)
        mp.unlink(missing_ok=True)
    return reread


def run_superstep_loop(
    state: DataFrame,
    step: StepFn,
    metric: MetricFn | None = None,
    *,
    tol: float,
    metric_key: str = "delta",
    observe: dict[str, Column] | None = None,
    max_iter: int = 200,
    ckpt_dir: str | Path | None = None,
    ckpt_every: int = 8,
    resume: bool = True,
    meta: dict | None = None,
    on_metrics: Callable[[dict], None] | None = None,
    steps_per_job: int = 1,
) -> SuperstepResult:
    """Iterate ``state = step(state, i)`` until the convergence metric
    reaches ``tol`` or ``max_iter``.

    Convergence metrics come from ``observe`` (dict of name -> aggregate
    Column) when given: they are captured DURING the checkpoint job via
    ``DataFrame.observe`` — zero extra Spark jobs per superstep. Fall back
    to ``metric(state)`` (an explicit action) otherwise.

    - Lineage is truncated EVERY (composed) superstep (see comment below).
    - Every ``ckpt_every`` supersteps a durable parquet + manifest
      checkpoint is written when ``ckpt_dir`` is given (resumable).
    - ``resume=True`` + existing valid checkpoint: continue mid-iteration.
    - ``steps_per_job > 1`` composes that many supersteps lazily into ONE
      Spark job before checkpointing/observing — amortizing the serial
      per-job floor (Catalyst analysis, py4j, scheduling, barrier) that
      otherwise caps supersteps/sec on small-state kernels. Identical
      exchange subtrees inside the composed plan are deduplicated by
      Spark's ReusedExchange, so compute stays ~k×single-step.
      Convergence is then only CHECKED every k steps: monotone kernels
      (PageRank/CC and push-PPR) may run up to k-1 extra steps past tol,
      which only tightens the result; do not compose kernels where extra
      steps change semantics.
    """
    meta = dict(meta or {})
    spark = state.sparkSession
    t0 = time.time()
    start_iter = 0
    resumed_from = 0
    history: list[dict] = []
    if ckpt_dir is not None:
        ckpt_dir = Path(ckpt_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        if resume:
            found = latest_checkpoint(ckpt_dir)
            if found is not None:
                start_iter, manifest = found
                resumed_from = start_iter
                state = spark.read.parquet(str(ckpt_dir / f"it={start_iter}"))
                history.append(manifest["metrics"])
                if on_metrics is not None:
                    on_metrics(manifest["metrics"])
                if manifest["metrics"].get(metric_key, float("inf")) <= tol:
                    return SuperstepResult(
                        state, start_iter, True, manifest["metrics"],
                        history, time.time() - t0, resumed_from,
                    )

    # Lineage is truncated EVERY superstep via eager localCheckpoint: the
    # state is referenced multiple times per step (scatter join + merge
    # join), so a lazily-growing plan DOUBLES per iteration — with any
    # checkpoint cadence > 1-2 Spark dies just stringifying the plan tree.
    # localCheckpoint materializes to executor blocks (same cost as the
    # persist+action we'd do anyway) and resets the plan to a flat scan.
    # The rotator unpersists the previous superstep's blocks (bounded
    # storage; NOTE: callers must pre-materialize their persisted inputs
    # before the loop so rotation never captures an unrelated cache).
    rotator = CheckpointRotator(spark)
    state = rotator.checkpoint(state)
    converged = False
    metrics: dict = {}
    it = start_iter
    last_durable = start_iter
    steps_per_job = max(1, int(steps_per_job))
    # NOTE (round-6): auto-composing when tol <= 0 (the PPR engine's
    # eps=0 trick) was tried here and REVERTED — for the shrinking-state
    # until-stable kernels (k-core peel, BFS shells) the overshoot
    # rounds past the fixed point plus the per-sub-step lazy-checkpoint
    # materialization cost MORE than the saved job barriers (q_kcore
    # 9.5s -> 13.1s measured). Composition stays caller-controlled.
    from dynamicppr_spark.rddtrack import track_new_rdds, unpersist_rdd_ids

    sc = spark.sparkContext
    while it < max_iter:
        k = min(steps_per_job, max_iter - it)
        new_state = state
        inter_ids: set[int] = set()
        for j in range(k):
            new_state = step(new_state, it + 1 + j)
            if j < k - 1:
                # LAZY localCheckpoint: cuts the logical plan to a leaf per
                # sub-step (a step references its input 2-3x, so a chained
                # plan makes Catalyst re-walk shared subtrees ~3^k times)
                # while the underlying RDD DAG still computes each
                # intermediate exactly once inside the block's single job.
                # Eager persists or broadcasts here would re-serialize the
                # block into per-step jobs.
                with track_new_rdds(sc) as created:
                    new_state = new_state.localCheckpoint(eager=False)
                inter_ids |= created.ids
        it += k
        if observe is not None:
            obs = Observation()  # auto-named: unique per superstep
            new_state = new_state.observe(
                obs, *[c.alias(kk) for kk, c in observe.items()]
            )
            new_state = rotator.checkpoint(new_state)
            metrics = {k2: (v if v is not None else 0.0) for k2, v in obs.get.items()}
        else:
            new_state = rotator.checkpoint(new_state)
            metrics = metric(new_state)  # cheap: data already materialized
        metrics["iteration"] = it
        history.append(metrics)
        if on_metrics is not None:
            on_metrics(metrics)
        unpersist_rdd_ids(sc, inter_ids)
        state = new_state
        if metrics[metric_key] <= tol:
            converged = True
            if ckpt_dir is not None:
                state = _write_checkpoint(state, ckpt_dir, it, metrics, meta)
            break
        if ckpt_dir is not None and it - last_durable >= ckpt_every:
            # durable (resumable) checkpoint cadence — local lineage is
            # already truncated every step
            state = _write_checkpoint(state, ckpt_dir, it, metrics, meta)
            last_durable = it
    return SuperstepResult(
        state, it, converged, metrics, history, time.time() - t0, resumed_from,
        ckpt_ids=set(rotator._prev_ids),
    )
