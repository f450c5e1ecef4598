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


class CheckpointRotator:
    """Eagerly localCheckpoint a DataFrame and explicitly unpersist the
    PREVIOUS checkpoint's RDD blocks.

    Without rotation, every superstep's checkpointed state (hundreds of MB
    at bench scale) lingers in the block manager until JVM/Python GC gets
    around to it — storage churn/evictions make superstep times vary 2-3x.
    """

    def __init__(self, spark) -> None:
        self._sc = spark.sparkContext
        self._prev_ids: set[int] = set()

    def _persistent_ids(self) -> set[int]:
        return {
            int(k) for k in self._sc._jsc.getPersistentRDDs().keySet().toArray()
        }

    def checkpoint(self, df: DataFrame) -> DataFrame:
        before = self._persistent_ids()
        out = df.localCheckpoint(eager=True)
        created = self._persistent_ids() - before
        # drop the previous superstep's state blocks
        jmap = self._sc._jsc.getPersistentRDDs()
        for entry in jmap.entrySet().toArray():
            if int(entry.getKey()) in self._prev_ids:
                try:
                    entry.getValue().unpersist(False)
                except Exception:  # noqa: BLE001
                    pass
        self._prev_ids = created
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
) -> SuperstepResult:
    """Iterate ``state = step(state, i)`` until the convergence metric
    reaches ``tol`` or ``max_iter``.

    Convergence metrics come from ``observe`` (dict of name -> aggregate
    Column) when given: they are captured DURING the checkpoint job via
    ``DataFrame.observe`` — zero extra Spark jobs per superstep. Fall back
    to ``metric(state)`` (an explicit action) otherwise.

    - Lineage is truncated EVERY superstep (see comment below).
    - Every ``ckpt_every`` supersteps a durable parquet + manifest
      checkpoint is written when ``ckpt_dir`` is given (resumable).
    - ``resume=True`` + existing valid checkpoint: continue mid-iteration.
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
    for it in range(start_iter + 1, max_iter + 1):
        new_state = step(state, it)
        if observe is not None:
            obs = Observation()  # auto-named: unique per superstep
            new_state = new_state.observe(
                obs, *[c.alias(k) for k, c in observe.items()]
            )
            new_state = rotator.checkpoint(new_state)
            metrics = {k: (v if v is not None else 0.0) for k, v in obs.get.items()}
        else:
            new_state = rotator.checkpoint(new_state)
            metrics = metric(new_state)  # cheap: data already materialized
        metrics["iteration"] = it
        history.append(metrics)
        if on_metrics is not None:
            on_metrics(metrics)
        state = new_state
        if metrics[metric_key] <= tol:
            converged = True
            if ckpt_dir is not None:
                state = _write_checkpoint(state, ckpt_dir, it, metrics, meta)
            break
        if it % ckpt_every == 0 and ckpt_dir is not None:
            # durable (resumable) checkpoint cadence — local lineage is
            # already truncated every step
            state = _write_checkpoint(state, ckpt_dir, it, metrics, meta)
    return SuperstepResult(
        state, it, converged, metrics, history, time.time() - t0, resumed_from
    )
