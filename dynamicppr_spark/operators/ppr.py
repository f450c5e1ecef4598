"""Forward-push Personalized PageRank — static (K1), dynamic (K2),
top-k (K7), multi-source (K8). The heart of the engine.

Semantics pinned by tests/oracle.py (synchronous push, dangling
self-loop, stop at ||r||_1 <= eps per source), matching the reference's
forward-push (residual, reserve) formulation (guowentian/dynamicppr is the
artifact of Guo et al., "Parallel Personalized PageRank on Dynamic
Graphs", PVLDB'17; checkout absent in sandbox — SURVEY.md §0).

State is a SPARSE DataFrame ``(source, vid, residual, reserve)``: only
touched vertices have rows, giving forward-push its locality. All joins
key on (source, vid) or src; the big scatter table never re-shuffles
(persisted pre-partitioned on src).

Dynamic maintenance (K2) — batch-level invariant restoration
-------------------------------------------------------------
Push maintains, for every target t:
    ppr(s,t) = pi[t] + sum_v r[v] * ppr_G(v,t)
Equivalently, with P the (dangling-self-loop) row-stochastic matrix:
    r = e_s - pi/alpha + ((1-alpha)/alpha) * P^T pi          (*)
When the graph changes P -> P', we restore (*) w.r.t. P' by adjusting
(pi, r) at touched vertices only, then re-push:

  For touched u with old outdeg d>0 and new outdeg d'>0, scale
  pi'[u] = pi[u] * d'/d. Old contributions p_u/d to surviving neighbors
  are then unchanged (p'_u/d' = p_u/d), so only:
    r[t] += ((1-alpha)/alpha) * pi[u]/d     for each ADDED edge (u,t)
    r[t] -= ((1-alpha)/alpha) * pi[u]/d     for each REMOVED edge (u,t)
    r[u] -= pi[u] * (d'-d) / (d * alpha)    (reserve-scaling correction)
  For dangling transitions (d=0 or d'=0), keep pi[u] and recompute u's
  full contribution row:
    old side: d>0 ? -c*pi[u]/d at each old neighbor : -c*pi[u] at u
    new side: d'>0 ? +c*pi[u]/d' at each new neighbor : +c*pi[u] at u
  with c = (1-alpha)/alpha.

This is exact algebra (no approximation beyond the final re-push to
||r||_1 <= eps), is batch-level (no per-update sequencing), touches only
O(|changed edges|) state for the common case, and handles insertions and
deletions symmetrically — deletions simply produce negative residuals.
Verified by the metamorphic gate in tests/test_dynamic_ppr.py: dynamic
maintenance over any update script == static recompute on the final
graph, to within 2*eps.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, Window, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.rddtrack import track_new_rdds, unpersist_rdd_ids

STATE_SCHEMA = "source bigint, vid bigint, residual double, reserve double"


@dataclass
class PPRMetrics:
    supersteps: int = 0
    wall_seconds: float = 0.0
    updates_applied: int = 0
    batches_applied: int = 0
    history: list[dict] = field(default_factory=list)

    @property
    def supersteps_per_sec(self) -> float:
        return self.supersteps / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def updates_per_sec(self) -> float:
        return self.updates_applied / self.wall_seconds if self.wall_seconds else 0.0


class PPREngine:
    """Maintains multi-source PPR state over a mutable LinkGraph."""

    def __init__(
        self,
        graph: LinkGraph,
        sources: list[int],
        alpha: float = 0.15,
        eps: float = 1e-6,
        ckpt_dir: str | None = None,
        ckpt_every: int = 10,
        max_supersteps: int = 2000,
        mode: str = "df",
        steps_per_job: int = 1,
    ) -> None:
        """``mode``:
          - 'df'   = DataFrame scatter join (pure JVM/codegen) — the
                     distributed default and the 100 TB path;
          - 'csr'  = per-partition CSR-block gather-scatter via
                     pandas/Arrow UDF (operators/csr_kernel.py);
          - 'bcsr' = broadcast-CSR local push (operators/local_push.py):
                     the whole CSR is torrent-broadcast and each source's
                     push runs as one vectorized numpy loop — the
                     reference-parity fast path for graphs that fit in
                     executor memory (gated by ``max_local_edges``);
          - 'auto' = 'bcsr' when the graph fits the gate, else 'df'.
        All modes implement identical push semantics.

        ``steps_per_job > 1`` composes that many supersteps into one Spark
        job (lazily chained plans, one checkpoint/observe at the end) while
        the state is small — amortizing the serial per-job floor.
        Convergence is then checked at block granularity; extra pushes past
        eps only tighten the result (push is monotone in ||r||_1), so
        scores stay within the same eps envelope."""
        self._graph = graph
        self._graph_stale = False  # bcsr updates defer the distributed sync
        self._user_graph = graph  # never released by apply_updates
        self._weighted = graph.weighted
        self.spark = graph.spark
        self.sources = [int(s) for s in sources]
        self.alpha = float(alpha)
        self.eps = float(eps)
        self.mode = mode
        self.ckpt_dir = ckpt_dir
        self.ckpt_every = ckpt_every
        self.max_supersteps = max_supersteps
        self.steps_per_job = max(1, int(steps_per_job))
        # stop composing once the state outgrows this (plan fan-out cost)
        self.compose_max_rows = 2_000_000
        self.metrics = PPRMetrics()
        self.state: DataFrame = self.spark.createDataFrame(
            [(s, s, 1.0, 0.0) for s in self.sources], schema=STATE_SCHEMA
        ).repartition(graph.num_partitions, "vid")
        self._converged = False
        self._dangling_possible = True
        self._per_source_freeze = True
        # Broadcast the frontier into the scatter join while the state is
        # small (rows tracked via the superstep observation). The threshold
        # is byte-derived (~40 B per (source,vid,residual,reserve) row);
        # on a real cluster size it to executor memory / the configured
        # autoBroadcastJoinThreshold — the shuffled-join fallback below
        # keeps correctness either way.
        self.broadcast_max_bytes = 128 << 20
        self.broadcast_max_rows = self.broadcast_max_bytes // 40
        self._broadcast_frontier = True
        # broadcast-CSR gate: ~16 B/edge -> 32M edges ≈ 0.5 GB per executor
        self.max_local_edges = 32_000_000
        self._local_csr = None          # driver-side LocalCSR mirror
        self._bc_csr = None             # its broadcast handle
        self._pending_adjust = None     # broadcast AdjustmentPlan (K2)

    @property
    def graph(self) -> LinkGraph:
        """The engine's current LinkGraph. After broadcast-CSR update
        batches the distributed mirror is rebuilt LAZILY from the local
        CSR (one Arrow upload), so the per-batch hot path never pays for
        distributed-table maintenance it may never need."""
        if self._graph_stale:
            self._graph = self._rebuild_graph_from_local()
            self._graph_stale = False
        return self._graph

    @graph.setter
    def graph(self, g: LinkGraph) -> None:
        self._graph = g
        self._graph_stale = False

    def _rebuild_graph_from_local(self) -> LinkGraph:
        import numpy as np
        import pandas as pd

        csr = self._local_csr
        src_ids = csr.vids[np.repeat(np.arange(csr.n), np.diff(csr.indptr))]
        dst_ids = csr.vids[csr.dst_pos]
        data = {"src": src_ids, "dst": dst_ids}
        if csr.w is not None:
            data["w"] = csr.w
        edf = self.spark.createDataFrame(pd.DataFrame(data))
        vdf = self.spark.createDataFrame(pd.DataFrame({"vid": csr.vids}))
        g = LinkGraph(
            edf,
            vertices=vdf,
            num_partitions=self._graph.num_partitions,
            persist=self._graph._persist,
            weighted=csr.w is not None,
        )
        g._num_edges = csr.n_edges
        g._num_vertices = csr.n
        old = self._graph
        if old is not self._user_graph:
            old.release()
        return g

    def _resolved_mode(self) -> str:
        if self.mode != "auto":
            return self.mode
        n_edges = (
            self._local_csr.n_edges
            if self._local_csr is not None
            else self._graph.num_edges
        )
        return "bcsr" if n_edges <= self.max_local_edges else "df"

    # ------------------------------------------------------------ push loop
    def _push_superstep(
        self,
        state: DataFrame,
        live_sources: list[int],
        broadcast_frontier: bool | None = None,
    ) -> DataFrame:
        """One synchronous superstep for the given sources; others frozen.

        ``broadcast_frontier=False`` is used inside composed multi-step
        jobs: a broadcast of an intermediate state would trigger one
        sequential broadcast job per sub-step, re-serializing the composed
        block. The state and the persisted scatter/degree tables are all
        hash-partitioned on the join key with the same width, so the
        shuffled join moves only the (small) frontier anyway."""
        if broadcast_frontier is None:
            broadcast_frontier = self._broadcast_frontier
        alpha = self.alpha
        if len(live_sources) == len(self.sources):
            live, frozen = state, None  # common case: no frozen branch
        else:
            live_pred = F.col("source").isin(live_sources)
            live = state.filter(live_pred)
            frozen = state.filter(~live_pred)

        # single-shuffle superstep: the absorbed state and the raw push
        # contributions are unioned and reduced by ONE groupBy(source, vid)
        # — replaces the old 3-stage groupBy + full_outer-merge pipeline
        # (each stage barrier is serial driver time that caps scaling)
        absorbed = live.select(
            "source",
            "vid",
            F.lit(0.0).alias("residual"),
            (F.col("reserve") + F.lit(alpha) * F.col("residual")).alias("reserve"),
        )
        active = live.filter(F.col("residual") != 0.0)
        if self.mode == "csr":
            from dynamicppr_spark.operators.csr_kernel import csr_scatter

            pushed = csr_scatter(
                active,
                self.graph.csr_blocks(),
                alpha,
                self.graph.num_partitions,
            ).withColumnRenamed("dr", "residual")
        else:
            scatter = self.graph.scatter_edges  # (src,dst,inv_outdeg) on src
            if broadcast_frontier:
                # forward-push frontiers are small by construction: ship the
                # frontier to the (persisted, partitioned) scatter table and
                # probe in place — zero shuffle/sort of the edge side per
                # superstep. Falls back to a shuffled join when the state
                # grows past the broadcast threshold (see push loop).
                active = F.broadcast(active)
            pushed = active.join(scatter, active.vid == scatter.src).select(
                "source",
                F.col("dst").alias("vid"),
                (
                    F.lit(1.0 - alpha) * F.col("residual") * F.col("inv_outdeg")
                ).alias("residual"),
            )
            if self._dangling_possible:
                dangling = (
                    active.join(
                        self.graph.out_degrees.select(F.col("src").alias("vid")),
                        "vid",
                        "left_anti",
                    )
                    .select(
                        "source",
                        "vid",
                        (F.lit(1.0 - alpha) * F.col("residual")).alias("residual"),
                    )
                )
                pushed = pushed.unionByName(dangling)
        pushed = pushed.withColumn("reserve", F.lit(0.0))
        new_live = (
            absorbed.unionByName(pushed)
            .groupBy("source", "vid")
            .agg(
                F.sum("residual").alias("residual"),
                F.sum("reserve").alias("reserve"),
            )
            .filter((F.col("residual") != 0.0) | (F.col("reserve") != 0.0))
        )
        if frozen is None:
            return new_live
        return new_live.unionByName(
            frozen.select("source", "vid", "residual", "reserve")
        )

    def _per_source_l1(self, state: DataFrame) -> dict[int, float]:
        rows = (
            state.groupBy("source")
            .agg(F.sum(F.abs(F.col("residual"))).alias("l1"))
            .collect()
        )
        l1 = {int(r["source"]): float(r["l1"]) for r in rows}
        for s in self.sources:
            l1.setdefault(s, 0.0)
        return l1

    def _l1_observation(self):
        """||r||_1 as observe() aggregates — captured during the superstep's
        own checkpoint job, no extra Spark job per step.

        <=32 sources: one conditional sum per source (enables per-source
        freezing and exact superstep parity with the sequential oracle).
        >32 sources: a single GLOBAL L1 — still a sound stop rule, since
        global L1 <= eps implies every source's L1 <= eps; freezing is
        disabled (extra pushes only refine converged sources within eps).
        """
        if self._per_source_freeze:
            return {
                f"l1_{s}": F.sum(
                    F.when(
                        F.col("source") == s, F.abs(F.col("residual"))
                    ).otherwise(0.0)
                )
                for s in self.sources
            }
        return {"l1_all": F.sum(F.abs(F.col("residual")))}

    def _check_dangling_possible(self, state: DataFrame) -> bool:
        """True unless no residual can ever land on an outdeg-0 vertex.

        Residual mass only ever sits on (a) the injected sources and (b)
        push targets, which are edge endpoints and hence in the vertex
        universe. So if no universe vertex is dangling (a cached,
        incrementally-maintained graph flag — O(V) computed once, O(batch)
        per update), only the sources themselves can still be dangling
        (they may lie outside the universe) — a tiny broadcast-semi scan
        of the persisted degree table, not an O(state) join per call."""
        if self.graph.maybe_has_dangling_vertex():
            return True
        uniq = sorted(set(self.sources))
        src_df = self.spark.createDataFrame([(s,) for s in uniq], "src bigint")
        with_out = (
            self.graph.out_degrees.join(F.broadcast(src_df), "src", "left_semi")
            .count()
        )
        return with_out < len(uniq)

    def push_to_convergence(self) -> PPRMetrics:
        """Run synchronous supersteps until every source has ||r||_1 <= eps."""
        if self._resolved_mode() == "bcsr":
            return self._push_local()
        t0 = time.time()
        base = self.metrics.supersteps
        # pre-materialize graph caches so checkpoint rotation (below) never
        # captures them as superstep state
        if self.mode == "csr":
            self.graph.csr_blocks().count()
        else:
            self.graph.scatter_edges.count()
            self.graph.out_degrees.count()
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        if not hasattr(self, "_rotator"):
            self._rotator = CheckpointRotator(self.spark)
        rotator = self._rotator  # engine-scoped: rotates across batches too
        # lineage truncated EVERY superstep (state is referenced 3x per
        # push: absorb + scatter + merge — a lazy plan would triple per
        # iteration; see operators/superstep.py for the same rationale);
        # the rotator unpersists the previous superstep's blocks
        state = rotator.checkpoint(self.state)
        self._dangling_possible = self._check_dangling_possible(state)
        self._per_source_freeze = len(self.sources) <= 32
        obs_exprs = self._l1_observation()
        obs_exprs["state_rows"] = F.count(F.lit(1))
        l1 = self._per_source_l1(state)
        live = [s for s in self.sources if l1[s] > self.eps]
        steps = 0
        state_rows = len(self.sources)
        last_durable = 0
        while live and steps < self.max_supersteps:
            # compose k supersteps into ONE job while the state is small —
            # the per-job serial floor (Catalyst+py4j+scheduling+barrier),
            # not shuffle bytes, dominates small-state supersteps
            k = (
                self.steps_per_job
                if state_rows <= self.compose_max_rows
                else 1
            )
            k = max(1, min(k, self.max_supersteps - steps))
            new_state = state
            inter_ids: set[int] = set()
            for j in range(k):
                new_state = self._push_superstep(
                    new_state,
                    live,
                    broadcast_frontier=self._broadcast_frontier if k == 1 else False,
                )
                if j < k - 1:
                    # LAZY localCheckpoint: plan cut to a leaf per sub-step,
                    # RDD DAG computes each intermediate once inside the
                    # block's single job (rationale in superstep.py)
                    with track_new_rdds(self.spark.sparkContext) as created:
                        new_state = new_state.localCheckpoint(eager=False)
                    inter_ids |= created.ids
            steps += k
            obs = Observation()
            state = rotator.checkpoint(
                new_state.observe(
                    obs, *[c.alias(kk) for kk, c in obs_exprs.items()]
                )
            )
            got = obs.get
            unpersist_rdd_ids(self.spark.sparkContext, inter_ids)
            state_rows = int(got.get("state_rows") or 0)
            self._broadcast_frontier = state_rows <= self.broadcast_max_rows
            if self._per_source_freeze:
                l1 = {s: float(got[f"l1_{s}"] or 0.0) for s in self.sources}
            else:
                g_l1 = float(got["l1_all"] or 0.0)
                l1 = {s: g_l1 for s in self.sources}
            live = [s for s in self.sources if l1[s] > self.eps]
            self.metrics.history.append(
                {"superstep": base + steps, "max_l1": max(l1.values())}
            )
            if self.ckpt_dir is not None and steps - last_durable >= self.ckpt_every:
                state = self._checkpoint(state, base + steps, l1)
                last_durable = steps
        wall = time.time() - t0
        self.state = state
        self._converged = not live
        self.metrics.supersteps = base + steps
        self.metrics.wall_seconds += wall
        # final durable checkpoint — unless this exact iteration was already
        # written inside the loop (overwriting it=N while the state plan
        # still lazily READS it=N would delete the files out from under the
        # scan)
        if self.ckpt_dir is not None and steps != last_durable:
            self.state = self._checkpoint(self.state, base + steps, l1)
        return self.metrics

    def _checkpoint(self, state: DataFrame, it: int, l1: dict) -> DataFrame:
        from dynamicppr_spark.operators.superstep import _write_checkpoint
        from pathlib import Path

        ckpt = Path(self.ckpt_dir)
        ckpt.mkdir(parents=True, exist_ok=True)
        reread = _write_checkpoint(
            state,
            ckpt,
            it,
            {"delta": max(l1.values()) if l1 else 0.0,
             "per_source_l1": {str(k): v for k, v in l1.items()}},
            {"name": "ppr", "alpha": self.alpha, "eps": self.eps,
             "partition_key": "vid",
             "num_partitions": self.graph.num_partitions},
        )
        return reread

    @classmethod
    def resume(
        cls, graph: LinkGraph, sources: list[int], ckpt_dir: str, **kwargs
    ) -> "PPREngine":
        """Resume a killed run mid-iteration from its durable checkpoint."""
        from dynamicppr_spark.operators.superstep import latest_checkpoint

        eng = cls(graph, sources, ckpt_dir=ckpt_dir, **kwargs)
        found = latest_checkpoint(ckpt_dir)
        if found is not None:
            it, manifest = found
            eng.state = graph.spark.read.parquet(f"{ckpt_dir}/it={it}")
            eng.metrics.supersteps = it
        return eng

    # --------------------------------------------------- broadcast-CSR mode
    def _ensure_local_csr(self) -> None:
        from dynamicppr_spark.operators.local_push import csr_from_graph

        if self._local_csr is None:
            self._local_csr = csr_from_graph(
                self.graph, max_edges=self.max_local_edges
            )
            self._bc_csr = self.spark.sparkContext.broadcast(self._local_csr)

    def _push_local(self) -> PPRMetrics:
        """Broadcast-CSR push: ONE Spark job — groupBy(source).applyInPandas
        runs each source's full synchronous push loop as vectorized numpy
        against the broadcast CSR (reference-parity in-memory execution;
        see operators/local_push.py). Pending K2 adjustments are applied
        in-kernel before pushing."""
        from pyspark.accumulators import AccumulatorParam
        from dynamicppr_spark.operators.local_push import make_push_kernel
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        t0 = time.time()
        base = self.metrics.supersteps
        self._ensure_local_csr()
        if not hasattr(self, "_rotator"):
            self._rotator = CheckpointRotator(self.spark)

        class _MaxParam(AccumulatorParam):
            def zero(self, value):
                return 0

            def addInPlace(self, v1, v2):
                return max(v1, v2)

        acc = self.spark.sparkContext.accumulator(0, _MaxParam())
        kernel = make_push_kernel(
            self._bc_csr,
            self.alpha,
            self.eps,
            self.max_supersteps,
            bc_adjust=self._pending_adjust,
            iter_accum=acc,
        )
        obs = Observation()
        # pre-partition by source to exactly the group count: the groupBy
        # shuffle then has one meaningful task per source instead of
        # shuffle.partitions mostly-empty tasks (matters when one source's
        # update re-push runs every second)
        nparts = max(1, min(len(set(self.sources)), self._graph.num_partitions))
        new_state = (
            self.state.repartition(nparts, "source")
            .groupBy("source")
            .applyInPandas(kernel, schema=STATE_SCHEMA)
            .observe(
                obs,
                F.sum(F.abs(F.col("residual"))).alias("l1_all"),
                F.count(F.lit(1)).alias("state_rows"),
            )
        )
        self.state = self._rotator.checkpoint(new_state)
        got = obs.get
        l1_all = float(got.get("l1_all") or 0.0)
        self._pending_adjust = None
        steps = int(acc.value)
        self._converged = l1_all <= self.eps
        self.metrics.supersteps = base + steps
        self.metrics.history.append(
            {"superstep": base + steps, "max_l1": l1_all}
        )
        self.metrics.wall_seconds += time.time() - t0
        if self.ckpt_dir is not None:
            self.state = self._checkpoint(
                self.state, base + steps, {s: l1_all for s in self.sources}
            )
        return self.metrics

    def _apply_updates_bcsr(self, batch: DataFrame) -> PPRMetrics:
        """K2 on the broadcast-CSR path: the driver patches its numpy edge
        mirror, precomputes the invariant-restoration COO template
        (local_push.build_adjustment), rebroadcasts, and ONE Spark job
        adjusts + re-pushes every source. The distributed LinkGraph mirror
        is NOT touched here — it is rebuilt lazily from the local CSR the
        next time ``self.graph`` is read (graph property above), so the
        update hot path is one tiny collect + driver numpy + one job."""
        from dynamicppr_spark.operators.local_push import (
            apply_batch_local,
            build_adjustment,
        )

        t0 = time.time()
        wall_before = self.metrics.wall_seconds
        self._ensure_local_csr()
        cols = ["op", "src", "dst"] + (["w"] if self._weighted else [])
        pdf = batch.select(*cols).toPandas()
        n_updates = len(pdf)
        old_csr = self._local_csr
        new_csr = apply_batch_local(
            old_csr,
            pdf["op"].tolist(),
            pdf["src"].to_numpy(),
            pdf["dst"].to_numpy(),
            pdf["w"].to_numpy() if "w" in pdf.columns else None,
        )
        adj = build_adjustment(
            old_csr, new_csr, self.alpha,
            touched_vids=pdf["src"].to_numpy(),
        )
        sc = self.spark.sparkContext
        old_bc = self._bc_csr
        self._local_csr = new_csr
        self._bc_csr = sc.broadcast(new_csr)
        self._pending_adjust = sc.broadcast(adj)
        if old_bc is not None:
            try:
                old_bc.unpersist()
            except Exception:  # noqa: BLE001
                pass
        self._graph_stale = True
        self._push_local()
        self.metrics.updates_applied += n_updates
        self.metrics.batches_applied += 1
        self.metrics.wall_seconds = wall_before + (time.time() - t0)
        return self.metrics

    # -------------------------------------------------------------- dynamic
    def apply_updates(self, batch: DataFrame) -> PPRMetrics:
        """K2: apply one batch of (op,src,dst[,w]) edge updates and re-push.

        The update algebra (module docstring) generalizes to weighted
        graphs with W_u = out-weight sum (``wout``) in place of the
        out-degree and per-edge weight w in place of 1 — for unweighted
        graphs wout is the exact integer-valued out-degree, so the floats
        are bit-identical to the unweighted formulation."""
        if self._resolved_mode() == "bcsr":
            return self._apply_updates_bcsr(batch)
        t0 = time.time()
        wall_before = self.metrics.wall_seconds
        c = (1.0 - self.alpha) / self.alpha
        n_updates = batch.count()
        old, new = self.graph, self.graph.with_updates(batch, batch_rows=n_updates)
        weighted = old.weighted
        ew = F.col("w") if weighted else F.lit(1.0)  # per-edge weight
        edge_key = ["src", "dst", "w"] if weighted else ["src", "dst"]

        touched = batch.select(
            F.col("src").cast("bigint").alias("src")
        ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
        old_e = old.edges.join(F.broadcast(touched), "src", "left_semi")
        new_e = new.edges.join(F.broadcast(touched), "src", "left_semi")
        # weight changes on an existing pair appear in BOTH added (w_new)
        # and removed (w_old) — the two dr terms then sum to c*p*Δw/W
        added = new_e.join(old_e, edge_key, "left_anti")
        removed = old_e.join(new_e, edge_key, "left_anti")

        deg = (
            touched.join(
                old.out_degrees.select("src", F.col("wout").alias("d_old")),
                "src",
                "left",
            )
            .join(
                new.out_degrees.select("src", F.col("wout").alias("d_new")),
                "src",
                "left",
            )
            .select(
                "src",
                F.coalesce("d_old", F.lit(0.0)).alias("d_old"),
                F.coalesce("d_new", F.lit(0.0)).alias("d_new"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # reserves of touched vertices, per source (p_u)
        p_u = (
            self.state.join(
                touched.withColumnRenamed("src", "vid"), "vid", "left_semi"
            )
            .filter(F.col("reserve") != 0.0)
            .select("source", F.col("vid").alias("src"), F.col("reserve").alias("p"))
            .join(deg, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        normal = p_u.filter((F.col("d_old") > 0.0) & (F.col("d_new") > 0.0))
        trans = p_u.filter((F.col("d_old") == 0.0) | (F.col("d_new") == 0.0))

        # --- normal case: only changed edges, old-out-weight denominator
        dr_added = added.join(normal, "src").select(
            "source", F.col("dst").alias("vid"),
            (F.lit(c) * F.col("p") * ew / F.col("d_old")).alias("dr"),
        )
        dr_removed = removed.join(normal, "src").select(
            "source", F.col("dst").alias("vid"),
            (-F.lit(c) * F.col("p") * ew / F.col("d_old")).alias("dr"),
        )
        dr_self = normal.select(
            "source", F.col("src").alias("vid"),
            (
                -F.col("p") * (F.col("d_new") - F.col("d_old"))
                / (F.col("d_old") * F.lit(self.alpha))
            ).alias("dr"),
        )
        # --- dangling transitions: full recompute of u's contribution row
        dr_t_old_edges = old_e.join(trans.filter(F.col("d_old") > 0.0), "src").select(
            "source", F.col("dst").alias("vid"),
            (-F.lit(c) * F.col("p") * ew / F.col("d_old")).alias("dr"),
        )
        dr_t_old_dang = trans.filter(F.col("d_old") == 0.0).select(
            "source", F.col("src").alias("vid"), (-F.lit(c) * F.col("p")).alias("dr")
        )
        dr_t_new_edges = new_e.join(trans.filter(F.col("d_new") > 0.0), "src").select(
            "source", F.col("dst").alias("vid"),
            (F.lit(c) * F.col("p") * ew / F.col("d_new")).alias("dr"),
        )
        dr_t_new_dang = trans.filter(F.col("d_new") == 0.0).select(
            "source", F.col("src").alias("vid"), (F.lit(c) * F.col("p")).alias("dr")
        )
        deltas = (
            dr_added.unionByName(dr_removed)
            .unionByName(dr_self)
            .unionByName(dr_t_old_edges)
            .unionByName(dr_t_old_dang)
            .unionByName(dr_t_new_edges)
            .unionByName(dr_t_new_dang)
            .groupBy("source", "vid")
            .agg(F.sum("dr").alias("dr"))
        )
        # --- reserve rescale for the normal case: pi'[u] = pi[u] * W'/W
        scale = deg.filter((F.col("d_old") > 0.0) & (F.col("d_new") > 0.0)).select(
            F.col("src").alias("vid"),
            (F.col("d_new") / F.col("d_old")).alias("rscale"),
        )
        new_state = (
            self.state.join(scale, "vid", "left")
            .select(
                "source", "vid", "residual",
                (F.col("reserve") * F.coalesce("rscale", F.lit(1.0))).alias("reserve"),
            )
            .join(deltas, ["source", "vid"], "full_outer")
            .select(
                "source", "vid",
                (
                    F.coalesce("residual", F.lit(0.0))
                    + F.coalesce("dr", F.lit(0.0))
                ).alias("residual"),
                F.coalesce("reserve", F.lit(0.0)).alias("reserve"),
            )
            .repartition(new.num_partitions, "vid")
        )
        self.state = new_state
        prev_graph = self.graph
        self.graph = new
        self.push_to_convergence()
        for df in (touched, deg, p_u):
            df.unpersist()
        # free the superseded graph's private delta blocks/caches — but
        # never the caller's original graph, and nothing the new graph
        # still shares (base edges/degree/scatter caches, vertex chain)
        if prev_graph is not self._user_graph:
            prev_graph.release(keep=new)
        self.metrics.updates_applied += n_updates
        self.metrics.batches_applied += 1
        # count full batch wall (prep + re-push), not just the push loop
        self.metrics.wall_seconds = wall_before + (time.time() - t0)
        return self.metrics

    # -------------------------------------------------------------- queries
    def scores(self) -> DataFrame:
        """(source, vid, score) — converged reserves."""
        return self.state.select(
            "source", "vid", F.col("reserve").alias("score")
        ).filter(F.col("score") != 0.0)

    def top_k(self, k: int) -> DataFrame:
        """(source, vid, score, rank) — K7, per-source top-k."""
        w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("vid"))
        return (
            self.scores()
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )


def ppr(
    graph: LinkGraph,
    sources: list[int],
    alpha: float = 0.15,
    eps: float = 1e-6,
    ckpt_dir: str | None = None,
) -> DataFrame:
    """Static multi-source PPR (K1/K8): (source, vid, score)."""
    eng = PPREngine(graph, sources, alpha=alpha, eps=eps, ckpt_dir=ckpt_dir)
    eng.push_to_convergence()
    return eng.scores()
