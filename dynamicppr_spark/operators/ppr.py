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

from dynamicppr_spark.graph import LinkGraph, make_local_frame
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
        self._state_rows = len(self.sources)
        self.state: DataFrame = self.spark.createDataFrame(
            [(s, s, 1.0, 0.0) for s in self.sources], schema=STATE_SCHEMA
        ).repartition(self._state_parts(len(self.sources)), "vid")
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
        self._sources_have_out = None   # cached dangling-sources probe
        self._last_durable = 0

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
                # NOTE: hint only this join's build side — a broadcast hint
                # on the LEFT of the dangling left-anti join below is
                # unsupported (build-left) and would just warn per superstep
                probe = F.broadcast(active)
            else:
                probe = active
            pushed = probe.join(scatter, probe.vid == scatter.src).select(
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

    # ------------------------------------------------- dense multi-source
    # Round-6 (guide §2.3 "shuffle fewer bytes" / §2.4): with S maintained
    # sources the row state keys on (source, vid), so every superstep's
    # scatter join emits |frontier-edges| x S rows (76M at bench scale)
    # and the merge hash-aggregates S x |touched| keys. The DENSE form
    # keys on vid alone with length-S residual/reserve arrays: the join
    # emits |frontier-edges| rows, the aggregate runs S elementwise sums
    # over |touched| keys, and the broadcast frontier carries one row per
    # vid. Same push algebra per (source, vid) — only summation grouping
    # changes (float reassociation at the ulp level; all PPR gates are
    # 1e-6 and oracle scores round to 6 dp). Used for S > 1 df pushes;
    # S == 1 and csr mode keep the row path bit-for-bit.
    def _use_dense(self) -> bool:
        return self.mode != "csr" and len(self.sources) > 1

    def _dense_row_bytes(self) -> int:
        return 32 + 16 * len(self.sources)

    def _to_dense(self, state: DataFrame) -> DataFrame:
        # Aggregates built from SQL strings, not Column-by-Column: with S
        # sources the 2*S conditional sums cost ~400 py4j round-trips per
        # call in Column form — measured 0.7 s of pure driver time per K2
        # batch (same rationale as _push_superstep_dense's SQL strings).
        S = len(self.sources)
        aggs = [
            F.expr(
                f"sum(case when source = {s}L then {col} else 0.0D end)"
            ).alias(f"_{p}{i}")
            for i, s in enumerate(self.sources)
            for p, col in (("r", "residual"), ("v", "reserve"))
        ]
        res_sql = "array(" + ",".join(f"_r{i}" for i in range(S)) + ") as res"
        resv_sql = "array(" + ",".join(f"_v{i}" for i in range(S)) + ") as resv"
        return state.groupBy("vid").agg(*aggs).selectExpr(
            "vid", res_sql, resv_sql
        )

    def _from_dense(self, dstate: DataFrame) -> DataFrame:
        # SQL-string form (see _to_dense): the S struct/explode Columns
        # cost ~0.5 s of py4j driver time per call in Column form.
        structs = ",".join(
            f"struct(cast({s} as bigint) as source, res[{i}] as residual, "
            f"resv[{i}] as reserve)"
            for i, s in enumerate(self.sources)
        )
        return (
            dstate.selectExpr("vid", f"explode(array({structs})) as x")
            .selectExpr(
                "x.source as source", "vid",
                "x.residual as residual", "x.reserve as reserve",
            )
            .filter("residual != 0.0D or reserve != 0.0D")
        )

    def _push_superstep_dense(
        self,
        state: DataFrame,
        live_mask: list[bool],
        broadcast_frontier: bool,
    ) -> DataFrame:
        """One synchronous superstep over the dense (vid, res[], resv[])
        state; frozen sources (live_mask[i] False) carry their residual
        untouched, exactly like the row path's frozen branch.

        Expressions are built as SQL STRINGS (one parser call each), not
        Column-by-Column: a composed loop constructs this plan ~15x per
        run and the ~200 py4j round-trips per superstep of the Column
        form measured ~0.9 s of pure driver time per step."""
        alpha = self.alpha
        S = len(self.sources)
        a = repr(float(alpha))  # shortest round-trip repr == same double
        c = repr(float(1.0 - alpha))
        zeros_sql = "array(" + ",".join(["0.0D"] * S) + ")"
        # Rows carry (vid, arr, f, resv): the merge aggregates
        # sum(arr[i] * f) per element instead of building a length-S array
        # per pushed row and summing 2*S element extracts — measured ~1.7x
        # on the merge stage (the agg is the superstep's dominant cost).
        # The reserve needs NO aggregation at all: exactly one row per vid
        # (the absorbed carrier, resv non-null) holds it, so first(resv,
        # ignorenulls) is deterministic and keeps the row path's exact
        # reserve floats (never re-summed).
        absorbed_arr = "array(" + ",".join(
            ("0.0D" if live_mask[i] else f"res[{i}]") for i in range(S)
        ) + ") as arr"
        absorbed_resv = "array(" + ",".join(
            (f"resv[{i}] + {a}D * res[{i}]" if live_mask[i] else f"resv[{i}]")
            for i in range(S)
        ) + ") as resv"
        absorbed = state.selectExpr(
            "vid", absorbed_arr, "1.0D as f", absorbed_resv
        )
        active_pred = " or ".join(
            f"res[{i}] != 0.0D" for i in range(S) if live_mask[i]
        )
        active = state.filter(active_pred).select("vid", "res")
        scatter = self.graph.scatter_edges
        probe = F.broadcast(active) if broadcast_frontier else active
        pushed = probe.join(scatter, probe.vid == scatter.src).selectExpr(
            "dst as vid",
            "res as arr",
            f"{c}D * inv_outdeg as f",
            "cast(null as array<double>) as resv",
        )
        if self._dangling_possible:
            dangling = active.join(
                self.graph.out_degrees.select(F.col("src").alias("vid")),
                "vid",
                "left_anti",
            ).selectExpr(
                "vid",
                "res as arr",
                f"{c}D as f",
                "cast(null as array<double>) as resv",
            )
            pushed = pushed.unionByName(dangling)
        # per-element merge: live sources sum arr[i]*f over every row
        # (absorbed arr is 0 there); frozen sources must take ONLY the
        # absorbed carrier's residual (pushed rows carry the raw state
        # array) — identified by resv non-null.
        aggs = [
            F.expr(
                f"sum(arr[{i}] * f)"
                if live_mask[i]
                else f"sum(case when resv is not null then arr[{i}] "
                     "else 0.0D end)"
            ).alias(f"_r{i}")
            for i in range(S)
        ]
        aggs.append(F.expr("first(resv, true)").alias("_v"))
        res_sql = "array(" + ",".join(f"_r{i}" for i in range(S)) + ") as res"
        merged = (
            absorbed.unionByName(pushed)
            .groupBy("vid")
            .agg(*aggs)
            .selectExpr("vid", res_sql, f"coalesce(_v, {zeros_sql}) as resv")
        )
        return merged.filter(
            "exists(res, x -> x != 0.0D) or exists(resv, x -> x != 0.0D)"
        )

    def _l1_observation_dense(self):
        if self._per_source_freeze:
            return {
                f"l1_{s}": F.expr(f"sum(abs(res[{i}]))")
                for i, s in enumerate(self.sources)
            }
        return {
            "l1_all": F.expr(
                "sum(aggregate(res, 0.0D, (a, x) -> a + abs(x)))"
            )
        }

    def _ckpt_dense_with_l1(self, df: DataFrame, rotator):
        """Dense-state twin of ``_ckpt_with_l1`` (same fused
        checkpoint+observe job, array-element L1 aggregates)."""
        obs_exprs = self._l1_observation_dense()
        obs_exprs["state_rows"] = F.count(F.lit(1))
        obs = Observation()
        leaf = rotator.checkpoint(
            df.observe(obs, *[c.alias(k) for k, c in obs_exprs.items()])
        )
        got = obs.get
        rows = int(got.get("state_rows") or 0)
        # conservative (source, vid)-row upper bound for the width
        # heuristics that read _state_rows after a dense loop
        self._state_rows = rows * max(1, len(self.sources))
        if self._per_source_freeze:
            l1 = {s: float(got[f"l1_{s}"] or 0.0) for s in self.sources}
        else:
            g_l1 = float(got["l1_all"] or 0.0)
            l1 = {s: g_l1 for s in self.sources}
        return leaf, l1, rows

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
            # SQL strings (see _to_dense): S conditional sums in Column
            # form are ~5 py4j round-trips each, built once per checkpoint
            return {
                f"l1_{s}": F.expr(
                    f"sum(case when source = {s}L then abs(residual) "
                    "else 0.0D end)"
                )
                for s in self.sources
            }
        return {"l1_all": F.expr("sum(abs(residual))")}

    def _check_dangling_possible(self, state: DataFrame) -> bool:
        """True unless no residual can ever land on an outdeg-0 vertex.

        Residual mass only ever sits on (a) the injected sources and (b)
        push targets, which are edge endpoints and hence in the vertex
        universe. So if no universe vertex is dangling (a cached,
        incrementally-maintained graph flag — O(V) computed once, O(batch)
        per update), only the sources themselves can still be dangling
        (they may lie outside the universe) — a tiny broadcast-semi scan
        of the persisted degree table, computed ONCE per engine: the
        universe only grows, and any in-universe transition (a source
        losing its last out-edge) flips the maintained graph flag to True
        before this fallback is consulted."""
        if self.graph.maybe_has_dangling_vertex():
            return True
        if self._sources_have_out is None:
            uniq = sorted(set(self.sources))
            src_df = self.spark.createDataFrame(
                [(s,) for s in uniq], "src bigint"
            )
            with_out = (
                self.graph.out_degrees
                .join(F.broadcast(src_df), "src", "left_semi")
                .count()
            )
            self._sources_have_out = with_out == len(uniq)
        return not self._sources_have_out

    def _state_parts(self, rows: int) -> int:
        """Partition width for a state of ``rows`` rows: ~100k rows per
        partition, floor 4, capped at the graph width. Every reference to
        the state leaf schedules one task per partition, so a 20k-row
        state spread over 64 partitions costs pure scheduling (the
        round-3 profile's 672-task tagged stage); a 100M-row state still
        widens to the full graph width."""
        return max(4, min(self._graph.num_partitions, int(rows) // 100_000 + 1))

    def _ckpt_with_l1(self, df: DataFrame, rotator):
        """Checkpoint ``df`` with the per-source L1 (and row count)
        observation FUSED into the same job — replaces the old separate
        checkpoint + collect round trips. Returns (leaf, l1, rows)."""
        import os as _os

        if _os.environ.get("DYNPPR_NO_OBS") == "1":  # diagnostic fallback
            leaf = rotator.checkpoint(df)
            l1 = self._per_source_l1(leaf)
            rows = leaf.count()
            self._state_rows = rows
            return leaf, l1, rows
        obs_exprs = self._l1_observation()
        obs_exprs["state_rows"] = F.count(F.lit(1))
        obs = Observation()
        leaf = rotator.checkpoint(
            df.observe(obs, *[c.alias(k) for k, c in obs_exprs.items()])
        )
        got = obs.get
        rows = int(got.get("state_rows") or 0)
        self._state_rows = rows
        if self._per_source_freeze:
            l1 = {s: float(got[f"l1_{s}"] or 0.0) for s in self.sources}
        else:
            g_l1 = float(got["l1_all"] or 0.0)
            l1 = {s: g_l1 for s in self.sources}
        return leaf, l1, rows

    def _prepare_push(self) -> None:
        """Materialize the graph's hot-loop caches once per graph VERSION
        LINE (updated children inherit readiness — their overlays are
        already eagerly checkpointed) so checkpoint rotation never captures
        them as superstep state, and create the engine rotator."""
        g = self.graph
        if not getattr(g, "_push_ready", False):
            if self.mode == "csr":
                g.csr_blocks().count()
            else:
                g.scatter_edges.count()
                g.out_degrees.count()
            g._push_ready = True
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        if not hasattr(self, "_rotator"):
            self._rotator = CheckpointRotator(self.spark)
        self._per_source_freeze = len(self.sources) <= 32

    def _df_push_loop(
        self,
        state: DataFrame,
        l1: dict[int, float],
        rotator,
        *,
        state_rows: int,
        base: int,
        durable: bool,
        allow_dense: bool = True,
    ) -> tuple[DataFrame, int, dict[int, float]]:
        """Superstep loop over an already-checkpointed state leaf with its
        per-source L1 known (both come from one ``_ckpt_with_l1`` job).
        Lineage is truncated EVERY superstep — the state is referenced 3x
        per push (absorb + scatter + merge), so a lazy plan would triple
        per iteration (see operators/superstep.py). ``durable=False``
        suppresses mid-loop parquet checkpoints (used by the K2 delta
        re-push, whose partial state must never be resumable as a full
        state). Returns (state, steps, l1)."""
        live = [s for s in self.sources if l1[s] > self.eps]
        steps = 0
        self._last_durable = 0
        dense = allow_dense and self._use_dense()
        pivoted = bool(dense and live)
        if pivoted:
            # pivot (source, vid) rows -> one (vid, res[], resv[]) row,
            # LAZILY — no dedicated pivot job: the first superstep
            # materializes it (its two scans of the state share the
            # pivot's exchange), and l1/state_rows are already known from
            # the row-form checkpoint (state_rows, a row count, can only
            # overestimate the dense vid count — conservative for the
            # broadcast/compose thresholds below)
            state = self._to_dense(state)
        # derive the broadcast-frontier decision from THIS loop's entry
        # state size — the flag's terminal value from a previous loop is
        # stale (a K2 delta re-push always exits with tiny state/True,
        # which would broadcast-hint a later full-size state's first step).
        # Thresholds are byte-derived: dense rows are ~16*S+32 B wide.
        bc_rows = self.broadcast_max_bytes // (
            self._dense_row_bytes() if dense else 40
        )
        self._broadcast_frontier = state_rows <= bc_rows
        while live and steps < self.max_supersteps:
            # compose k supersteps into ONE job while the state is small —
            # the per-job serial floor (Catalyst+py4j+scheduling+barrier),
            # not shuffle bytes, dominates small-state supersteps
            k = (
                self.steps_per_job
                if state_rows <= self.compose_max_rows
                else 1
            )
            if self.eps == 0.0 and state_rows <= self.compose_max_rows:
                # eps=0 runs a FIXED superstep count with no convergence
                # feedback: a source's L1 hits exactly 0.0 only when it
                # has no residual rows left, and pushing such a source is
                # a no-op — so composing is exactly result-preserving
                # (same pushes, same floats), and only amortizes the
                # per-job serial floor (superstep.py docstring). Cap 16:
                # one job for bench-sized runs (15 steps: 17.4 s -> 15.8 s
                # A/B after the shuffle-writer fix), bounded lazy-
                # checkpoint chain depth for long eps=0 runs.
                k = max(k, 16)
            k = max(1, min(k, self.max_supersteps - steps))
            new_state = state
            inter_ids: set[int] = set()
            mask = [l1[s] > self.eps for s in self.sources]
            for j in range(k):
                bf = self._broadcast_frontier if k == 1 else False
                if dense:
                    new_state = self._push_superstep_dense(
                        new_state, mask, broadcast_frontier=bf
                    )
                else:
                    new_state = self._push_superstep(
                        new_state, live, broadcast_frontier=bf
                    )
                if j < k - 1:
                    # LAZY localCheckpoint: plan cut to a leaf per sub-step,
                    # RDD DAG computes each intermediate once inside the
                    # block's single job (rationale in superstep.py)
                    with track_new_rdds(self.spark.sparkContext) as created:
                        new_state = new_state.localCheckpoint(eager=False)
                    inter_ids |= created.ids
            steps += k
            import os as _os

            ckpt_fn = self._ckpt_dense_with_l1 if dense else self._ckpt_with_l1
            if _os.environ.get("DYNPPR_PROFILE") == "1":
                _t0 = time.time()
                _n = new_state.count()
                _t1 = time.time()
                state, l1, state_rows = ckpt_fn(new_state, rotator)
                print(
                    f"[loop-prof] step {steps}: count={_t1 - _t0:.2f}s "
                    f"ckpt={time.time() - _t1:.2f}s rows={state_rows}",
                    flush=True,
                )
            else:
                state, l1, state_rows = ckpt_fn(new_state, rotator)
            unpersist_rdd_ids(self.spark.sparkContext, inter_ids)
            self._broadcast_frontier = state_rows <= bc_rows
            live = [s for s in self.sources if l1[s] > self.eps]
            self.metrics.history.append(
                {"superstep": base + steps, "max_l1": max(l1.values())}
            )
            if (
                durable
                and self.ckpt_dir is not None
                and steps - self._last_durable >= self.ckpt_every
            ):
                if dense:
                    reread = self._checkpoint(
                        self._from_dense(state), base + steps, l1
                    )
                    state, l1, state_rows = self._ckpt_dense_with_l1(
                        self._to_dense(reread), rotator
                    )
                else:
                    state = self._checkpoint(state, base + steps, l1)
                self._last_durable = steps
        if pivoted:
            # back to the engine's (source, vid) row schema — a narrow
            # explode over the dense leaf (consumers re-checkpoint)
            state = self._from_dense(state)
        return state, steps, l1

    def push_to_convergence(self) -> PPRMetrics:
        """Run synchronous supersteps until every source has ||r||_1 <= eps."""
        if self._resolved_mode() == "bcsr":
            return self._push_local()
        t0 = time.time()
        base = self.metrics.supersteps
        self._prepare_push()
        rotator = self._rotator  # engine-scoped: rotates across batches too
        # initial checkpoint + per-source L1 in ONE fused job
        state, l1, state_rows = self._ckpt_with_l1(self.state, rotator)
        self._dangling_possible = self._check_dangling_possible(state)
        state, steps, l1 = self._df_push_loop(
            state, l1, rotator, state_rows=state_rows, base=base, durable=True
        )
        wall = time.time() - t0
        self.state = state
        self._converged = all(l1[s] <= self.eps for s in self.sources)
        self.metrics.supersteps = base + steps
        self.metrics.wall_seconds += wall
        # final durable checkpoint — unless this exact iteration was already
        # written inside the loop (overwriting it=N while the state plan
        # still lazily READS it=N would delete the files out from under the
        # scan)
        if self.ckpt_dir is not None and steps != self._last_durable:
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
             "sources": ",".join(str(s) for s in self.sources),
             "partition_key": "vid",
             "num_partitions": self.graph.num_partitions},
        )
        return reread

    @classmethod
    def resume(
        cls,
        graph: LinkGraph,
        sources: list[int] | None = None,
        ckpt_dir: str = "",
        **kwargs,
    ) -> "PPREngine":
        """Resume a killed run mid-iteration from its durable checkpoint.

        The checkpoint manifest records the original run's hyperparameters
        (alpha, eps, sources); any of them NOT passed here is restored from
        the manifest, so ``resume(graph, ckpt_dir=dir)`` continues the run
        with the exact configuration that produced the checkpoint.
        Explicit arguments still win — but note that resuming with a
        different eps converges to a different point than the original run
        would have (the convergence target changes, not the saved state).
        """
        from dynamicppr_spark.operators.superstep import latest_checkpoint

        if not ckpt_dir:
            raise ValueError("resume requires ckpt_dir")
        found = latest_checkpoint(ckpt_dir)
        meta = (found[1].get("meta") or {}) if found is not None else {}
        for key in ("alpha", "eps"):
            if key not in kwargs and key in meta:
                kwargs[key] = meta[key]
        if sources is None:
            if not meta.get("sources"):
                raise ValueError(
                    "sources not given and not recoverable from the "
                    f"checkpoint manifest under {ckpt_dir}"
                )
            sources = [int(s) for s in str(meta["sources"]).split(",")]
        eng = cls(graph, sources, ckpt_dir=ckpt_dir, **kwargs)
        if found is not None:
            it, _manifest = found
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
        # per-source convergence: each kernel group reports its own final
        # ||r||_1; the max over sources is compared to eps (same semantics
        # as the df path's per-source freeze — a sum over N sources could
        # sit at ~N*eps with every source individually converged)
        l1_acc = self.spark.sparkContext.accumulator(0.0, _MaxParam())
        kernel = make_push_kernel(
            self._bc_csr,
            self.alpha,
            self.eps,
            self.max_supersteps,
            bc_adjust=self._pending_adjust,
            iter_accum=acc,
            l1_accum=l1_acc,
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
        _ = float(got.get("l1_all") or 0.0)  # noqa: F841 — forces obs capture
        # free the consumed adjustment broadcast (it is baked into the
        # finished job; without this, long update streams accumulate one
        # broadcast block per batch)
        if self._pending_adjust is not None:
            try:
                self._pending_adjust.unpersist()
            except Exception:  # noqa: BLE001
                pass
        self._pending_adjust = None
        steps = int(acc.value)
        max_l1 = float(l1_acc.value)
        self._converged = max_l1 <= self.eps
        self.metrics.supersteps = base + steps
        self.metrics.history.append(
            {"superstep": base + steps, "max_l1": max_l1}
        )
        self.metrics.wall_seconds += time.time() - t0
        if self.ckpt_dir is not None:
            self.state = self._checkpoint(
                self.state, base + steps, {s: max_l1 for s in self.sources}
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
    def _collect_batch_context(self, batch: DataFrame):
        """ONE gated collect job gathering everything O(batch·deg) the K2
        adjustment needs: the raw batch rows, the touched srcs' old
        out-edges + out-weight sums, and the state reserves at touched
        vertices. Returns (PreparedBatch, p_state pandas) or (None, None)
        when any piece exceeds the driver gate — the fully distributed
        formulation then applies (same algebra, more jobs)."""
        import pandas as pd

        from dynamicppr_spark.graph import PreparedBatch

        g = self.graph
        cap = g.driver_batch_max_rows
        wcols = ["w"] if self._weighted else []
        bsel = [
            F.col("op").cast("string").alias("op"),
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
        ] + [F.coalesce(F.col("w"), F.lit(1.0)).cast("double").alias("w")
             for _ in wcols]
        null_d = F.lit(None).cast("double")
        null_l = F.lit(None).cast("bigint")
        touched_b = batch.select(
            F.col("src").cast("bigint").alias("src")
        ).distinct()
        # job 1 — ONE tagged-union collect: raw batch rows + touched srcs'
        # degrees + state reserves at touched vids. The degree/state sides
        # are small broadcast-probe scans; limit(cap+1) gates the whole
        # thing (the expensive part of limit+broadcast measured in round 3
        # was a coalesce(1) locality-wait stall, not the limit itself)
        b_sel = batch.select(
            F.lit("b").alias("kind"), *bsel,
            null_l.alias("outdeg"), null_d.alias("d_old"),
            null_l.alias("source"), null_d.alias("p"),
        )
        d_sel = g.out_degrees.join(
            F.broadcast(touched_b), "src", "left_semi"
        ).select(
            F.lit("d").alias("kind"), F.lit(None).cast("string").alias("op"),
            "src", null_l.alias("dst"),
            *([null_d.alias("w")] if wcols else []),
            F.col("outdeg").cast("bigint").alias("outdeg"),
            F.col("wout").cast("double").alias("d_old"),
            null_l.alias("source"), null_d.alias("p"),
        )
        p_sel = (
            self.state.join(
                F.broadcast(touched_b.withColumnRenamed("src", "vid")),
                "vid", "left_semi",
            )
            .filter(F.col("reserve") != 0.0)
            .select(
                F.lit("p").alias("kind"),
                F.lit(None).cast("string").alias("op"),
                F.col("vid").alias("src"), null_l.alias("dst"),
                *([null_d.alias("w")] if wcols else []),
                null_l.alias("outdeg"), null_d.alias("d_old"),
                "source", F.col("reserve").alias("p"),
            )
        )
        # round-6: the touched srcs' old out-edge rows ride the SAME
        # tagged collect (kind 'e') instead of a second driver job — the
        # global limit(cap+1) already gates total driver rows, subsuming
        # the old separate degree-sum pre-check of the edge volume
        e_sel = g.edges.join(F.broadcast(touched_b), "src", "left_semi").select(
            F.lit("e").alias("kind"), F.lit(None).cast("string").alias("op"),
            "src", F.col("dst").cast("bigint").alias("dst"),
            *([F.col("w").cast("double").alias("w")] if wcols else []),
            null_l.alias("outdeg"), null_d.alias("d_old"),
            null_l.alias("source"), null_d.alias("p"),
        )
        bdp = (
            b_sel.unionByName(d_sel).unionByName(p_sel).unionByName(e_sel)
            .limit(cap + 1)
            .toPandas()
        )
        if len(bdp) > cap:
            return None, None
        pdfb = bdp[bdp["kind"] == "b"][["op", "src", "dst"] + wcols].reset_index(
            drop=True
        )
        d_pdf = bdp[bdp["kind"] == "d"][["src", "outdeg", "d_old"]]
        # the union frame's source column is float64 (other kinds carry
        # nulls there): restore int64 NOW — a float64 column under a
        # bigint schema makes the later deltas createDataFrame fall back
        # from Arrow to the 32-partition pickled-row path (one Python
        # worker round-trip per partition, silently per batch)
        p_pdf = (
            bdp[bdp["kind"] == "p"][["source", "src", "p"]]
            .astype({"source": "int64", "src": "int64"})
            .reset_index(drop=True)
        )
        touched_ids = sorted(set(pdfb["src"].astype("int64").tolist()))
        if not touched_ids:
            return (
                PreparedBatch(
                    batch=pdfb,
                    old_e=pd.DataFrame({"src": [], "dst": [], **({"w": []} if wcols else {})}),
                    deg_old=pd.DataFrame({"src": [], "d_old": []}),
                ),
                pd.DataFrame({"source": [], "src": [], "p": []}),
            )
        ecols = ["src", "dst"] + wcols
        # the union frame's dst column is float64 (other kinds carry
        # nulls there) — restore exact integer dtypes before the rows are
        # re-uploaded via createDataFrame(schema="... bigint")
        e_pdf = (
            bdp[bdp["kind"] == "e"][ecols]
            .astype({"src": "int64", "dst": "int64"})
            .reset_index(drop=True)
        )
        return (
            PreparedBatch(
                batch=pdfb,
                old_e=e_pdf,
                deg_old=d_pdf[["src", "d_old"]].reset_index(drop=True),
            ),
            p_pdf,
        )

    def _d0_observe_exprs(self) -> dict:
        """Aggregates over the tagged-union checkpoint job that read the
        initial delta state's per-source L1 and row count — replaces the
        separate delta-checkpoint job."""
        # SQL strings (see _to_dense) — these aggregates ride the tagged
        # with_updates checkpoint job once per K2 batch
        if self._per_source_freeze:
            exprs = {
                f"l1_{s}": F.expr(
                    f"sum(case when kind = 'x_d0' and source = {s}L "
                    "then abs(val) else 0.0D end)"
                )
                for s in self.sources
            }
        else:
            exprs = {
                "l1_all": F.expr(
                    "sum(case when kind = 'x_d0' then abs(val) "
                    "else 0.0D end)"
                )
            }
        exprs["d0_rows"] = F.expr(
            "sum(case when kind = 'x_d0' then 1 else 0 end)"
        )
        return exprs

    def apply_updates(self, batch: DataFrame) -> PPRMetrics:
        """K2: apply one batch of (op,src,dst[,w]) edge updates and re-push.

        The update algebra (module docstring) generalizes to weighted
        graphs with W_u = out-weight sum (``wout``) in place of the
        out-degree and per-edge weight w in place of 1 — for unweighted
        graphs wout is the exact integer-valued out-degree, so the floats
        are bit-identical to the unweighted formulation.

        Distributed fast path (round-3 redesign) — per batch:
          1. ``with_updates(extra_frames=...)`` evaluates the graph deltas
             AND the K2 adjustment (initial delta residuals ``d0`` + the
             reserve rescale factors) in its single tagged checkpoint job:
             one O(E) scan, a few O(state) in-memory probes, two jobs total.
          2. Push is LINEAR in (residual, reserve), and the frozen part of
             the state carries zero residual — so the re-push runs on the
             DELTA STATE ONLY (old residual rows folded into ``d0`` so no
             eps-error accumulates across batches); supersteps shuffle
             O(|delta|) rows, not O(|state|).
          3. One final job merges the rescaled frozen reserves with the
             converged delta. ~4-5 driver-synchronized jobs per batch
             instead of the ~10 (several O(E)) of the round-2 path.
        """
        if self._resolved_mode() == "bcsr":
            return self._apply_updates_bcsr(batch)
        t0 = time.time()
        wall_before = self.metrics.wall_seconds
        c = (1.0 - self.alpha) / self.alpha
        weighted = self._weighted
        ew = F.col("w") if weighted else F.lit(1.0)  # per-edge weight
        edge_key = ["src", "dst", "w"] if weighted else ["src", "dst"]
        self._prepare_push()
        state = self.state  # checkpointed leaf from the previous push
        prepared, p_state = self._collect_batch_context(batch)
        p_state_touched_ids = (
            prepared.batch["src"].to_numpy(dtype="int64")
            if prepared is not None
            else None
        )

        def _adjustment_frames(ctx):
            """Evaluated INSIDE with_updates' tagged checkpoint job.

            d0 = old residuals ⊎ invariant-restoration deltas (module
            docstring algebra); scale = per-touched-src reserve rescale.

            FAST PATH (PreparedBatch available): the deltas are computed
            on the driver by the bcsr path's tested vectorized
            ``build_adjustment`` over the mini CSRs — dr[source, t] =
            coef(u,t) * reserve(source, u) — and enter the tagged job as
            two 1-partition local frames (plus the distributed state
            residual fold-in). The fully distributed join formulation
            below remains the fallback beyond the driver gate; parity is
            pinned by test_update_fast_path_matches_distributed_fallback.
            Duplicate (source, vid) rows in d0 are fine: the first
            superstep's groupBy merges them (push is linear), and the
            pre-merge L1 observation can only OVERestimate — never a
            false early-stop."""
            if p_state is not None and ctx.new_csr is not None:
                import pandas as pd

                from dynamicppr_spark.operators.local_push import (
                    build_adjustment,
                )

                plan = build_adjustment(
                    ctx.old_csr, ctx.new_csr, self.alpha,
                    touched_vids=p_state_touched_ids,
                )
                vids = ctx.new_csr.vids
                terms = pd.DataFrame(
                    {
                        "src": vids[plan.u_pos],
                        "vid": vids[plan.t_pos],
                        "coef": plan.coef,
                    }
                )
                deltas_pd = terms.merge(p_state, on="src")
                deltas_pd["val"] = deltas_pd["coef"] * deltas_pd["p"]
                deltas_pd = (
                    deltas_pd.groupby(["source", "vid"], as_index=False)["val"]
                    .sum()
                )
                deltas_pd = deltas_pd[deltas_pd["val"] != 0.0]
                # exact integer dtypes => Arrow-path createDataFrame
                # (see _collect_batch_context's p_pdf note)
                deltas_pd = deltas_pd.astype(
                    {"source": "int64", "vid": "int64"}
                )
                scale_pd = pd.DataFrame(
                    {"vid": vids[plan.ru_pos], "val": plan.factor}
                )
                dschema = "source bigint, vid bigint, val double"
                d0 = (
                    state.filter(F.col("residual") != 0.0)
                    .select(
                        "source", "vid", F.col("residual").alias("val")
                    )
                    .unionByName(
                        make_local_frame(
                            self.spark,
                            deltas_pd[["source", "vid", "val"]],
                            dschema,
                        )
                    )
                )
                scale = make_local_frame(
                    self.spark, scale_pd, "vid bigint, val double"
                )
                return {"d0": d0, "scale": scale}
            p_u = (
                state.join(
                    ctx.touched.withColumnRenamed("src", "vid"),
                    "vid", "left_semi",
                )
                .filter(F.col("reserve") != 0.0)
                .select(
                    "source",
                    F.col("vid").alias("src"),
                    F.col("reserve").alias("p"),
                )
                .join(ctx.deg, "src")
            )
            normal = p_u.filter((F.col("d_old") > 0.0) & (F.col("d_new") > 0.0))
            trans = p_u.filter((F.col("d_old") == 0.0) | (F.col("d_new") == 0.0))
            # weight changes on an existing pair appear in BOTH added
            # (w_new) and removed (w_old) — the dr terms sum to c*p*Δw/W
            added = ctx.new_e.join(ctx.old_e, edge_key, "left_anti")
            removed = ctx.old_e.join(ctx.new_e, edge_key, "left_anti")
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
            # --- dangling transitions: recompute u's full contribution row
            dr_t_oe = ctx.old_e.join(
                trans.filter(F.col("d_old") > 0.0), "src"
            ).select(
                "source", F.col("dst").alias("vid"),
                (-F.lit(c) * F.col("p") * ew / F.col("d_old")).alias("dr"),
            )
            dr_t_od = trans.filter(F.col("d_old") == 0.0).select(
                "source", F.col("src").alias("vid"),
                (-F.lit(c) * F.col("p")).alias("dr"),
            )
            dr_t_ne = ctx.new_e.join(
                trans.filter(F.col("d_new") > 0.0), "src"
            ).select(
                "source", F.col("dst").alias("vid"),
                (F.lit(c) * F.col("p") * ew / F.col("d_new")).alias("dr"),
            )
            dr_t_nd = trans.filter(F.col("d_new") == 0.0).select(
                "source", F.col("src").alias("vid"),
                (F.lit(c) * F.col("p")).alias("dr"),
            )
            deltas = (
                dr_added.unionByName(dr_removed)
                .unionByName(dr_self)
                .unionByName(dr_t_oe)
                .unionByName(dr_t_od)
                .unionByName(dr_t_ne)
                .unionByName(dr_t_nd)
            )
            # fold the state's leftover residuals in: the delta push then
            # converges the TOTAL per-source residual to eps (no eps-drift
            # accumulation over long update streams)
            d0 = (
                state.filter(F.col("residual") != 0.0)
                .select("source", "vid", F.col("residual").alias("dr"))
                .unionByName(deltas)
                .groupBy("source", "vid")
                .agg(F.sum("dr").alias("val"))
                .filter(F.col("val") != 0.0)
            )
            scale = ctx.deg.filter(
                (F.col("d_old") > 0.0) & (F.col("d_new") > 0.0)
            ).select(
                F.col("src").alias("vid"),
                (F.col("d_new") / F.col("d_old")).alias("val"),
            )
            return {"d0": d0, "scale": scale}

        import os

        prof = os.environ.get("DYNPPR_PROFILE") == "1"

        def _lap(label, since=[t0]):  # noqa: B006 — intentional shared cell
            if prof:
                now = time.time()
                print(f"[ppr-prof] {label}: {now - since[0]:.2f}s", flush=True)
                since[0] = now

        old = self.graph
        new = old.with_updates(
            batch,
            extra_frames=_adjustment_frames,
            prepared=prepared,
            extra_observe=self._d0_observe_exprs() if old._persist else None,
        )
        n_updates = int(new.last_batch_rows)
        _lap("with_updates+adjust")
        self.graph = new
        self._dangling_possible = (
            self._dangling_possible or self._check_dangling_possible(state)
        )
        new._push_ready = True  # overlays are checkpointed; base inherited

        # --- delta re-push (its own rotator: the engine rotator still
        # guards the pre-update state leaf, which `frozen` reads below)
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        delta_rot = CheckpointRotator(self.spark)
        full_state_rows = max(self._state_rows, 1)  # pre-delta full size
        d0 = new.extra_slices["d0"].select(
            "source", "vid",
            F.col("val").alias("residual"),
            F.lit(0.0).alias("reserve"),
        )
        if new.extra_metrics:
            # initial delta L1/rows were observed during the tagged
            # checkpoint job — the d0 slice is already leaf-backed, so no
            # separate delta-checkpoint job is needed
            got = new.extra_metrics
            if self._per_source_freeze:
                l1 = {s: float(got[f"l1_{s}"] or 0.0) for s in self.sources}
            else:
                g_l1 = float(got["l1_all"] or 0.0)
                l1 = {s: g_l1 for s in self.sources}
            drows = int(got["d0_rows"] or 0)
            dstate = d0
        else:
            dstate, l1, drows = self._ckpt_with_l1(d0, delta_rot)
        _lap("delta_ckpt")
        # (the sparse row formulation was also measured for this re-push —
        # 39.4 s vs 36.9 s on q_ppr_updates_df medians — the dense form
        # wins even on the sparse delta, so allow_dense stays default)
        dstate, steps, l1 = self._df_push_loop(
            dstate, l1, delta_rot, state_rows=drows,
            base=self.metrics.supersteps, durable=False,
        )
        _lap(f"repush[{steps} steps]")
        # --- merge: rescaled frozen reserves ⊎ converged delta (ONE job)
        scale = new.extra_slices["scale"].select("vid", F.col("val").alias("rscale"))
        frozen = (
            state.join(F.broadcast(scale), "vid", "left")
            .select(
                "source", "vid",
                F.lit(0.0).alias("residual"),
                (F.col("reserve") * F.coalesce("rscale", F.lit(1.0))).alias(
                    "reserve"
                ),
            )
            .filter(F.col("reserve") != 0.0)
        )
        # ONE exchange for merge + layout: hash-partitioning on vid
        # co-locates every (source, vid) group, so the aggregation after
        # the explicit repartition inserts no second exchange and the
        # result keeps the vid layout (guide §2.4). Width stays
        # _state_parts (not floored at cores): the merged leaf is scanned
        # 3+ times by the NEXT batch's probes, and those per-scan task
        # counts are exactly what _state_parts bounds; the agg itself is
        # ~0.2 s either way at bench scale.
        merged = (
            frozen.unionByName(dstate.select("source", "vid", "residual", "reserve"))
            .repartition(self._state_parts(full_state_rows), "vid")
            .groupBy("source", "vid")
            .agg(
                F.sum("residual").alias("residual"),
                F.sum("reserve").alias("reserve"),
            )
            .filter((F.col("residual") != 0.0) | (F.col("reserve") != 0.0))
        )
        # fused final checkpoint: merged-state L1 (== the converged delta
        # residual) + row count in the same job
        self.state, l1, _ = self._ckpt_with_l1(merged, self._rotator)
        _lap("merge")
        # the merged state is materialized: free the last delta leaf
        unpersist_rdd_ids(self.spark.sparkContext, delta_rot._prev_ids)
        delta_rot.release()
        self._converged = all(l1[s] <= self.eps for s in self.sources)
        self.metrics.supersteps += steps
        if self.ckpt_dir is not None:
            self.state = self._checkpoint(self.state, self.metrics.supersteps, l1)
        # free the superseded graph's private delta blocks/caches — but
        # never the caller's original graph, and nothing the new graph
        # still shares (base edges/degree/scatter caches, vertex chain)
        if old is not self._user_graph:
            old.release(keep=new)
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
