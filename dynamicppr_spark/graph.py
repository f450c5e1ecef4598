"""LinkGraph — the engine's core graph abstraction over a Spark edge table.

The reference (guowentian/dynamicppr; checkout absent, SURVEY.md §0) keeps a
directed graph as an in-memory CSR over dense int vertex ids. Spark-native
mapping (SURVEY.md §1.2):

  - edge table  ``edges(src:bigint, dst:bigint[, w:double])`` hash-partitioned
    on src (BASELINE.json north_star: "explicit hash-partitioning on src"),
  - degree table ``out_degrees(src, outdeg, wout)``  (SURVEY.md §2 E7);
    ``wout`` is the out-weight sum (== outdeg for unweighted graphs) — the
    push/teleport denominator for both weighted and unweighted kernels,
  - per-partition CSR blocks
    ``csr_blocks(part, srcs:array, indptr:array, dsts:array)`` built with a
    grouped-map pandas UDF (SURVEY.md §2 E8) and iterated by the pandas/Arrow
    gather-scatter fast path in operators/.

Dynamic updates — persisted base + tiny delta overlay (round-2 redesign)
------------------------------------------------------------------------
``with_updates`` never copies or re-shuffles the O(E) edge mass. The edge
set is represented as::

    edges = (base \\ minus) ∪ plus

where ``base`` is the persisted, src-partitioned bulk and ``minus``/``plus``
are tiny eagerly-localCheckpoint'ed delta tables that grow by at most
|batch| rows per batch (algebra: for a batch with pair-set P and inserts I,
``minus' = minus ∪ P`` and ``plus' = (plus \\ P) ∪ I`` — both O(|batch|)
operations; base rows touched by P are suppressed by minus', inserts live
only in plus', so the composition stays an exact duplicate-free set).
Derived tables are patched the same way: degrees/scatter keep their
persisted base plus a (dirty-src anti-join + override) overlay. The vertex
universe only ever grows (``old.vertices ∪ new endpoints``) so explicit or
isolated-by-deletion vertices are preserved across updates. When the
accumulated deltas exceed ``compact_threshold_rows`` the graph compacts
back into a fresh persisted base (one full shuffle, amortized over many
batches).

Scale notes (100 TB / 1e9-edge design intent):
  - Everything is a DataFrame; no driver-side materialization of vertices or
    edges, only scalar aggregates cross to the driver.
  - Per update batch the only O(E) work is in-memory scans of the persisted
    base with broadcast-hash probes (no shuffle, no copy); shuffles touch
    only O(|batch|) rows. A full-edge shuffle happens only at compaction.
  - The scatter table (src, dst, inv_outdeg) base is persisted
    pre-partitioned on src so the per-superstep frontier join never
    re-shuffles the (huge) edge side — only the (small) frontier and the
    contribution reduce shuffle.
  - localCheckpoint blocks created for deltas are tracked (rddtrack) and
    freed by ``release()`` — long update streams stay bounded in storage.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.rddtrack import track_new_rdds, unpersist_rdd_ids

CSR_SCHEMA = (
    "part int, vmin bigint, vmax bigint, "
    "srcs array<bigint>, indptr array<bigint>, dsts array<bigint>"
)


@dataclass
class PreparedBatch:
    """Driver-collected per-batch context (all pandas, all O(batch·deg)):
    ``batch`` raw rows (op,src,dst[,w]); ``old_e`` the touched srcs' old
    out-edge rows; ``deg_old`` their old out-weight sums (src, d_old).
    Produced by one gated collect job (PPREngine._collect_batch_context);
    feeding these back as 1-partition local frames removes every big-table
    scan except the vertex probe from the tagged delta job."""

    batch: "pd.DataFrame"
    old_e: "pd.DataFrame"
    deg_old: "pd.DataFrame"


class UpdateContext:
    """Lazy per-batch frames handed to ``with_updates(extra_frames=...)``
    callbacks, all derived from the batch's single checkpointed O(E) scan:
    ``old_e``/``new_e`` are the touched srcs' old/new out-edge rows
    (src, dst[, w]); ``deg`` is (src, d_old, d_new) out-weight sums.
    On the PreparedBatch fast path, ``old_csr``/``new_csr`` additionally
    carry the driver-side LocalCSR minis over the touched srcs' edges —
    the PPR engine feeds them straight into the bcsr path's vectorized
    ``build_adjustment`` instead of expressing the delta algebra as ~10
    Spark join branches (each branch reference scheduled its own task
    wave; the stage storm was the round-3 profile's residual cost).

    ``old_e``/``new_e``/``deg`` may be passed as zero-arg callables,
    materialized on first attribute access: on the PreparedBatch fast
    path the engine's adjustment reads only the mini CSRs, so the
    largest per-batch local-frame uploads are skipped entirely."""

    def __init__(
        self, touched, pairs, ins, old_e, new_e, deg,
        old_csr=None, new_csr=None,
    ):
        self.touched = touched
        self.pairs = pairs
        self.ins = ins
        self._old_e = old_e
        self._new_e = new_e
        self._deg = deg
        self.old_csr = old_csr
        self.new_csr = new_csr

    def _resolve(self, name: str) -> "DataFrame":
        v = getattr(self, name)
        if callable(v):
            v = v()
            setattr(self, name, v)
        return v

    @property
    def old_e(self) -> "DataFrame":
        return self._resolve("_old_e")

    @property
    def new_e(self) -> "DataFrame":
        return self._resolve("_new_e")

    @property
    def deg(self) -> "DataFrame":
        return self._resolve("_deg")


def make_local_frame(spark, pdf2: "pd.DataFrame", schema: str) -> DataFrame:
    """Small pandas frame -> ONE-partition local DataFrame.

    Two silent fallbacks are routed around here (round-6 event-log
    profile of the K2 batch path):
    - EMPTY pandas frames: ``createDataFrame`` falls back from Arrow to
      the pickled LIST path — 32 Python-worker partitions costing ~0.4 s
      per frame (3.5 s if coalesced to one task). An empty ``range(0)``
      + null casts is a pure-JVM relation (measured 0.08 s).
    - Fixed-width frames: without the coalesce, LocalTableScan
      parallelizes to min(rows, defaultParallelism) partitions — the ~9
      local frames per batch put ~300 mostly-empty scheduler-floor tasks
      into the tagged checkpoint job. coalesce(1) over a parallelize is
      narrow with NO preferred locations (the round-3 locality-wait
      concern applied to coalesced BLOCK-backed rdds; re-measured on
      4.1.2: equal or faster, including under a broadcast build).
    Callers must keep pandas dtypes exactly matching ``schema`` (int64
    for bigint) or the Arrow path falls back to pickled rows too."""
    if len(pdf2) == 0:
        exprs = []
        for col in schema.split(","):
            name, typ = col.strip().split(None, 1)
            exprs.append(f"cast(null as {typ}) as {name}")
        return spark.range(0, 0, 1, 1).selectExpr(*exprs)
    return spark.createDataFrame(pdf2, schema=schema).coalesce(1)


def _build_csr_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: edge rows of one hash-partition -> one CSR row.

    Vectorized numpy only (BASELINE.json input_hint: "no per-row Python").
    """
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    srcs, counts = np.unique(src, return_counts=True)
    indptr = np.zeros(len(srcs) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return pd.DataFrame(
        {
            "part": [int(pdf["part"].iloc[0])],
            "vmin": [int(srcs.min()) if len(srcs) else 0],
            "vmax": [int(srcs.max()) if len(srcs) else -1],
            "srcs": [srcs],
            "indptr": [indptr],
            "dsts": [dst],
        }
    )


class LinkGraph:
    """A directed graph held as Spark DataFrames.

    Parameters
    ----------
    edges : DataFrame with columns (src: bigint, dst: bigint[, w: double]).
        Extra columns are dropped. Duplicate edges and self-loops are
        removed (the reference models a simple directed graph); for
        weighted graphs duplicate (src, dst) rows have their weights summed.
        Weights must be positive for the PPR/PageRank kernels.
    vertices : optional DataFrame (vid: bigint) defining the vertex universe
        (to include isolated vertices); defaults to endpoints of ``edges``.
    num_partitions : hash-partition width for edges/state; defaults to the
        session's shuffle partition count.
    weighted : force weighted/unweighted; default = ``"w" in edges.columns``.
    """

    compact_threshold_rows: int = 100_000
    # second compaction trigger: accumulated delta-chain CHECKPOINT BLOCKS.
    # A stream whose batches keep introducing NEW vertices adds one tiny
    # nv-slice checkpoint per batch; with small batches the row trigger
    # above never fires, so the persistent-block count (and the vertex
    # union's plan depth) would grow without bound over a long stream.
    # Folding every N chain blocks bounds both at O(N) for an amortized
    # O(E/N) compaction cost per batch. (Caught by the 30-batch dedup
    # stream soak: +1 block per batch, round-3 leak class.)
    compact_max_chain_blocks: int = 32
    # update batches at or below this row count are deduped on the DRIVER
    # (one O(batch) collect replaces 4-5 tiny shuffle stages and their AQE
    # barriers per batch — the round-3 profile showed those stage barriers,
    # not data volume, dominate per-batch latency); larger batches keep the
    # fully distributed prep
    driver_batch_max_rows: int = 1_000_000

    def __init__(
        self,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        num_partitions: int | None = None,
        persist: bool = True,
        assume_normalized: bool = False,
        weighted: bool | None = None,
    ) -> None:
        """``assume_normalized=True`` skips the dedup/self-loop/repartition
        pass — for internal callers (compaction) that guarantee the edge
        set is already a clean simple digraph."""
        spark = edges.sparkSession
        self.spark = spark
        self.num_partitions = int(
            num_partitions
            or spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.weighted = ("w" in edges.columns) if weighted is None else weighted
        self._persist = persist
        self._owned_caches: list[DataFrame] = []
        self._own_rdds: set[int] = set()
        self._chain_rdds: set[int] = set()

        if assume_normalized:
            base = edges
        else:
            cols = [
                F.col("src").cast("bigint").alias("src"),
                F.col("dst").cast("bigint").alias("dst"),
            ]
            e = edges.select(
                *cols,
                *([F.col("w").cast("double").alias("w")] if self.weighted else []),
            ).filter(F.col("src") != F.col("dst"))
            # ONE exchange for dedup + layout (guide §2.4 "two operations
            # keyed the same way share one exchange"): hash-partitioning
            # on src co-locates every (src, dst) pair, so the duplicate
            # aggregation after it needs no second (src, dst) exchange
            # and its output keeps the src partitioning the kernels need.
            e = e.repartition(self.num_partitions, "src")
            if self.weighted:
                e = (
                    e.groupBy("src", "dst")
                    .agg(F.sum("w").alias("w"))
                    .filter(F.col("w") != 0.0)
                )
            else:
                e = e.dropDuplicates(["src", "dst"])
            base = e
        if persist:
            base = base.persist(StorageLevel.MEMORY_AND_DISK)
            self._owned_caches.append(base)
        self._base_edges = base
        # delta overlay (None on a fresh/compacted graph)
        self._minus: DataFrame | None = None
        self._plus: DataFrame | None = None
        self._delta_rows = 0

        if vertices is not None:
            v = vertices.select(F.col("vid").cast("bigint").alias("vid"))
        else:
            v = (
                base.select(F.col("src").alias("vid"))
                .unionByName(base.select(F.col("dst").alias("vid")))
                .distinct()
            )
        # size-adaptive width (no explicit N => AQE coalesces the exchange
        # to the advisory partition size): a 20k-row vertex table lands in
        # 1-2 partitions instead of num_partitions mostly-empty ones —
        # every per-batch O(V) probe scan schedules one task per partition,
        # so fixed-width small tables are pure scheduling overhead; a 10^9
        # -row table still fans out
        v = v.repartition(F.col("vid"))
        if persist:
            v = v.persist(StorageLevel.MEMORY_AND_DISK)
            self._owned_caches.append(v)
        self._vertices = v

        self._num_vertices: int | None = None
        self._num_edges: int | None = None
        self.extra_slices: dict[str, DataFrame] = {}
        self.extra_metrics: dict[str, float] = {}
        self.last_batch_rows: int | None = None
        # set by kernels once the persisted scatter/degree bases are
        # materialized; children inherit it (their overlays are already
        # eagerly checkpointed) so per-batch pushes skip re-materialization
        self._push_ready = False
        # derived-table overlays: (base_df, dirty_src_df|None, override_df|None)
        self._deg: tuple[DataFrame, DataFrame | None, DataFrame | None] | None = None
        self._scat: tuple[DataFrame, DataFrame | None, DataFrame | None] | None = None
        self._csr: DataFrame | None = None
        self._sym: "LinkGraph | None" = None
        # True/False once known; None = not yet computed. Updates keep it
        # incrementally maintained (conservatively True-sticky).
        self._dangling_known: bool | None = None

    # ------------------------------------------------------------- composed
    @property
    def edges(self) -> DataFrame:
        """(src, dst[, w]) — the current edge set: (base \\ minus) ∪ plus."""
        e = self._base_edges
        if self._minus is not None:
            e = e.join(F.broadcast(self._minus), ["src", "dst"], "left_anti")
        if self._plus is not None:
            e = e.unionByName(self._plus)
        return e

    @property
    def vertices(self) -> DataFrame:
        return self._vertices

    def _edge_w(self, df: DataFrame):
        """Per-edge weight column (lit 1.0 for unweighted graphs)."""
        return F.col("w") if self.weighted else F.lit(1.0)

    def _ckpt(self, df: DataFrame, chain: bool = False) -> DataFrame:
        """Eagerly localCheckpoint a (tiny) delta frame, tracking its blocks
        so release() can free them. No-op when persist=False.

        The leaf is rebuilt WITHOUT the checkpoint's origin-plan linkage
        (rddtrack.detach_plan_origin): each batch's tagged plan embeds the
        previous batch's slices, so an undetached origin chain grows by one
        full batch plan per update and Catalyst's stats walk over it
        doubles per batch (the round-3 soak regression)."""
        if not self._persist:
            return df
        from dynamicppr_spark.rddtrack import detach_plan_origin

        with track_new_rdds(self.spark.sparkContext) as created:
            out = detach_plan_origin(df.localCheckpoint(eager=True))
        (self._chain_rdds if chain else self._own_rdds).update(created.ids)
        return out

    # ---------------------------------------------------------------- stats
    @property
    def num_vertices(self) -> int:
        if self._num_vertices is None:
            self._num_vertices = self._vertices.count()
        return self._num_vertices

    @property
    def num_edges(self) -> int:
        if self._num_edges is None:
            self._num_edges = self.edges.count()
        return self._num_edges

    @property
    def out_degrees(self) -> DataFrame:
        """(src, outdeg, wout) — SURVEY.md §2 E7; push denominators.

        ``outdeg`` is the out-edge count; ``wout`` the out-weight sum used
        by the kernels (== outdeg cast to double when unweighted).
        """
        if self._deg is None:
            d = (
                self.edges.groupBy("src")
                .agg(
                    F.count("*").alias("outdeg"),
                    F.sum(self._edge_w(self.edges)).cast("double").alias("wout"),
                )
                # size-adaptive width (see vertices comment in __init__)
                .repartition(F.col("src"))
            )
            if self._persist:
                d = d.persist(StorageLevel.MEMORY_AND_DISK)
                self._owned_caches.append(d)
            self._deg = (d, None, None)
        base, dirty, override = self._deg
        if dirty is None:
            return base
        out = base.join(F.broadcast(dirty), "src", "left_anti")
        if override is not None:
            out = out.unionByName(override)
        return out

    @property
    def scatter_edges(self) -> DataFrame:
        """(src, dst, inv_outdeg) pre-partitioned on src and persisted.

        ``inv_outdeg`` = w / wout (1/outdeg unweighted) — the push fraction
        along the edge. This is the hot-loop edge side for the DataFrame
        scatter path of PageRank/PPR: persisting the base partitioned on
        src means the per-superstep join against the state inserts no
        exchange on the edge side — only the small frontier and the
        groupBy(dst) reduction shuffle. After updates the composition adds
        only a broadcast-hash probe per scan (no copy, no shuffle).
        """
        if self._scat is None:
            # no explicit repartition: the base is already persisted
            # hash-partitioned on src (__init__ folds dedup+layout into
            # one exchange) and the degree side is a broadcast-sized
            # probe, so the join preserves the src layout — an explicit
            # repartition here re-shuffled the full edge mass a second
            # time per graph build for nothing. (If a planner ever picks
            # a shuffled join instead, its output is still hash(src,
            # shuffle.partitions) — the only consumer needing
            # co-partitioning is the non-broadcast push join, whose
            # state side adapts to whatever width this cache has.)
            s = (
                self.edges.join(self.out_degrees, "src")
                .select(
                    "src",
                    "dst",
                    (self._edge_w(self.edges) / F.col("wout")).alias("inv_outdeg"),
                )
            )
            if self._persist:
                s = s.persist(StorageLevel.MEMORY_AND_DISK)
                self._owned_caches.append(s)
            self._scat = (s, None, None)
        base, dirty, override = self._scat
        if dirty is None:
            return base
        out = base.join(F.broadcast(dirty), "src", "left_anti")
        if override is not None:
            out = out.unionByName(override)
        return out

    def maybe_has_dangling_vertex(self) -> bool:
        """True if some vertex in the universe may lack out-edges.

        Computed once (O(V) anti-join), then maintained incrementally by
        ``with_updates`` (True is sticky-conservative — safe: it only keeps
        the dangling branch alive in the push kernels)."""
        if self._dangling_known is None:
            outv = self.out_degrees.select(F.col("src").alias("vid"))
            self._dangling_known = (
                self._vertices.join(outv, "vid", "left_anti").limit(1).count() > 0
            )
        return self._dangling_known

    # ------------------------------------------------------------ CSR blocks
    def csr_blocks(self) -> DataFrame:
        """Per-partition CSR blocks (SURVEY.md §2 E8; BASELINE.json
        north_star "per-partition CSR blocks in DataFrames").

        One row per hash-partition ``part = pmod(src, P)``:
        (part, vmin, vmax, srcs, indptr, dsts). Iterated via numpy
        gather-scatter inside ``applyInPandas`` by the kernel fast path.
        Unweighted only (the CSR fast path divides by neighbor count).
        """
        if self.weighted:
            raise ValueError(
                "CSR gather-scatter mode does not support weighted graphs; "
                "use the DataFrame scatter path (mode='df')"
            )
        if self._csr is None:
            withpart = self.edges.withColumn(
                "part", F.pmod(F.col("src"), F.lit(self.num_partitions)).cast("int")
            )
            blocks = withpart.groupBy("part").applyInPandas(
                _build_csr_block, schema=CSR_SCHEMA
            )
            if self._persist:
                blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)
                self._owned_caches.append(blocks)
            self._csr = blocks
        return self._csr

    # ------------------------------------------------------------- variants
    def symmetrized(self) -> "LinkGraph":
        """Undirected view: edges ∪ reversed edges (for CC/LPA/triangles)."""
        if self._sym is None:
            e = self.edges
            rev = e.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                *([F.col("w")] if self.weighted else []),
            )
            self._sym = LinkGraph(
                e.unionByName(rev),
                vertices=self._vertices,
                num_partitions=self.num_partitions,
                persist=self._persist,
                weighted=self.weighted,
            )
        return self._sym

    # -------------------------------------------------------- dynamic (E9)
    def with_updates(
        self,
        batch: DataFrame,
        batch_rows: int | None = None,
        extra_frames=None,
        prepared: PreparedBatch | None = None,
        extra_observe: dict | None = None,
    ) -> "LinkGraph":
        """Apply one batch of edge updates, returning a new LinkGraph.

        ``batch`` columns: (op: '+'/'-', src, dst[, w]). New edge set =
        (old \\ batch pairs) ∪ inserts (SURVEY.md §2 E9) — a '-' deletes
        the pair, a '+' (re)inserts it (with weight ``w`` if weighted).

        FULLY INCREMENTAL — no O(E) shuffle or copy per batch (module
        docstring): only the tiny minus/plus deltas, the vertex-universe
        increment, and the touched-src degree/scatter overrides are
        computed and localCheckpoint'ed; the persisted base is reused
        untouched. Auto-compacts once accumulated deltas exceed
        ``compact_threshold_rows``.

        Per-batch job budget (round-3 redesign): exactly TWO eager jobs and
        ONE O(E) scan. The touched srcs' old out-edge rows (``old_e``) are
        extracted with a single broadcast-probe pass over the composed edge
        set and checkpointed; every other delta (new_e, degree/scatter
        overrides, vertex increment, dangling evidence) derives from that
        tiny leaf — Spark has no CSE across DataFrame references, so
        without the intermediate leaf each reference would re-scan E.

        ``extra_frames``: optional callable ``ctx -> dict[name, DataFrame]``
        letting callers (the PPR engine's K2 adjustment) evaluate their own
        per-batch delta frames INSIDE the same tagged checkpoint job. ``ctx``
        exposes lazy frames ``touched`` (src), ``pairs`` (src,dst), ``ins``,
        ``old_e`` / ``new_e`` (touched srcs' old/new out-edge rows) and
        ``deg`` (src, d_old, d_new out-weight sums). Returned frames must
        use a subset of columns {source, vid, src, dst, w, val}; the
        checkpointed slices are exposed as ``child.extra_slices[name]``.

        ``prepared`` (PreparedBatch): driver-collected batch context; the
        O(E) old_e extraction and the degree probe are then replaced with
        1-partition local frames, leaving the vertex probe as the tagged
        job's only big-table scan. ``extra_observe``: dict name -> aggregate
        Column evaluated on the tagged union DURING its checkpoint job
        (requires ``persist=True``); values appear in
        ``child.extra_metrics`` — the internal nv/dang/braw counts ride the
        same observation, so the per-batch count collect job is gone too.
        """
        p = self.num_partitions
        sc = self.spark.sparkContext
        if self.weighted and "w" not in batch.columns:
            batch = batch.withColumn("w", F.lit(1.0))
        if prepared is not None:
            prep = self._prep_pdf(prepared.batch)
        else:
            prep = self._prep_batch_driver(batch)
        if prep is not None:
            pairs, ins, touched, endpoints = (
                prep["pairs"], prep["ins"], prep["touched"], prep["endpoints"]
            )
            if batch_rows is None:
                batch_rows = prep["n_raw"]
        else:
            wsel = [
                F.coalesce(F.col("w"), F.lit(1.0)).cast("double").alias("w")
            ] if self.weighted else []
            ins = (
                batch.filter(F.col("op") == "+")
                .select(
                    F.col("src").cast("bigint").alias("src"),
                    F.col("dst").cast("bigint").alias("dst"),
                    *wsel,
                )
                .filter(F.col("src") != F.col("dst"))
            )
            if self.weighted:
                # duplicate '+' of the same pair in one batch:
                # deterministic, order-free rule = keep the MAX weight
                # (applied identically by local_push.apply_batch_local so
                # df and bcsr modes agree)
                ins = ins.groupBy("src", "dst").agg(F.max("w").alias("w"))
            else:
                ins = ins.dropDuplicates(["src", "dst"])
            pairs = batch.select(
                F.col("src").cast("bigint").alias("src"),
                F.col("dst").cast("bigint").alias("dst"),
            ).dropDuplicates(["src", "dst"])
            touched = pairs.select("src").distinct()
            endpoints = (
                pairs.select(F.col("src").alias("vid"))
                .unionByName(pairs.select(F.col("dst").alias("vid")))
                .distinct()
            )

        child = object.__new__(LinkGraph)
        child.spark = self.spark
        child.num_partitions = p
        child.weighted = self.weighted
        child._persist = self._persist
        child._owned_caches = []
        child._own_rdds = set()
        child._chain_rdds = set(self._chain_rdds)
        child._base_edges = self._base_edges
        child._num_vertices = None
        child._num_edges = None
        child._deg = None
        child._scat = None
        child._csr = None
        child._sym = None
        child._dangling_known = None
        child.extra_slices = {}
        child.last_batch_rows = None
        child.compact_threshold_rows = self.compact_threshold_rows
        child.compact_max_chain_blocks = self.compact_max_chain_blocks
        child._push_ready = (
            getattr(self, "_push_ready", False)
            and self._deg is not None
            and self._scat is not None
        )

        # ---- the batch's ONE O(E) scan: touched srcs' old out-edge rows,
        # eagerly checkpointed into a tiny leaf. Every downstream delta
        # (new_e, degree/scatter overrides, the caller's extra frames)
        # reads the leaf — Spark has no CSE across DataFrame references,
        # so each reference to a lazy old_e would re-scan the edge mass.
        import os as _os
        import time as _time

        _prof = _os.environ.get("DYNPPR_PROFILE") == "1"
        _pt = _time.time()
        olde_ids: set[int] = set()
        eschema = "src bigint, dst bigint" + (
            ", w double" if self.weighted else ""
        )
        mini = None
        if prepared is not None:
            # old_e already collected by the caller: 1-partition local
            # frame, no E scan / checkpoint job here — and everything that
            # depends only on the touched srcs' edges is derived on the
            # driver via the tested bcsr numpy machinery (one local frame
            # each instead of a fan of Spark join branches). The frames
            # enter ctx as THUNKS: the engine's fast-path adjustment reads
            # only the mini CSRs, so the uploads usually never happen.
            mini = self._mini_update_csrs(prepared, prep)
            old_e = lambda: self._mk_local(prepared.old_e, eschema)  # noqa: E731
            new_e = lambda: self._mk_local(mini["new_e_pd"], eschema)  # noqa: E731
        else:
            old_e = self.edges.join(F.broadcast(touched), "src", "left_semi")
            if self._persist:
                with track_new_rdds(sc) as created:
                    old_e = old_e.repartition(4).localCheckpoint(eager=True)
                olde_ids = created.ids
            # touched srcs' NEW out-edge rows == child.edges semi-joined on
            # touched, derived without another E scan: (old_e \ pairs) ∪ ins
            new_e = old_e.join(
                F.broadcast(pairs), ["src", "dst"], "left_anti"
            ).unionByName(ins)
        if _prof:
            print(f"[graph-prof] old_e: {_time.time() - _pt:.2f}s", flush=True)
            _pt = _time.time()
        ew = F.col("w") if self.weighted else F.lit(1.0)

        # ---- build EVERY remaining per-batch delta lazily, evaluate them
        # all in ONE tagged-union eager checkpoint job (each delta as its
        # own branch), then slice by kind. Separate eager checkpoints per
        # delta were ~6 driver-synchronized jobs per batch.
        TAG_COLS = [
            "kind", "src", "dst", "w", "vid", "outdeg", "wout",
            "inv_outdeg", "source", "val",
        ]

        def tag(df: DataFrame, kind: str, **cols) -> DataFrame:
            # one selectExpr STRING call per frame: the Column-by-Column
            # form cost ~30 py4j round-trips per tag() and ~0.4 s of pure
            # driver time per batch across the ~12 tagged branches
            # (ppr.py::_to_dense has the same rationale). ``cols`` values
            # are source column NAMES (validated against the frame).
            types = {
                "src": "bigint", "dst": "bigint", "w": "double",
                "vid": "bigint", "outdeg": "bigint", "wout": "double",
                "inv_outdeg": "double", "source": "bigint", "val": "double",
            }
            sel = [f"'{kind}' as kind"]
            for c in TAG_COLS[1:]:
                if c in cols:
                    assert cols[c] in df.columns, (kind, cols[c])
                    sel.append(f"cast(`{cols[c]}` as {types[c]}) as {c}")
                else:
                    sel.append(f"cast(null as {types[c]}) as {c}")
            return df.selectExpr(*sel)

        # edge deltas: minus' = minus ∪ P ; plus' = (plus \ P) ∪ I.
        # minus' as minus ∪ (P \ minus): set-equal to the dedup'd union
        # (both sides are duplicate-free — minus inductively, P by prep)
        # but the broadcast-anti probe inserts NO exchange, where the
        # dropDuplicates form paid a full-width shuffle + AQE barrier
        # inside every batch's tagged checkpoint job (guide §2.4). The
        # broadcast side is the delta chain, bounded by the compaction
        # row trigger; past a conservative gate the dedup form returns.
        if self._minus is None:
            new_minus = pairs
        elif self._delta_rows <= 2_000_000:
            new_minus = self._minus.unionByName(
                pairs.join(F.broadcast(self._minus), ["src", "dst"], "left_anti")
            )
        else:
            new_minus = self._minus.unionByName(pairs).dropDuplicates(
                ["src", "dst"]
            )
        plus_kept = (
            self._plus.join(F.broadcast(pairs), ["src", "dst"], "left_anti")
            if self._plus is not None
            else None
        )
        new_plus = ins if plus_kept is None else plus_kept.unionByName(ins)

        frames = [
            tag(new_minus, "minus", src="src", dst="dst"),
            tag(
                new_plus, "plus", src="src", dst="dst",
                **({"w": "w"} if self.weighted else {}),
            ),
        ]
        if batch_rows is None:
            # raw batch rows counted inside the same job (braw slice) —
            # replaces a separate batch.count() driver round-trip
            frames.append(
                tag(
                    batch.select(
                        F.col("src").cast("bigint").alias("src"),
                        F.col("dst").cast("bigint").alias("dst"),
                    ),
                    "braw", src="src", dst="dst",
                )
            )

        # vertex universe increment: old ∪ new endpoints (never shrinks —
        # explicit or isolated-by-deletion vertices are preserved). The
        # anti-join form costs one O(V) broadcast-probe scan, no shuffle
        # (exceptAll would shuffle both sides)
        known = self._vertices.join(F.broadcast(endpoints), "vid", "left_semi")
        new_vids = endpoints.join(F.broadcast(known), "vid", "left_anti")
        frames.append(tag(new_vids, "nv", vid="vid"))

        if extra_frames is not None and self._deg is None and mini is None:
            _ = self.out_degrees  # ensure the degree base exists for ctx.deg
        # new out-degrees of touched srcs (only srcs with >=1 out-edge
        # appear) — a local frame on the prepared path, else a pure
        # aggregation of the tiny new_e (no E scan either way)
        if mini is not None:
            recomputed = self._mk_local(
                mini["dego_pd"], "src bigint, outdeg bigint, wout double"
            )
        else:
            recomputed = new_e.groupBy("src").agg(
                F.count("*").alias("outdeg"),
                F.sum(ew).cast("double").alias("wout"),
            )
        if self._deg is not None:
            deg_base, deg_dirty, deg_override = self._deg
            # dirty' = dirty ∪ (touched \ dirty): same broadcast-anti
            # rewrite as minus' above (both sides duplicate-free; no
            # exchange inside the tagged job)
            if deg_dirty is None:
                new_dirty = touched
            elif self._delta_rows <= 2_000_000:
                new_dirty = deg_dirty.unionByName(
                    touched.join(F.broadcast(deg_dirty), "src", "left_anti")
                )
            else:
                new_dirty = deg_dirty.unionByName(touched).dropDuplicates(
                    ["src"]
                )
            frames.append(tag(new_dirty, "dirty", src="src"))
            kept = (
                deg_override.join(F.broadcast(touched), "src", "left_anti")
                if deg_override is not None
                else None
            )
            new_override = (
                recomputed if kept is None else kept.unionByName(recomputed)
            )
            frames.append(
                tag(
                    new_override, "dego",
                    src="src", outdeg="outdeg", wout="wout",
                )
            )
            if self._scat is not None:
                s_base, s_dirty, s_override = self._scat
                if mini is not None:
                    touched_scatter = self._mk_local(
                        mini["scato_pd"],
                        "src bigint, dst bigint, inv_outdeg double",
                    )
                else:
                    touched_scatter = new_e.join(
                        recomputed.select("src", "wout"), "src"
                    ).select(
                        "src", "dst", (ew / F.col("wout")).alias("inv_outdeg")
                    )
                s_kept = (
                    s_override.join(F.broadcast(touched), "src", "left_anti")
                    if s_override is not None
                    else None
                )
                new_s_override = (
                    touched_scatter
                    if s_kept is None
                    else s_kept.unionByName(touched_scatter)
                )
                frames.append(
                    tag(
                        new_s_override, "scato",
                        src="src", dst="dst", inv_outdeg="inv_outdeg",
                    )
                )
        # dangling evidence (only needed when the parent flag is False):
        # touched srcs that lost all out-edges + new endpoints that are
        # not insert srcs
        if self._dangling_known is False:
            if mini is not None:
                lost_all = self._mk_local(mini["lost_pd"], "src bigint")
            else:
                lost_all = touched.join(
                    recomputed.select("src"), "src", "left_anti"
                )
            new_dang = new_vids.join(
                ins.select(F.col("src").alias("vid")).distinct(),
                "vid",
                "left_anti",
            )
            frames.append(tag(lost_all, "dang", src="src"))
            frames.append(tag(new_dang, "dang", vid="vid"))

        extra_names: list[str] = []
        if extra_frames is not None:
            if mini is not None:
                deg_ctx = lambda: self._mk_local(  # noqa: E731
                    mini["deg_ctx_pd"],
                    "src bigint, d_old double, d_new double",
                )
            else:
                deg_ctx = (
                    touched.join(
                        self.out_degrees.select(
                            "src", F.col("wout").alias("d_old")
                        ),
                        "src",
                        "left",
                    )
                    .join(
                        recomputed.select("src", F.col("wout").alias("d_new")),
                        "src",
                        "left",
                    )
                    .select(
                        "src",
                        F.coalesce("d_old", F.lit(0.0)).alias("d_old"),
                        F.coalesce("d_new", F.lit(0.0)).alias("d_new"),
                    )
                )
            ctx = UpdateContext(
                touched=touched, pairs=pairs, ins=ins,
                old_e=old_e, new_e=new_e, deg=deg_ctx,
                old_csr=mini["old_csr"] if mini else None,
                new_csr=mini["new_csr"] if mini else None,
            )
            for name, xdf in extra_frames(ctx).items():
                extra_names.append(name)
                frames.append(
                    tag(xdf, "x_" + name, **{c: c for c in xdf.columns})
                )

        tagged = frames[0]
        for f in frames[1:]:
            tagged = tagged.unionByName(f)
        # repartition to a small constant width BEFORE checkpointing: the
        # kept-slice branches preserve their parent RDD's partitioning, so
        # without this the checkpointed RDD's partition count compounds
        # ~3x per batch (every later slice scan pays the task count)
        tagged = tagged.repartition(4)
        # internal counts (+ caller metrics) are OBSERVED during the same
        # eager checkpoint job — no separate count job per batch
        kcount = lambda k: F.expr(  # noqa: E731
            f"sum(case when kind = '{k}' then 1 else 0 end)"
        )
        obs_exprs = {"__nv": kcount("nv"), "__dang": kcount("dang"),
                     "__braw": kcount("braw")}
        obs_exprs.update(extra_observe or {})
        child.extra_metrics = {}
        if self._persist:
            from pyspark.sql import Observation

            obs = Observation()
            tagged = child._ckpt(
                tagged.observe(obs, *[c.alias(k) for k, c in obs_exprs.items()])
            )
            got = obs.get
            kind_counts = {
                "nv": int(got["__nv"] or 0),
                "dang": int(got["__dang"] or 0),
                "braw": int(got["__braw"] or 0),
            }
            if extra_observe:
                child.extra_metrics = {
                    k: got[k] for k in extra_observe
                }
        else:
            # no eager action without persist: fall back to a count job
            # (extra_observe unsupported here — engines always persist)
            assert extra_observe is None, "extra_observe requires persist=True"
            tagged = child._ckpt(tagged)
            kind_counts = {
                r["kind"]: r["count"]
                for r in tagged.groupBy("kind").count().collect()
            }
        if _prof:
            print(f"[graph-prof] tagged: {_time.time() - _pt:.2f}s", flush=True)
        # old_e's leaf is fully consumed by the tagged checkpoint
        unpersist_rdd_ids(sc, olde_ids)
        if batch_rows is None:
            batch_rows = int(kind_counts.get("braw", 0))
        child._delta_rows = self._delta_rows + int(batch_rows)
        child.last_batch_rows = int(batch_rows)
        for name in extra_names:
            child.extra_slices[name] = tagged.filter(
                F.col("kind") == "x_" + name
            )

        child._minus = tagged.filter(F.col("kind") == "minus").select("src", "dst")
        child._plus = tagged.filter(F.col("kind") == "plus").select(
            "src", "dst", *(["w"] if self.weighted else [])
        )
        n_new = int(kind_counts.get("nv", 0))
        if n_new:
            nv_slice = tagged.filter(F.col("kind") == "nv").select("vid")
            child._vertices = self._vertices.unionByName(nv_slice)
            # the nv rows live in this tagged checkpoint's blocks, which the
            # child's vertex chain now references — promote them to chain
            # ownership so release(keep=successor) preserves them
            child._chain_rdds |= child._own_rdds
            child._own_rdds = set()
        else:
            child._vertices = self._vertices
        if self._num_vertices is not None:
            child._num_vertices = self._num_vertices + n_new
        if self._deg is not None:
            dirty_slice = tagged.filter(F.col("kind") == "dirty").select("src")
            child._deg = (
                self._deg[0],
                dirty_slice,
                tagged.filter(F.col("kind") == "dego").select(
                    "src", "outdeg", "wout"
                ),
            )
            if self._scat is not None:
                child._scat = (
                    self._scat[0],
                    dirty_slice,
                    tagged.filter(F.col("kind") == "scato").select(
                        "src", "dst", "inv_outdeg"
                    ),
                )

        # dangling flag maintenance (True is sticky-conservative — safe)
        if self._dangling_known is True:
            child._dangling_known = True
        elif self._dangling_known is False:
            child._dangling_known = kind_counts.get("dang", 0) > 0

        # --- CSR blocks: rebuild only touched hash partitions
        if self._csr is not None:
            touched_parts = pairs.select(
                F.pmod(F.col("src"), F.lit(p)).cast("int").alias("part")
            ).distinct()
            untouched = self._csr.join(
                F.broadcast(touched_parts), "part", "left_anti"
            )
            rebuilt = (
                child.edges.withColumn(
                    "part", F.pmod(F.col("src"), F.lit(p)).cast("int")
                )
                .join(F.broadcast(touched_parts), "part", "left_semi")
                .groupBy("part")
                .applyInPandas(_build_csr_block, schema=CSR_SCHEMA)
            )
            patched = untouched.unionByName(rebuilt)
            if child._persist:
                patched = patched.persist(StorageLevel.MEMORY_AND_DISK)
                child._owned_caches.append(patched)
            child._csr = patched

        if (
            child._delta_rows >= child.compact_threshold_rows
            or len(child._chain_rdds) >= child.compact_max_chain_blocks
        ):
            compacted = child.compact()
            if compacted is not child:
                # the caller may still need the extra slices / batch count;
                # transfer them (and ownership of the blocks backing them)
                # to the compacted graph before freeing the child
                compacted.extra_slices = child.extra_slices
                compacted.extra_metrics = child.extra_metrics
                compacted.last_batch_rows = child.last_batch_rows
                compacted._own_rdds |= child._own_rdds | child._chain_rdds
                child._own_rdds = set()
                child._chain_rdds = set()
                child.release(keep=compacted)
            return compacted
        return child

    def _mk_local(self, pdf2: "pd.DataFrame", schema: str) -> DataFrame:
        """Small pandas frame -> one-partition local DataFrame (see
        module-level ``make_local_frame`` for the empty-frame and
        partition-width rationale)."""
        return make_local_frame(self.spark, pdf2, schema)

    def _mini_update_csrs(self, prepared: "PreparedBatch", prep: dict) -> dict:
        """Driver-side derivation of everything that depends only on the
        touched srcs' edges, via the SAME tested numpy machinery as the
        bcsr path (build_local_csr / apply_batch_local): new out-edge rows,
        degree + scatter overrides, (d_old, d_new), dangling evidence, and
        the old/new mini CSRs themselves (for the engine's adjustment)."""
        from dynamicppr_spark.operators.local_push import (
            _flat_slices,
            apply_batch_local,
            build_local_csr,
        )

        bp = prepared.batch
        old_pd = prepared.old_e
        w_old = old_pd["w"].to_numpy(dtype=float) if self.weighted else None
        old_csr = build_local_csr(
            old_pd["src"].to_numpy(dtype="int64"),
            old_pd["dst"].to_numpy(dtype="int64"),
            w_old,
        )
        new_csr = apply_batch_local(
            old_csr,
            bp["op"].astype(str).tolist(),
            bp["src"].to_numpy(dtype="int64"),
            bp["dst"].to_numpy(dtype="int64"),
            bp["w"].to_numpy(dtype=float) if self.weighted else None,
        )
        touched_ids = np.unique(
            prep["touched_pd"]["src"].to_numpy(dtype="int64")
        )
        tp = new_csr.pos_of(touched_ids)
        # tp < 0 only for srcs whose batch rows were all self-loops and
        # that had no prior edges — genuinely degree-0
        tpc = np.maximum(tp, 0)
        outdeg_all = np.diff(new_csr.indptr)
        outdeg = np.where(tp >= 0, outdeg_all[tpc], 0)
        wout = np.where(tp >= 0, new_csr.wout[tpc], 0.0)
        has = outdeg > 0
        dego_pd = pd.DataFrame(
            {"src": touched_ids[has], "outdeg": outdeg[has], "wout": wout[has]}
        )
        u_rep, flat = _flat_slices(new_csr.indptr, tp[has])
        srcs = new_csr.vids[u_rep]
        dsts = new_csr.vids[new_csr.dst_pos[flat]]
        wnew = (
            new_csr.w[flat] if new_csr.w is not None else np.ones(len(flat))
        )
        inv = wnew / new_csr.wout[u_rep]
        new_e_pd = pd.DataFrame(
            {"src": srcs, "dst": dsts,
             **({"w": wnew} if self.weighted else {})}
        )
        scato_pd = pd.DataFrame({"src": srcs, "dst": dsts, "inv_outdeg": inv})
        d_old = (
            pd.Series(
                prepared.deg_old["d_old"].to_numpy(dtype=float),
                index=prepared.deg_old["src"].to_numpy(dtype="int64"),
            )
            .reindex(touched_ids)
            .fillna(0.0)
            .to_numpy()
        )
        deg_ctx_pd = pd.DataFrame(
            {"src": touched_ids, "d_old": d_old, "d_new": wout}
        )
        lost_pd = pd.DataFrame({"src": touched_ids[~has]})
        return {
            "old_csr": old_csr,
            "new_csr": new_csr,
            "new_e_pd": new_e_pd,
            "dego_pd": dego_pd,
            "scato_pd": scato_pd,
            "deg_ctx_pd": deg_ctx_pd,
            "lost_pd": lost_pd,
        }

    def _prep_batch_driver(self, batch: DataFrame):
        """Driver-side batch prep (gated by ``driver_batch_max_rows``):
        returns 1-partition (pairs, ins, touched, endpoints, n_raw_rows)
        or None when the batch exceeds the gate (distributed prep then
        applies). O(batch) work and transfer only — exactly the regime the
        reference handles on its single node; the distributed fallback
        keeps the path correct for arbitrarily large batches."""
        cap = self.driver_batch_max_rows
        cols = ["op", "src", "dst"] + (["w"] if self.weighted else [])
        pdf = batch.select(*cols).limit(cap + 1).toPandas()
        if len(pdf) > cap:
            return None
        return self._prep_pdf(pdf)

    def _prep_pdf(self, pdf: "pd.DataFrame"):
        """Pandas half of the driver batch prep (shared with the
        PreparedBatch path, which already holds the collected rows)."""
        n_raw = len(pdf)
        src = pdf["src"].astype("int64")
        dst = pdf["dst"].astype("int64")
        pairs_pd = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
        insm = (pdf["op"] == "+") & (src != dst)
        if self.weighted:
            w = pd.to_numeric(pdf["w"]).fillna(1.0).astype(float)
            # duplicate '+' rule: keep the MAX weight (see distributed prep)
            ins_pd = (
                pd.DataFrame({"src": src[insm], "dst": dst[insm], "w": w[insm]})
                .groupby(["src", "dst"], as_index=False)["w"]
                .max()
            )
            ins_schema = "src bigint, dst bigint, w double"
        else:
            ins_pd = pd.DataFrame(
                {"src": src[insm], "dst": dst[insm]}
            ).drop_duplicates()
            ins_schema = "src bigint, dst bigint"
        touched_pd = pairs_pd[["src"]].drop_duplicates()
        endpoints_pd = pd.DataFrame(
            {"vid": pd.concat([pairs_pd["src"], pairs_pd["dst"]]).unique()}
        )

        def mk(p2, schema):
            return make_local_frame(self.spark, p2, schema)

        return {
            "pairs": mk(pairs_pd, "src bigint, dst bigint"),
            "ins": mk(ins_pd, ins_schema),
            "touched": mk(touched_pd, "src bigint"),
            "endpoints": mk(endpoints_pd, "vid bigint"),
            "n_raw": n_raw,
            "ins_pd": ins_pd,
            "touched_pd": touched_pd,
        }

    def compact(self) -> "LinkGraph":
        """Fold the delta overlay back into a fresh persisted base (one full
        shuffle). Returns self when there is nothing to fold.

        The folded edge/vertex tables are eagerly localCheckpoint'ed
        SELF-CONTAINED leaves (origin-detached), not just persisted
        caches. A cache is not enough: the caller frees the old
        delta-chain blocks right after compaction, and one batch later
        the successor graph unpersists the compacted caches themselves
        (release() keeps caches by object identity, and the successor's
        vertex union is a NEW object) — any recompute would then replay a
        plan over the freed chain and die with
        CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (caught by the 30-batch dedup
        stream soak, where every batch adds vertices). The leaf blocks
        are tracked as CHAIN blocks so successors inherit and preserve
        them until a terminal release."""
        if self._minus is None and self._plus is None:
            return self
        if not self._persist:
            # no block tracking in persist=False mode (nothing to free);
            # plain re-fold, plans stay lazy
            g = LinkGraph(
                self.edges,
                vertices=self._vertices,
                num_partitions=self.num_partitions,
                persist=False,
                weighted=self.weighted,
            )
        else:
            from dynamicppr_spark.rddtrack import detach_plan_origin

            with track_new_rdds(self.spark.sparkContext) as created:
                edges_ck = detach_plan_origin(
                    self.edges.repartition(self.num_partitions, "src")
                    .localCheckpoint(eager=True)
                )
                verts_ck = detach_plan_origin(
                    self._vertices.localCheckpoint(eager=True)
                )
            g = LinkGraph(
                edges_ck,
                vertices=verts_ck,
                num_partitions=self.num_partitions,
                persist=True,
                weighted=self.weighted,
                assume_normalized=True,
            )
            g._chain_rdds |= created.ids
        g._num_edges = g._base_edges.count()
        g._num_vertices = g._vertices.count()
        g._dangling_known = self._dangling_known
        g.compact_threshold_rows = self.compact_threshold_rows
        g.compact_max_chain_blocks = self.compact_max_chain_blocks
        return g

    # ------------------------------------------------------------- cleanup
    def _referenced_caches(self) -> list[DataFrame]:
        out = [self._base_edges, self._vertices]
        for t in (self._deg, self._scat):
            if t is not None:
                out.append(t[0])
        if self._csr is not None:
            out.append(self._csr)
        return out

    def release(self, keep: "LinkGraph | None" = None) -> None:
        """Unpersist this graph's owned caches and free its tracked
        localCheckpoint blocks, except anything still referenced by
        ``keep`` (typically the successor graph after ``with_updates``)."""
        keep_caches = (
            {id(df) for df in keep._referenced_caches()} if keep is not None else set()
        )
        for df in self._owned_caches:
            if id(df) not in keep_caches:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001
                    pass
        self._owned_caches = []
        keep_chain = keep._chain_rdds if keep is not None else set()
        unpersist_rdd_ids(
            self.spark.sparkContext,
            self._own_rdds | (self._chain_rdds - keep_chain),
        )
        self._own_rdds = set()
        self._chain_rdds = set()
        if self._sym is not None:
            self._sym.release(keep=keep._sym if keep is not None else None)
            self._sym = None

    def unpersist(self) -> None:
        """Back-compat alias: release everything owned by this graph."""
        self.release(None)
