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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.rddtrack import track_new_rdds, unpersist_rdd_ids

CSR_SCHEMA = (
    "part int, vmin bigint, vmax bigint, "
    "srcs array<bigint>, indptr array<bigint>, dsts array<bigint>"
)


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
            if self.weighted:
                e = (
                    e.groupBy("src", "dst")
                    .agg(F.sum("w").alias("w"))
                    .filter(F.col("w") != 0.0)
                )
            else:
                e = e.dropDuplicates(["src", "dst"])
            base = e.repartition(self.num_partitions, "src")
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
        v = v.repartition(self.num_partitions, "vid")
        if persist:
            v = v.persist(StorageLevel.MEMORY_AND_DISK)
            self._owned_caches.append(v)
        self._vertices = v

        self._num_vertices: int | None = None
        self._num_edges: int | None = None
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
        so release() can free them. No-op when persist=False."""
        if not self._persist:
            return df
        with track_new_rdds(self.spark.sparkContext) as created:
            out = df.localCheckpoint(eager=True)
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
                .repartition(self.num_partitions, "src")
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
            s = (
                self.edges.join(self.out_degrees, "src")
                .select(
                    "src",
                    "dst",
                    (self._edge_w(self.edges) / F.col("wout")).alias("inv_outdeg"),
                )
                .repartition(self.num_partitions, "src")
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
        self, batch: DataFrame, batch_rows: int | None = None
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
        """
        p = self.num_partitions
        wsel = [F.coalesce(F.col("w"), F.lit(1.0)).cast("double").alias("w")] if (
            self.weighted
        ) else []
        if self.weighted and "w" not in batch.columns:
            batch = batch.withColumn("w", F.lit(1.0))
        ins = (
            batch.filter(F.col("op") == "+")
            .select(
                F.col("src").cast("bigint").alias("src"),
                F.col("dst").cast("bigint").alias("dst"),
                *wsel,
            )
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        pairs = batch.select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
        ).dropDuplicates(["src", "dst"])

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
        child.compact_threshold_rows = self.compact_threshold_rows
        if batch_rows is None:
            batch_rows = batch.count()
        child._delta_rows = self._delta_rows + int(batch_rows)

        # ---- build EVERY per-batch delta lazily, evaluate them all in ONE
        # tagged-union eager checkpoint job (each delta as its own branch),
        # then slice by kind. Separate eager checkpoints per delta were
        # ~6 driver-synchronized jobs per batch — the dominant per-batch
        # cost once the O(E) copies were gone.
        TAG_COLS = [
            "kind", "src", "dst", "w", "vid", "outdeg", "wout", "inv_outdeg"
        ]

        def tag(df: DataFrame, kind: str, **cols) -> DataFrame:
            types = {
                "src": "bigint", "dst": "bigint", "w": "double",
                "vid": "bigint", "outdeg": "bigint", "wout": "double",
                "inv_outdeg": "double",
            }
            sel = [F.lit(kind).alias("kind")]
            for c in TAG_COLS[1:]:
                sel.append(
                    cols[c].cast(types[c]).alias(c)
                    if c in cols
                    else F.lit(None).cast(types[c]).alias(c)
                )
            return df.select(*sel)

        # edge deltas: minus' = minus ∪ P ; plus' = (plus \ P) ∪ I
        new_minus = (
            self._minus.unionByName(pairs).dropDuplicates(["src", "dst"])
            if self._minus is not None
            else pairs
        )
        plus_kept = (
            self._plus.join(F.broadcast(pairs), ["src", "dst"], "left_anti")
            if self._plus is not None
            else None
        )
        new_plus = ins if plus_kept is None else plus_kept.unionByName(ins)
        # composed child edge set, expressed from the LAZY deltas (the
        # checkpointed slices are assigned to the child afterwards)
        child_edges = self._base_edges.join(
            F.broadcast(new_minus), ["src", "dst"], "left_anti"
        ).unionByName(new_plus)
        ew = F.col("w") if self.weighted else F.lit(1.0)

        frames = [
            tag(new_minus, "minus", src=F.col("src"), dst=F.col("dst")),
            tag(
                new_plus, "plus", src=F.col("src"), dst=F.col("dst"),
                **({"w": F.col("w")} if self.weighted else {}),
            ),
        ]

        # vertex universe increment: old ∪ new endpoints (never shrinks —
        # explicit or isolated-by-deletion vertices are preserved)
        endpoints = (
            pairs.select(F.col("src").alias("vid"))
            .unionByName(pairs.select(F.col("dst").alias("vid")))
            .distinct()
        )
        known = self._vertices.join(F.broadcast(endpoints), "vid", "left_semi")
        new_vids = endpoints.exceptAll(known)
        frames.append(tag(new_vids, "nv", vid=F.col("vid")))

        touched = pairs.select("src").distinct()
        recomputed = None
        if self._deg is not None:
            deg_base, deg_dirty, deg_override = self._deg
            new_dirty = (
                deg_dirty.unionByName(touched).dropDuplicates(["src"])
                if deg_dirty is not None
                else touched
            )
            frames.append(tag(new_dirty, "dirty", src=F.col("src")))
            recomputed = (
                child_edges.join(F.broadcast(touched), "src", "left_semi")
                .groupBy("src")
                .agg(
                    F.count("*").alias("outdeg"),
                    F.sum(ew).cast("double").alias("wout"),
                )
            )
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
                    src=F.col("src"), outdeg=F.col("outdeg"), wout=F.col("wout"),
                )
            )
            if self._scat is not None:
                s_base, s_dirty, s_override = self._scat
                touched_scatter = (
                    child_edges.join(F.broadcast(touched), "src", "left_semi")
                    .join(recomputed, "src")
                    .select(
                        "src", "dst", (ew / F.col("wout")).alias("inv_outdeg")
                    )
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
                        src=F.col("src"), dst=F.col("dst"),
                        inv_outdeg=F.col("inv_outdeg"),
                    )
                )
            # dangling evidence (only needed when the parent flag is False):
            # touched srcs that lost all out-edges + new endpoints that are
            # not insert srcs
            if self._dangling_known is False:
                lost_all = touched.join(
                    recomputed.select("src"), "src", "left_anti"
                )
                new_dang = new_vids.join(
                    ins.select(F.col("src").alias("vid")).distinct(),
                    "vid",
                    "left_anti",
                )
                frames.append(tag(lost_all, "dang", src=F.col("src")))
                frames.append(tag(new_dang, "dang", vid=F.col("vid")))

        tagged = frames[0]
        for f in frames[1:]:
            tagged = tagged.unionByName(f)
        # repartition to a small constant width BEFORE checkpointing: the
        # kept-slice branches preserve their parent RDD's partitioning, so
        # without this the checkpointed RDD's partition count compounds
        # ~3x per batch (every later slice scan pays the task count)
        tagged = child._ckpt(tagged.repartition(4))
        # ONE eager job evaluated every delta
        kind_counts = {
            r["kind"]: r["count"]
            for r in tagged.groupBy("kind").count().collect()
        }

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
        elif self._dangling_known is False and recomputed is not None:
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

        if child._delta_rows >= child.compact_threshold_rows:
            compacted = child.compact()
            if compacted is not child:
                child.release(keep=compacted)
            return compacted
        return child

    def compact(self) -> "LinkGraph":
        """Fold the delta overlay back into a fresh persisted base (one full
        shuffle). Returns self when there is nothing to fold."""
        if self._minus is None and self._plus is None:
            return self
        g = LinkGraph(
            self.edges,
            vertices=self._vertices,
            num_partitions=self.num_partitions,
            persist=self._persist,
            weighted=self.weighted,
        )
        g._num_edges = g._base_edges.count()  # materialize before release
        g._num_vertices = self._num_vertices
        g._dangling_known = self._dangling_known
        g.compact_threshold_rows = self.compact_threshold_rows
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
