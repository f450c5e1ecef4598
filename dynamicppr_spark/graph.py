"""LinkGraph — the engine's core graph abstraction over a Spark edge table.

The reference (guowentian/dynamicppr; checkout absent, SURVEY.md §0) keeps a
directed graph as an in-memory CSR over dense int vertex ids. Spark-native
mapping (SURVEY.md §1.2):

  - edge table  ``edges(src:bigint, dst:bigint)`` hash-partitioned on src
    (BASELINE.json north_star: "explicit hash-partitioning on src"),
  - degree table ``out_degrees(src, outdeg)``  (SURVEY.md §2 E7),
  - per-partition CSR blocks
    ``csr_blocks(part, srcs:array, indptr:array, dsts:array)`` built with a
    grouped-map pandas UDF (SURVEY.md §2 E8) and iterated by the pandas/Arrow
    gather-scatter fast path in operators/.

Scale notes (100 TB / 1e9-edge design intent):
  - Everything is a DataFrame; no driver-side materialization of vertices or
    edges, only scalar aggregates cross to the driver.
  - ``num_partitions`` controls both the shuffle width and the CSR block
    count; at cluster scale set it to a small multiple of executor cores.
  - The scatter table (src, dst, inv_outdeg) is persisted pre-partitioned on
    src so the per-superstep frontier join never re-shuffles the (huge) edge
    side — only the (small) frontier and the contribution reduce shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

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
    edges : DataFrame with columns (src: bigint, dst: bigint). Extra columns
        are dropped. Duplicate edges and self-loops are removed (the
        reference models a simple directed graph).
    vertices : optional DataFrame (vid: bigint) defining the vertex universe
        (to include isolated vertices); defaults to endpoints of ``edges``.
    num_partitions : hash-partition width for edges/state; defaults to the
        session's shuffle partition count.
    """

    def __init__(
        self,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        num_partitions: int | None = None,
        persist: bool = True,
        assume_normalized: bool = False,
    ) -> None:
        """``assume_normalized=True`` skips the dedup/self-loop/repartition
        pass — for internal callers (with_updates) that guarantee the edge
        set is already a clean simple digraph; avoids re-shuffling the full
        edge table on every small update batch."""
        spark = edges.sparkSession
        self.spark = spark
        self.num_partitions = int(
            num_partitions
            or spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        if assume_normalized:
            e = edges
        else:
            e = (
                edges.select(
                    F.col("src").cast("bigint").alias("src"),
                    F.col("dst").cast("bigint").alias("dst"),
                )
                .filter(F.col("src") != F.col("dst"))
                .dropDuplicates(["src", "dst"])
                .repartition(self.num_partitions, "src")
            )
        self.edges = e
        if persist and not assume_normalized:
            self.edges = e.persist(StorageLevel.MEMORY_AND_DISK)
        if vertices is not None:
            v = vertices.select(F.col("vid").cast("bigint").alias("vid"))
        else:
            v = (
                self.edges.select(F.col("src").alias("vid"))
                .unionByName(self.edges.select(F.col("dst").alias("vid")))
                .distinct()
            )
        self.vertices = v.repartition(self.num_partitions, "vid")
        if persist:
            self.vertices = self.vertices.persist(StorageLevel.MEMORY_AND_DISK)
        self._persist = persist
        self._num_vertices: int | None = None
        self._out_degrees: DataFrame | None = None
        self._scatter: DataFrame | None = None
        self._csr: DataFrame | None = None
        self._sym: "LinkGraph | None" = None

    # ---------------------------------------------------------------- stats
    @property
    def num_vertices(self) -> int:
        if self._num_vertices is None:
            self._num_vertices = self.vertices.count()
        return self._num_vertices

    @property
    def out_degrees(self) -> DataFrame:
        """(src, outdeg) — SURVEY.md §2 E7; push denominator."""
        if self._out_degrees is None:
            d = self.edges.groupBy("src").agg(F.count("*").alias("outdeg"))
            d = d.repartition(self.num_partitions, "src")
            self._out_degrees = (
                d.persist(StorageLevel.MEMORY_AND_DISK) if self._persist else d
            )
        return self._out_degrees

    @property
    def scatter_edges(self) -> DataFrame:
        """(src, dst, inv_outdeg) pre-partitioned on src and persisted.

        This is the hot-loop edge side for the DataFrame scatter path of
        PageRank/PPR: persisting it partitioned on src means the
        per-superstep join against the (vid-partitioned) state inserts no
        exchange on the edge side — only the small frontier and the
        groupBy(dst) reduction shuffle.
        """
        if self._scatter is None:
            s = (
                self.edges.join(self.out_degrees, "src")
                .select(
                    "src",
                    "dst",
                    (F.lit(1.0) / F.col("outdeg").cast("double")).alias(
                        "inv_outdeg"
                    ),
                )
                .repartition(self.num_partitions, "src")
            )
            self._scatter = (
                s.persist(StorageLevel.MEMORY_AND_DISK) if self._persist else s
            )
        return self._scatter

    # ------------------------------------------------------------ CSR blocks
    def csr_blocks(self) -> DataFrame:
        """Per-partition CSR blocks (SURVEY.md §2 E8; BASELINE.json
        north_star "per-partition CSR blocks in DataFrames").

        One row per hash-partition ``part = pmod(src, P)``:
        (part, vmin, vmax, srcs, indptr, dsts). Iterated via numpy
        gather-scatter inside ``applyInPandas`` by the kernel fast path.
        """
        if self._csr is None:
            withpart = self.edges.withColumn(
                "part", F.pmod(F.col("src"), F.lit(self.num_partitions)).cast("int")
            )
            blocks = withpart.groupBy("part").applyInPandas(
                _build_csr_block, schema=CSR_SCHEMA
            )
            self._csr = (
                blocks.persist(StorageLevel.MEMORY_AND_DISK)
                if self._persist
                else blocks
            )
        return self._csr

    # ------------------------------------------------------------- variants
    def symmetrized(self) -> "LinkGraph":
        """Undirected view: edges ∪ reversed edges (for CC/LPA/triangles)."""
        if self._sym is None:
            rev = self.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
            self._sym = LinkGraph(
                self.edges.unionByName(rev),
                vertices=self.vertices,
                num_partitions=self.num_partitions,
                persist=self._persist,
            )
        return self._sym

    # -------------------------------------------------------- dynamic (E9)
    def with_updates(self, batch: DataFrame) -> "LinkGraph":
        """Apply one batch of edge updates, returning a new LinkGraph.

        ``batch`` columns: (op: '+'/'-', src, dst). New edge set =
        (old \\ deletes) ∪ inserts (SURVEY.md §2 E9).

        FULLY INCREMENTAL — no full-edge-table shuffle per batch:
          - edges: ONE broadcast anti-join of the old edges against the
            (tiny) batch pair set, then union of the cleaned inserts;
            the result is already a clean simple digraph
            (assume_normalized), eagerly localCheckpoint'ed to truncate
            the per-batch lineage chain.
          - out_degrees / scatter table: rows for untouched src reused via
            broadcast anti-join; only touched-src rows recomputed (a
            filter + small groupBy, no shuffle of the untouched mass).
          - CSR blocks: only hash partitions containing a touched src are
            rebuilt (broadcast semi-join on part).
        """
        p = self.num_partitions
        ins = (
            batch.filter(F.col("op") == "+")
            .select(
                F.col("src").cast("bigint").alias("src"),
                F.col("dst").cast("bigint").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        batch_pairs = batch.select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
        ).dropDuplicates(["src", "dst"])
        # (old \ (dels ∪ ins)) ∪ ins  ==  (old \ dels) ∪ ins
        new_edges = self.edges.join(
            F.broadcast(batch_pairs), ["src", "dst"], "left_anti"
        ).unionByName(ins)
        if self._persist:
            new_edges = new_edges.localCheckpoint(eager=True)
        new_graph = LinkGraph(
            new_edges,
            num_partitions=p,
            persist=self._persist,
            assume_normalized=True,
        )
        touched = batch.select(F.col("src").cast("bigint").alias("src")).distinct()
        if self._out_degrees is not None:
            recomputed = (
                new_graph.edges.join(F.broadcast(touched), "src", "left_semi")
                .groupBy("src")
                .agg(F.count("*").alias("outdeg"))
            )
            patched_deg = self._out_degrees.join(
                F.broadcast(touched), "src", "left_anti"
            ).unionByName(recomputed)
            if self._persist:
                patched_deg = patched_deg.localCheckpoint(eager=True)
            new_graph._out_degrees = patched_deg
            if self._scatter is not None:
                touched_scatter = (
                    new_graph.edges.join(F.broadcast(touched), "src", "left_semi")
                    .join(recomputed, "src")
                    .select(
                        "src",
                        "dst",
                        (F.lit(1.0) / F.col("outdeg").cast("double")).alias(
                            "inv_outdeg"
                        ),
                    )
                )
                patched_scatter = self._scatter.join(
                    F.broadcast(touched), "src", "left_anti"
                ).unionByName(touched_scatter)
                if self._persist:
                    patched_scatter = patched_scatter.localCheckpoint(eager=True)
                new_graph._scatter = patched_scatter
        if self._csr is not None:
            p = self.num_partitions
            touched_parts = (
                batch.select(
                    F.pmod(F.col("src"), F.lit(p)).cast("int").alias("part")
                )
                .distinct()
            )
            untouched = self._csr.join(
                F.broadcast(touched_parts), "part", "left_anti"
            )
            rebuilt = (
                new_graph.edges.withColumn(
                    "part", F.pmod(F.col("src"), F.lit(p)).cast("int")
                )
                .join(F.broadcast(touched_parts), "part", "left_semi")
                .groupBy("part")
                .applyInPandas(_build_csr_block, schema=CSR_SCHEMA)
            )
            patched = untouched.unionByName(rebuilt)
            new_graph._csr = (
                patched.persist(StorageLevel.MEMORY_AND_DISK)
                if self._persist
                else patched
            )
        return new_graph

    def unpersist(self) -> None:
        for df in (
            self.edges,
            self.vertices,
            self._out_degrees,
            self._scatter,
            self._csr,
        ):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
