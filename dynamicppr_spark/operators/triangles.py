"""Triangle counting (SURVEY.md §2 K6) — exact, via oriented 3-way join.

Undirected semantics: the digraph's edges are canonicalized to
a<b pairs; a triangle is {a<b<c} with all three undirected edges present.
Pinned by tests/oracle.py::triangle_count and DuckDB-oracle-checkable
(__spark_entry__.py oracle round).

Scale design: orienting edges low-id -> high-id makes each triangle counted
exactly once and bounds the join fan-out by the oriented out-degree
(classic node-iterator++). All three join keys are equi-joins on bigint
pairs — sort-merge/shuffled-hash under AQE; no UDFs, whole-stage codegen
end to end. For skewed graphs, orienting by (degree, id) instead of raw id
caps the hub's oriented out-degree at O(sqrt(m)); enabled via
``orient_by_degree=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from dynamicppr_spark.graph import LinkGraph


def _oriented(graph: LinkGraph, orient_by_degree: bool) -> DataFrame:
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    if not orient_by_degree:
        return und
    # re-orient by (undirected degree, id): lower-degree endpoint first
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    ranked = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def triangle_count(
    graph: LinkGraph, orient_by_degree: bool = True
) -> DataFrame:
    """Single-row DataFrame (n: bigint) — global triangle count.

    ``orient_by_degree`` defaults ON: ordering each undirected edge
    low-degree endpoint first caps every vertex's oriented out-degree at
    O(sqrt(m)), which is what keeps hub join fan-out bounded at scale
    (node-iterator++). The count is identical either way."""
    e = _oriented(graph, orient_by_degree).persist(StorageLevel.MEMORY_AND_DISK)
    # the result is lazy, so the cache must outlive this call — register
    # it with the graph (graph.release() frees it) instead of leaking
    graph._owned_caches.append(e)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(e3, ["x", "z"])
    out = tri.agg(F.count("*").cast("bigint").alias("n"))
    return out


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: distinct (a<b) pairs."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def _canon_cached(graph: LinkGraph) -> DataFrame:
    """Per-graph persisted canonical edge set, registered in the graph's
    owned caches so ``graph.release()`` frees it. In a maintained update
    stream each graph's set is probed twice per batch (as new, then as
    old of the next batch) — caching avoids re-running the O(E) distinct."""
    c = getattr(graph, "_canon_edges", None)
    if c is None:
        c = _canon(graph.edges).persist(StorageLevel.MEMORY_AND_DISK)
        graph._canon_edges = c
        graph._owned_caches.append(c)
    return c


def _canon_incremental(
    old_graph: LinkGraph, new_graph: LinkGraph, bp: DataFrame
) -> DataFrame:
    """Canonical edge set of ``new_graph``, patched from the old graph's
    cached canon instead of a fresh O(E) ``distinct`` SHUFFLE per batch
    (guide §2.4): canon(new) = (canon(old) \\ bp) ∪ present_new(bp), where
    ``bp`` is the batch's canonical pair set and ``present_new`` probes
    the new edge set for both orientations of the touched pairs — one
    shuffle-free O(E) scan. Eagerly localCheckpointed (origin-detached,
    tracked on the new graph) so the result is self-contained: the old
    graph — and its canon cache — can be released afterwards without
    leaving this table a dangling lineage over freed blocks."""
    c = getattr(new_graph, "_canon_edges", None)
    if c is not None:
        return c
    old_c = getattr(old_graph, "_canon_edges", None)
    if old_c is None or not new_graph._persist:
        return _canon_cached(new_graph)
    dirp = bp.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        bp.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    present = (
        new_graph.edges.join(F.broadcast(dirp), ["src", "dst"], "left_semi")
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    patched = (
        old_c.join(F.broadcast(bp), ["a", "b"], "left_anti")
        .unionByName(present)
        .coalesce(new_graph.num_partitions)
    )
    c = new_graph._ckpt(patched)
    new_graph._canon_edges = c
    return c


def _wedge_expand(delta: DataFrame, edges: DataFrame):
    """(adjacency, persisted wedge) for ``_triangles_touching`` — split out
    so ``triangle_delta`` can materialize the gained- and lost-side wedges
    in ONE union count job instead of two driver-synchronized counts."""
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    d = delta.select(F.col("a").alias("da"), F.col("b").alias("db"))
    wedge = (
        adj.join(F.broadcast(d), F.col("v") == F.col("da"))
        .filter(F.col("w") != F.col("db"))
        # rename before re-joining adj: wedge derives from adj and a raw
        # self-join on shared names is ambiguous
        .select(
            F.col("da").alias("wa"),
            F.col("db").alias("wb"),
            F.col("w").alias("wc"),
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return adj, wedge


def _close_wedges(
    adj: DataFrame,
    wedge: DataFrame,
    n_wedge: int,
    wedge_broadcast_max_rows: int,
) -> DataFrame:
    """Closing-edge probe + canonical-triple distinct over a materialized
    wedge table (second half of ``_triangles_touching``)."""
    probe = (
        F.broadcast(wedge) if n_wedge <= wedge_broadcast_max_rows else wedge
    )
    closed = adj.join(
        probe,
        (F.col("v") == F.col("wb")) & (F.col("w") == F.col("wc")),
    ).select("wa", "wb", "wc")
    tri = closed.select(
        F.array_sort(F.array("wa", "wb", "wc")).alias("t")
    ).select(
        F.col("t")[0].alias("x"), F.col("t")[1].alias("y"), F.col("t")[2].alias("z")
    )
    return tri.distinct()


def _triangles_touching(
    delta: DataFrame,
    edges: DataFrame,
    keep: list | None = None,
    wedge_broadcast_max_rows: int = 5_000_000,
) -> DataFrame:
    """Distinct triangles (x<y<z) of canonical edge set ``edges`` that
    contain at least one ``delta`` edge (``delta`` ⊆ ``edges``, both
    canonical a<b pairs; ``delta`` is batch-sized and broadcast).

    Two O(E) probe scans: (1) expand each delta edge (a,b) by a's
    neighbors w, (2) keep wedges whose closing edge (b,w) exists. Sorting
    each survivor to a triple and taking DISTINCT counts every touched
    triangle exactly once — no inclusion-exclusion bookkeeping for
    triangles with 2 or 3 delta edges, and the distinct runs over only
    O(|delta| * deg) rows.

    The wedge set is O(|delta| * deg), which a hub delete makes huge —
    so it is materialized and COUNTED before the closing probe, and only
    broadcast under ``wedge_broadcast_max_rows`` (shuffled equi-join
    beyond: same O(E) probe without shipping an unbounded table to every
    executor — the guard discipline of components.py round-4). The
    persisted wedge is appended to ``keep`` for the caller to unpersist
    after materializing the result; with ``keep=None`` the result is
    eagerly checkpointed here and the wedge freed before returning, so
    every persisted wedge always has exactly one owner."""
    adj, wedge = _wedge_expand(delta, edges)
    if keep is not None:
        keep.append(wedge)
    n_wedge = wedge.count()
    out = _close_wedges(adj, wedge, n_wedge, wedge_broadcast_max_rows)
    if keep is None:
        # no owner volunteered for the wedge cache: materialize the
        # (batch-sized) result eagerly and free the wedge now, instead of
        # leaking a MEMORY_AND_DISK block until session end
        out = out.localCheckpoint(eager=True)
        try:
            wedge.unpersist()
        except Exception:  # noqa: BLE001
            pass
    return out


def triangle_delta(
    old_graph: LinkGraph,
    new_graph: LinkGraph,
    batch: DataFrame,
    keep: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(gained, lost) triangle triples (x,y,z) between the two graphs.

    ``batch`` is the ±edge update DataFrame (op, src, dst[, w]) that
    produced ``new_graph`` from ``old_graph``. Membership change is
    derived from the GRAPHS, not the batch ops (a '+' on an existing edge
    or a '-' on a missing one changes nothing), by probing each canonical
    edge set with the broadcast batch pairs — two O(E) scans — then
    anti-joining the two batch-sized hit sets.

    A gained triangle lives in new and contains an added edge (added
    edges are absent from old, so it is genuinely new); symmetrically for
    lost. Triangles whose edges are all untouched appear in neither."""
    bp = (
        batch.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    e_old = _canon_cached(old_graph)
    e_new = _canon_incremental(old_graph, new_graph, bp)
    old_hit = e_old.join(F.broadcast(bp), ["a", "b"], "left_semi")
    new_hit = e_new.join(F.broadcast(bp), ["a", "b"], "left_semi")
    added = new_hit.join(old_hit, ["a", "b"], "left_anti")
    removed = old_hit.join(new_hit, ["a", "b"], "left_anti")
    # both sides' wedges are persisted and materialized in ONE union
    # count job (the per-side counts also drive the broadcast gate) —
    # the sequential per-side counts were two driver barriers per batch
    own = keep is None
    if own:
        keep = []
    adj_new, wedge_g = _wedge_expand(added, e_new)
    adj_old, wedge_l = _wedge_expand(removed, e_old)
    keep.append(wedge_g)
    keep.append(wedge_l)
    counts = {
        r["k"]: r["n"]
        for r in wedge_g.select(F.lit("g").alias("k"))
        .unionByName(wedge_l.select(F.lit("l").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cap = 5_000_000  # wedge_broadcast_max_rows (see _triangles_touching)
    gained = _close_wedges(adj_new, wedge_g, counts.get("g", 0), cap)
    lost = _close_wedges(adj_old, wedge_l, counts.get("l", 0), cap)
    if own:
        # no owner volunteered for the wedge caches (same discipline as
        # _triangles_touching keep=None): materialize eagerly, free now
        gained = gained.localCheckpoint(eager=True)
        lost = lost.localCheckpoint(eager=True)
        for df in keep:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass
    return gained, lost


def triangle_count_incremental(
    graph: LinkGraph,
    prev_count: int,
    batch: DataFrame,
    info: dict | None = None,
) -> tuple[int, LinkGraph]:
    """K6 under edge updates: (new_count, updated_graph) without a
    from-scratch recount.

    new_count = prev_count + |gained| - |lost| where gained/lost come
    from ``triangle_delta`` — per batch that is four O(E) probe scans
    with broadcast batch-sized probes (vs the full recount's two O(E)
    joins with O(sum deg^2) wedge fan-out). Exactness is gated
    metamorphically vs the full recount in tests/test_round4_fixes.py.

    ``info`` (optional) receives gained/lost counts."""
    g2 = graph.with_updates(batch)
    keep: list = []
    gained, lost = triangle_delta(graph, g2, batch, keep=keep)
    # one union job counts both sides (two sequential counts were two
    # driver barriers per batch)
    cnt = {
        r["k"]: r["n"]
        for r in gained.select(F.lit("g").alias("k"))
        .unionByName(lost.select(F.lit("l").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_gain = int(cnt.get("g", 0))
    n_lost = int(cnt.get("l", 0))
    for df in keep:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001
            pass
    if info is not None:
        info.update(gained=n_gain, lost=n_lost)
    return prev_count + n_gain - n_lost, g2


def per_vertex_triangles_incremental(
    graph: LinkGraph,
    prev_counts: DataFrame,
    batch: DataFrame,
) -> tuple[DataFrame, LinkGraph]:
    """K6 per-vertex counts under edge updates: (counts, updated_graph).

    Each gained/lost triangle adjusts its three corner vertices by ±1;
    the adjustment table is O(|gained|+|lost|) rows, merged into the
    previous counts with one outer join on vid (new vertices introduced
    by the batch enter at their delta, missing deltas keep the old
    count).

    The returned counts are LAZY and reference the pre-update graph:
    in a maintained stream, cut the lineage (``df.localCheckpoint()`` or
    persist+count) before releasing the predecessor graph — the same
    checkpoint discipline every maintained state in this engine follows
    (operators/superstep.py)."""
    g2 = graph.with_updates(batch)
    keep: list = []
    gained, lost = triangle_delta(graph, g2, batch, keep=keep)

    def _corners(tri: DataFrame, sign: int) -> DataFrame:
        return tri.select(
            F.explode(F.array("x", "y", "z")).alias("vid"),
            F.lit(sign).alias("d"),
        )

    deltas = (
        _corners(gained, 1)
        .unionByName(_corners(lost, -1))
        .groupBy("vid")
        .agg(F.sum("d").alias("d"))
        # eager: the adjustment table is O(|gained|+|lost|) rows — cutting
        # it to a leaf here lets the intermediate wedge caches go away now
        .localCheckpoint(eager=True)
    )
    for df in keep:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001
            pass
    out = (
        g2.vertices.join(
            prev_counts.withColumnRenamed("triangles", "prev"), "vid", "left"
        )
        .join(deltas, "vid", "left")
        .select(
            "vid",
            (
                F.coalesce("prev", F.lit(0)) + F.coalesce("d", F.lit(0))
            ).cast("bigint").alias("triangles"),
        )
    )
    return out, g2


def per_vertex_triangles(
    graph: LinkGraph, orient_by_degree: bool = True
) -> DataFrame:
    """(vid, triangles) — number of triangles incident to each vertex.

    Per-vertex counts are orientation-invariant (any acyclic orientation
    enumerates each triangle exactly once, and every enumeration
    contributes the same three corners), so ``orient_by_degree`` defaults
    ON like ``triangle_count``: id order would let a low-id hub keep its
    full oriented out-degree and make the wedge join O(deg^2) at that hub,
    where degree order caps it at O(sqrt(m))."""
    e = _oriented(graph, orient_by_degree=orient_by_degree).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    graph._owned_caches.append(e)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    counts = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("vid"))
        .groupBy("vid")
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )
    return graph.vertices.join(counts, "vid", "left").select(
        "vid", F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles")
    )


def clustering_coefficients(graph: LinkGraph) -> DataFrame:
    """(vid, lcc) — local clustering coefficient, the standard link-graph
    cohesion feature (spam farms and scraped mirrors sit at the extremes):
    lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) over the simple undirected
    graph, 0.0 when deg < 2; round(·, 6) for cross-engine value parity.

    Pure composition of the engine's own surfaces — per_vertex_triangles
    (degree-oriented wedge join) plus a SIMPLE-graph degree (distinct
    canonical pairs: out_degrees would under-count one-directionally
    stored edges and double-count parallel duplicates) — one keyed join;
    inherits both plans' scale properties, adds one shuffle."""
    tri = per_vertex_triangles(graph)
    deg = (
        graph.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .select(F.explode(F.array("a", "b")).alias("vid"))
        .groupBy("vid")
        .agg(F.count("*").alias("outdeg"))
    )
    return tri.join(deg, "vid").select(
        "vid",
        F.round(
            F.when(
                F.col("outdeg") >= 2,
                2.0
                * F.col("triangles")
                / (F.col("outdeg") * (F.col("outdeg") - 1)),
            ).otherwise(0.0),
            6,
        ).alias("lcc"),
    )
