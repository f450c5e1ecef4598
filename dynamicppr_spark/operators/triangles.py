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
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(e3, ["x", "z"])
    out = tri.agg(F.count("*").cast("bigint").alias("n"))
    return out


def per_vertex_triangles(graph: LinkGraph) -> DataFrame:
    """(vid, triangles) — number of triangles incident to each vertex."""
    e = _oriented(graph, orient_by_degree=False).persist(
        StorageLevel.MEMORY_AND_DISK
    )
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
