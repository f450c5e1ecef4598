"""repo_files ETL (SURVEY.md §2b E1-E6): extraction, ids, invariants."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dynamicppr_spark.sources import repo_files as R
from tests import fixtures


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = fixtures.repo_files(n_repos=3, paths_per_repo=20, commits_per_repo=6)
    return spark.createDataFrame(pdf), pdf


def test_dependency_extraction_matches_regex(spark, corpus):
    df, pdf = corpus
    got = {
        (r.repo, r.src_path, r.dst_path)
        for r in R.extract_dependency_edges(df).collect()
    }
    # sequential reference: latest commit per (repo,path), regex findall
    latest = pdf.sort_values("commit").groupby(["repo", "path"]).last()
    known = set(latest.index)
    want = set()
    for (repo, path), row in latest.iterrows():
        for m in re.findall(r"(?m)^import\s+([A-Za-z0-9_.]+)\s*$", row["content"]):
            dst = m.replace(".", "/") + ".py"
            if dst != path and (repo, dst) in known:
                want.add((repo, path, dst))
    assert got == want
    assert len(got) > 0


def test_cocommit_extraction_matches_pairs(spark, corpus):
    df, pdf = corpus
    got = {
        (r.repo, r.src_path, r.dst_path)
        for r in R.extract_cocommit_edges(df, max_paths_per_commit=None).collect()
    }
    want = set()
    for (repo, commit), grp in pdf.groupby(["repo", "commit"]):
        paths = sorted(set(grp["path"]))
        for i, a in enumerate(paths):
            for b in paths[i + 1 :]:
                want.add((repo, a, b))
    assert got == want


def test_cocommit_cap_is_deterministic(spark, corpus):
    df, _ = corpus
    a = R.extract_cocommit_edges(df, max_paths_per_commit=3).collect()
    b = R.extract_cocommit_edges(df, max_paths_per_commit=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # cap 3 => at most C(3,2)=3 pairs per commit
    full = R.extract_cocommit_edges(df, max_paths_per_commit=None).count()
    assert len(a) <= full


def test_vertex_ids_dense_bijective(spark, corpus):
    df, pdf = corpus
    verts = R.assign_vertex_ids(df, num_buckets=8).collect()
    n = len({(r.repo, r.path) for r in verts})
    vids = sorted(r.vid for r in verts)
    assert vids == list(range(n))  # dense 0..n-1, no dupes
    assert n == len(pdf.groupby(["repo", "path"]))


def test_build_link_graph_end_to_end(spark, corpus):
    df, _ = corpus
    graph, vertices = R.build_link_graph(df, edge_kind="both")
    assert graph.edges.count() > 0
    # edge endpoints resolve back through the dictionary
    v_ids = {r.vid for r in vertices.collect()}
    for r in graph.edges.limit(50).collect():
        assert r.src in v_ids and r.dst in v_ids
    # co-commit edges are symmetric in the final graph
    cc_only, _ = R.build_link_graph(df, edge_kind="cocommit")
    assert cc_only.edges.exceptAll(
        cc_only.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).count() == 0


def test_sha256_invariant_through_etl(spark, corpus):
    """BASELINE.json:15 — content sha256 equality per row through ETL."""
    df, pdf = corpus
    hashed = R.with_content_sha(df)
    out = R.latest_files(hashed)  # projection/filter path
    for r in out.select("content", "content_sha").limit(100).collect():
        assert r.content_sha == fixtures.sha256_hex(r.content)
