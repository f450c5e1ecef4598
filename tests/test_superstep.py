"""Superstep harness: checkpoint manifests, resume, PageRank resume gate."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from dynamicppr_spark.operators.pagerank import pagerank
from dynamicppr_spark.operators.superstep import latest_checkpoint
from tests import fixtures, oracle
from tests.conftest import scores_to_array


def test_pagerank_checkpoint_manifest(spark, make_graph, tmp_path):
    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    ck = tmp_path / "pr_ck"
    got = scores_to_array(
        pagerank(g, tol=1e-4, max_iter=100, ckpt_dir=str(ck), ckpt_every=5), n
    )
    want, _ = oracle.pagerank(edges, n, tol=1e-4)
    np.testing.assert_allclose(got, want, atol=1e-9)
    found = latest_checkpoint(ck)
    assert found is not None
    it, manifest = found
    assert manifest["name"] == "pagerank"
    assert manifest["metrics"]["delta"] <= 1e-4
    assert sum(manifest["partitions"].values()) == n  # per-partition lineage
    assert (ck / f"it={it}" / "_SUCCESS").exists()


def test_pagerank_resume_mid_iteration(spark, make_graph, tmp_path):
    """Kill after k supersteps, resume from checkpoint, identical scores."""
    edges, n = fixtures.star_graph(30)
    g = make_graph(edges, n)
    ck = tmp_path / "pr_resume"
    # "killed" run: bounded iterations, checkpoint every 4
    partial = pagerank(
        g, tol=1e-6, max_iter=10, ckpt_dir=str(ck), ckpt_every=4,
        return_result=True,
    )
    assert not partial.converged
    # resumed run picks up from the durable checkpoint (iteration >= 8)
    resumed = pagerank(
        g, tol=1e-6, max_iter=300, ckpt_dir=str(ck), ckpt_every=4,
        return_result=True,
    )
    assert resumed.converged
    assert resumed.resumed_from >= 8
    straight = pagerank(g, tol=1e-6, max_iter=300)
    a = scores_to_array(resumed.state, n)
    b = scores_to_array(straight, n)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_checkpoint_retention(spark, make_graph, tmp_path):
    """Only the newest 2 durable checkpoints are kept on disk."""
    edges, n = fixtures.star_graph(20)
    g = make_graph(edges, n)
    ck = tmp_path / "ret"
    pagerank(g, tol=1e-6, max_iter=50, ckpt_dir=str(ck), ckpt_every=3)
    manifests = sorted(ck.glob("manifest_*.json"))
    state_dirs = sorted(p for p in ck.glob("it=*") if p.is_dir())
    assert len(manifests) <= 2
    assert len(state_dirs) <= 2
    # manifest is valid JSON with convergence metrics
    m = json.loads(manifests[-1].read_text())
    assert "metrics" in m and "partitions" in m
