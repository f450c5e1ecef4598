"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline metrics (BASELINE.md):
  - ppr_supersteps_per_sec : K1 synchronous push supersteps/sec
  - edge_updates_per_sec   : K2 edge-updates-applied/sec
  - plus wall seconds per query in "queries"

Repeats (round-3, completed round-5): EVERY query runs BENCH_REPEATS times
(default 3) — "queries" carries the MEDIAN wall seconds and
"queries_spread" the min/max/n per query, because this box is a noisy
shared tenant (single-shot deltas under ~2x are not evidence; see
BENCH/BASELINE.md). Derived throughputs use the median run. The output
shape (every queries key has a spread record) is pinned by
tests/test_round5_fixes.py::test_bench_output_shape.

Scaling-efficiency protocol (BASELINE.md): run this same script twice,
SPARK_GRAFT_CPUS=8 and =32, and compare throughput — tools/scaling_bench.py
automates that and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import itertools
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dynamicppr_spark.graph import LinkGraph  # noqa: E402
from dynamicppr_spark.operators.pagerank import pagerank  # noqa: E402
from dynamicppr_spark.operators.ppr import PPREngine  # noqa: E402
from dynamicppr_spark.operators.triangles import triangle_count  # noqa: E402
from dynamicppr_spark.session import get_spark  # noqa: E402
from dynamicppr_spark.sources.tpch_graph import (  # noqa: E402
    load_table,
    part_cooccurrence_edges,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PPR_SUPERSTEPS = int(os.environ.get("BENCH_PPR_SUPERSTEPS", "15"))
PR_ITERS = int(os.environ.get("BENCH_PR_ITERS", "15"))
N_UPDATE_BATCHES = int(os.environ.get("BENCH_UPDATE_BATCHES", "8"))
UPDATES_PER_BATCH = int(os.environ.get("BENCH_UPDATES_PER_BATCH", "200"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
# supersteps composed into one Spark job while state is small (superstep.py):
# wins on small-state kernels (PageRank rank table); the 32-source PPR state
# is large enough that per-job overhead is no longer the bottleneck there
STEPS_PER_JOB = int(os.environ.get("BENCH_STEPS_PER_JOB", "1"))
PR_STEPS_PER_JOB = int(os.environ.get("BENCH_PR_STEPS_PER_JOB", "4"))
# BENCH_ONLY=q_pagerank,q_ppr_static runs just those sections (the graph
# build always runs — everything depends on it). Used by the scaling
# harness's clones protocol, where the full suite at 8x edges would not
# fit a round's wall budget.
ONLY = frozenset(
    s for s in os.environ.get("BENCH_ONLY", "").split(",") if s
)


def want(name: str) -> bool:
    return not ONLY or name in ONLY


def _update_batches(spark, vmax: int, seed: int = 42, n_batches=None):
    """(batches, total_rows): update-batch DataFrames plus their combined
    row count (known from generation — no count() jobs needed)."""
    rng = np.random.default_rng(seed)
    out, total = [], 0
    for b in range(n_batches or N_UPDATE_BATCHES):
        src = rng.integers(0, vmax, UPDATES_PER_BATCH)
        dst = rng.integers(0, vmax, UPDATES_PER_BATCH)
        ops = np.where(rng.random(UPDATES_PER_BATCH) < 0.8, "+", "-")
        rows = [
            (str(o), int(s), int(d))
            for o, s, d in zip(ops, src, dst)
            if s != d
        ]
        total += len(rows)
        out.append(
            spark.createDataFrame(rows, "op string, src bigint, dst bigint")
        )
    return out, total


def main() -> None:
    sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    parts = max(64, 2 * CPUS)
    extra = {}
    if os.environ.get("BENCH_AQE", "true") == "false":
        # iterative kernels: AQE's per-stage re-planning is serial driver
        # time; the scaling runs disable it (fixed-size supersteps)
        extra["spark.sql.adaptive.enabled"] = "false"
    # SPARK_GRAFT_MASTER overrides the master expression (e.g.
    # local-cluster[8,4,4096] for the separate-executor-JVM protocol)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{CPUS}]")
    spark = get_spark(
        "dynamicppr-bench",
        master=master,
        shuffle_partitions=parts,
        extra_confs=extra,
    )
    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    extras: dict[str, float] = {}

    def repeated(name, fn, n=REPEATS):
        """Run ``fn`` n times; record median wall (+ spread) and return
        the per-run results list. fn() may return a dict of extra metrics;
        the run at the median wall supplies them."""
        walls, results = [], []
        for _ in range(max(1, n)):
            t = time.time()
            results.append(fn() or {})
            walls.append(time.time() - t)
        order = sorted(range(len(walls)), key=lambda i: walls[i])
        med_i = order[len(order) // 2] if len(order) % 2 else order[len(order) // 2 - 1]
        timings[name] = round(statistics.median(walls), 3)
        spread[name] = {
            "min": round(min(walls), 3),
            "max": round(max(walls), 3),
            "n": len(walls),
        }
        return results[med_i], timings[name]

    # -------- graph build (ETL path: extraction + dedup + partitioning)
    # repeated like everything else (round-5: every query gets a spread
    # record); each run builds a FRESH LinkGraph and releases the previous
    # one so the repeats don't stack persisted edge caches
    clones = int(os.environ.get("BENCH_GRAPH_CLONES", "1"))
    g = None
    n_edges = 0

    def _run_build():
        nonlocal g, n_edges
        if g is not None:
            g.release()
        edges = part_cooccurrence_edges(spark, SF_DIR, directed_both_ways=True)
        if clones > 1:
            # scaling-protocol knob: k disjoint offset copies of the graph
            # multiply per-superstep WORK by k without changing structure
            # or iteration counts — used to amortize the serial per-job
            # floor when measuring N-vs-4N efficiency (BENCH/BASELINE.md)
            stride = (
                edges.agg(
                    F.greatest(F.max("src"), F.max("dst"))
                ).collect()[0][0] + 1
            )
            edges = edges.withColumn(
                "c", F.explode(F.array(*[F.lit(i) for i in range(clones)]))
            ).select(
                (F.col("src") + F.col("c") * F.lit(stride)).alias("src"),
                (F.col("dst") + F.col("c") * F.lit(stride)).alias("dst"),
            )
        g = LinkGraph(edges, num_partitions=parts)
        n_edges = g.edges.count()
        _ = g.scatter_edges.count()  # materialize the hot-loop edge side

    repeated("q_graph_build", _run_build)
    extras["n_edges"] = n_edges
    extras["n_vertices"] = g.num_vertices
    extras["graph_clones"] = clones

    # -------- K3 PageRank: fixed supersteps -> supersteps/sec
    if want("q_pagerank"):
        def _run_pr():
            pagerank(g, tol=0.0, max_iter=PR_ITERS, steps_per_job=PR_STEPS_PER_JOB)

        _, med = repeated("q_pagerank", _run_pr)
        extras["pagerank_supersteps_per_sec"] = round(PR_ITERS / med, 4)

    # gated local-mode K3 (same arbitration as PPR's bcsr path)
    if want("q_pagerank_local"):
        def _run_pr_local():
            pagerank(g, tol=0.0, max_iter=PR_ITERS, mode="local")

        _, med = repeated("q_pagerank_local", _run_pr_local)
        extras["pagerank_local_supersteps_per_sec"] = round(PR_ITERS / med, 4)

    # -------- K1 static PPR (multi-source batched queries, K8):
    # fixed supersteps -> supersteps/sec. 32 sources amortize the fixed
    # per-superstep cost the same way the reference batches queries.
    n_sources = int(os.environ.get("BENCH_PPR_SOURCES", "32"))
    top = [
        r["src"]
        for r in g.out_degrees.orderBy(
            F.desc("outdeg"), F.asc("src")
        ).limit(n_sources).collect()
    ]

    if want("q_ppr_static"):
        def _run_static():
            eng = PPREngine(
                g, top, eps=0.0, max_supersteps=PPR_SUPERSTEPS,
                steps_per_job=STEPS_PER_JOB,
            )
            eng.push_to_convergence()
            return {"steps": eng.metrics.supersteps}

        res, med = repeated("q_ppr_static", _run_static)
        extras["ppr_supersteps_per_sec"] = round(res["steps"] / med, 4)
        extras["ppr_n_sources"] = n_sources

    # -------- K1/K8 static PPR, broadcast-CSR mode (reference-parity
    # in-memory push; operators/local_push.py) — same work as q_ppr_static
    if want("q_ppr_static_bcsr"):
        def _run_static_bcsr():
            engb = PPREngine(
                g, top, eps=0.0, max_supersteps=PPR_SUPERSTEPS, mode="bcsr"
            )
            engb.push_to_convergence()

        _, med = repeated("q_ppr_static_bcsr", _run_static_bcsr)
        extras["ppr_bcsr_supersteps_per_sec"] = round(PPR_SUPERSTEPS / med, 4)

    # -------- K2 dynamic updates -> edge-updates-applied/sec
    # The maintained workload is the reference's batched-query model: 32
    # concurrent PPR sources all kept incrementally correct under the
    # update stream. mode='auto' resolves to broadcast-CSR at this scale
    # (per-source-parallel local push; falls back to the distributed path
    # beyond the executor-memory gate).
    # one engine per mode, converged once OUTSIDE the repeated window; each
    # repeat applies a fresh batch stream to the EVOLVING maintained state
    # (the realistic update-stream regime) and times only the update window
    if want("q_ppr_updates"):
        eng2 = PPREngine(g, top, eps=1e-3, mode="auto")
        eng2.push_to_convergence()
        # unbounded seed streams: BENCH_REPEATS > 10 must not exhaust them
        seeds = itertools.count(42)

        def _run_updates_auto():
            batches, _n = _update_batches(
                spark, extras["n_vertices"], seed=next(seeds)
            )
            before = eng2.metrics.updates_applied
            t = time.time()
            for b in batches:
                eng2.apply_updates(b)
            wall = time.time() - t
            return {"ups": (eng2.metrics.updates_applied - before) / wall}

        res, med = repeated("q_ppr_updates", _run_updates_auto)
        extras["edge_updates_per_sec"] = round(res["ups"], 4)
        extras["ppr_updates_mode"] = eng2._resolved_mode()
        extras["ppr_updates_n_sources"] = n_sources

    # df-mode dynamic updates (the 100 TB fallback path) — round-4: the
    # SAME 32 maintained sources as the bcsr headline, so the two modes'
    # edge-updates/sec are like-for-like (the product regime is "all
    # maintained sources stay correct under the stream"); fewer batches
    # per repeat (each batch is distributed dataflow)
    if want("q_ppr_updates_df"):
        n_sources_df = int(
            os.environ.get("BENCH_PPR_DF_SOURCES", str(n_sources))
        )
        eng3 = PPREngine(
            g, top[:n_sources_df], eps=1e-3, mode="df",
            steps_per_job=STEPS_PER_JOB,
        )
        eng3.push_to_convergence()
        seeds_df = itertools.count(7)

        def _run_updates_df():
            batches_df, _n = _update_batches(
                spark, extras["n_vertices"], seed=next(seeds_df), n_batches=3
            )
            before = eng3.metrics.updates_applied
            t = time.time()
            for b in batches_df:
                eng3.apply_updates(b)
            wall = time.time() - t
            return {"ups": (eng3.metrics.updates_applied - before) / wall}

        res, med = repeated("q_ppr_updates_df", _run_updates_df)
        extras["edge_updates_per_sec_df"] = round(res["ups"], 4)
        extras["ppr_updates_df_n_sources"] = n_sources_df

    # -------- K6 triangles
    if want("q_triangles"):
        repeated("q_triangles", lambda: triangle_count(g).collect())

    # -------- K9 seed distances (frontier-pruned multi-source BFS)
    if want("q_seed_distances"):
        from dynamicppr_spark.operators.distances import seed_distances

        def _run_distances():
            out = seed_distances(g, [0, 1, 2, 3])
            n = out.count()
            return {"reached": float(n)}

        res, _ = repeated("q_seed_distances", _run_distances)
        extras["seed_distance_reached"] = res["reached"]

    # -------- K10 k-core (delta peel)
    if want("q_kcore"):
        from dynamicppr_spark.operators.kcore import k_core

        # k at the mean degree drives a real multi-round peel cascade on
        # this dense co-occurrence graph (k << mean removes nothing)
        kc = max(2, n_edges // max(1, int(extras["n_vertices"])))

        def _run_kcore():
            out = k_core(g, kc)
            n = out.count()
            return {"core": float(n)}

        res, _ = repeated("q_kcore", _run_kcore)
        extras["kcore_vertices"] = res["core"]

    # -------- K6 incremental maintenance under ±edge batches (round-4):
    # gained/lost touched-triple deltas instead of a full recount. Each
    # repeat streams fresh batches into the EVOLVING maintained count
    # (same regime as q_ppr_updates); throughput uses the inner window
    # (batch generation excluded — row counts are known from generation).
    if want("q_triangles_updates"):
        from dynamicppr_spark.operators.triangles import (
            triangle_count_incremental,
        )

        n_tri_batches = int(os.environ.get("BENCH_TRI_BATCHES", "2"))
        tri_state = {"g": g, "count": triangle_count(g).collect()[0]["n"]}
        tri_seeds = itertools.count(1042)

        def _run_tri_updates():
            batches, n_ups = _update_batches(
                spark, extras["n_vertices"], seed=next(tri_seeds),
                n_batches=n_tri_batches,
            )
            t = time.time()
            for b in batches:
                tri_state["count"], tg2 = triangle_count_incremental(
                    tri_state["g"], tri_state["count"], b
                )
                if tri_state["g"] is not g:
                    tri_state["g"].release(keep=tg2)
                tri_state["g"] = tg2
            return {"ups": n_ups / (time.time() - t)}

        res, _med = repeated("q_triangles_updates", _run_tri_updates)
        extras["triangle_updates_per_sec"] = round(res["ups"], 4)
        if tri_state["g"] is not g:
            tri_state["g"].release(keep=g)

    # -------- dedup + similarity over documents/embeddings
    from dynamicppr_spark.functions.dedup import minhash_lsh_pairs
    from dynamicppr_spark.functions.similarity import cosine_topk

    if want("q_minhash_lsh"):
        def _run_minhash():
            docs = load_table(spark, SF_DIR, "documents")
            minhash_lsh_pairs(docs, num_hashes=8, bands=4).count()

        repeated("q_minhash_lsh", _run_minhash)

    # -------- end-to-end corpus dedup (exact stage + MinHash-LSH stage +
    # cluster consolidation + anti-join): the canonical training-data
    # pipeline workload — throughput is input docs/sec through BOTH stages
    if want("q_dedup_corpus"):
        from dynamicppr_spark.functions.dedup import dedup_corpus

        dedup_state: dict[str, float] = {}

        def _run_dedup_corpus():
            docs = load_table(spark, SF_DIR, "documents")
            n_in = docs.count()
            t = time.time()
            n_out = dedup_corpus(docs).count()
            dedup_state["wall"] = time.time() - t
            return {"n_in": n_in, "n_out": n_out, "wall": dedup_state["wall"]}

        res, _med = repeated("q_dedup_corpus", _run_dedup_corpus)
        extras["dedup_docs_per_sec"] = round(res["n_in"] / res["wall"], 2)
        extras["dedup_docs_in"] = res["n_in"]
        extras["dedup_docs_out"] = res["n_out"]
    # -------- corpus hygiene (repetition gate + decontamination) and
    # sequence packing: the round-5 LLM-pipeline additions, measured as
    # docs/sec and packed tokens/sec
    if want("q_hygiene"):
        from dynamicppr_spark.functions.contamination import (
            contamination_by_split,
        )
        from dynamicppr_spark.functions.repetition import repetition_stats

        def _run_hygiene():
            docs = load_table(spark, SF_DIR, "documents")
            n_in = docs.count()
            t = time.time()
            bad = (
                repetition_stats(docs)
                .filter(F.col("top_bigram_frac") > 0.9)
                .select("doc_id")
            )
            kept = docs.join(bad, "doc_id", "left_anti")
            n_flagged = (
                contamination_by_split(kept, eval_frac=0.1)
                .filter(F.col("contamination_frac") > 0.8)
                .count()
            )
            return {
                "n_in": n_in,
                "n_flagged": n_flagged,
                "wall": time.time() - t,
            }

        res, _med = repeated("q_hygiene", _run_hygiene)
        extras["hygiene_docs_per_sec"] = round(res["n_in"] / res["wall"], 2)
        extras["hygiene_docs_flagged"] = res["n_flagged"]

    if want("q_pack"):
        from dynamicppr_spark.functions.pack import pack_text

        def _run_pack():
            docs = load_table(spark, SF_DIR, "documents")
            t = time.time()
            toks = (
                pack_text(docs, capacity=2048)
                .agg(F.sum("n_tokens").alias("s"))
                .collect()[0]["s"]
            )
            return {"n_tokens": int(toks or 0), "wall": time.time() - t}

        res, _med = repeated("q_pack", _run_pack)
        extras["pack_tokens_per_sec"] = round(res["n_tokens"] / res["wall"], 2)
        extras["pack_tokens"] = res["n_tokens"]

    if want("q_cosine_topk"):
        def _run_cosine():
            emb = load_table(spark, SF_DIR, "embeddings")
            cosine_topk(emb, k=5, n_queries=20).count()

        repeated("q_cosine_topk", _run_cosine)

    # -------- relational spine (TPC-H Q1 style)
    if want("q_tpch_q1"):
        def _run_q1():
            li = load_table(spark, SF_DIR, "lineitem")
            li.filter(F.col("l_shipdate") <= "1998-09-02").groupBy(
                "l_returnflag", "l_linestatus"
            ).agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count("*").alias("n"),
            ).collect()

        repeated("q_tpch_q1", _run_q1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_spread": spread,
                "repeats": REPEATS,
                "sf": sf,
                "cpus": CPUS,
                "shuffle_partitions": parts,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
