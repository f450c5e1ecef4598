"""Round-6 optimization harness (NOT the driver bench — bench.py is frozen
for measurement; this file exists for guide §1 methodology: plan capture,
noop-sink isolation, per-superstep profiling).

Usage:
  python bench_extra.py explain  --tag before [--only q_pagerank,...]
      Capture .explain("formatted") for each covered query's hot plan into
      plans/r06/<query>_<tag>.txt. For iterative kernels the captured plan
      is ONE superstep (the composed loop re-plans the same shape each
      block); for one-shot queries it is the full query plan.
  python bench_extra.py noop --only q_minhash_lsh [--repeats 3]
      Time the covered one-shot queries with the noop sink (computes every
      column, discards output) — isolates computation from the sink.

Timing comparisons against BENCH_r05.json use the REAL bench.py via its
documented env knobs (BENCH_ONLY / BENCH_REPEATS), unchanged.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from dynamicppr_spark.graph import LinkGraph  # noqa: E402
from dynamicppr_spark.session import get_spark  # noqa: E402
from dynamicppr_spark.sources.tpch_graph import (  # noqa: E402
    load_table,
    part_cooccurrence_edges,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = Path(__file__).resolve().parent / "plans" / "r06"


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _graph(spark):
    edges = part_cooccurrence_edges(spark, SF_DIR, directed_both_ways=True)
    g = LinkGraph(edges, num_partitions=max(64, 2 * CPUS))
    g.edges.count()
    g.scatter_edges.count()
    return g


def _covered(spark, g):
    """name -> (kind, fn). kind: 'df' = one-shot DataFrame (explain + noop);
    'step' = returns a representative superstep/hot-loop DataFrame
    (explain only — loop timing goes through bench.py)."""
    from dynamicppr_spark.functions.contamination import contamination_by_split
    from dynamicppr_spark.functions.dedup import (
        dedup_corpus,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from dynamicppr_spark.functions.pack import pack_text
    from dynamicppr_spark.functions.repetition import repetition_stats
    from dynamicppr_spark.functions.similarity import cosine_topk
    from dynamicppr_spark.operators.kcore import k_core
    from dynamicppr_spark.operators.distances import seed_distances
    from dynamicppr_spark.operators.triangles import triangle_count

    docs = lambda: load_table(spark, SF_DIR, "documents")  # noqa: E731
    emb = lambda: load_table(spark, SF_DIR, "embeddings")  # noqa: E731

    def pagerank_step():
        # one representative power-iteration superstep (pagerank.py::step)
        scatter = g.scatter_edges
        n = g.num_vertices
        ranks = g.vertices.select(
            "vid", F.lit(1.0 / n).alias("score"), F.lit(False).alias("dang")
        )
        contribs = (
            ranks.select("vid", "score")
            .join(scatter, ranks.vid == scatter.src)
            .select(
                F.col("dst").alias("vid"),
                (F.col("score") * F.col("inv_outdeg")).alias("c"),
                F.lit(None).cast("double").alias("old_score"),
                F.lit(None).cast("boolean").alias("dang"),
            )
        )
        carrier = ranks.select(
            "vid", F.lit(0.0).alias("c"), F.col("score").alias("old_score"), "dang"
        )
        return (
            carrier.unionByName(contribs)
            .groupBy("vid")
            .agg(
                F.sum("c").alias("c"),
                F.max("old_score").alias("old_score"),
                F.max("dang").alias("dang"),
            )
        )

    def ppr_step():
        # one representative multi-source push superstep — the DENSE
        # (vid, res[S], resv[S]) form the engine uses for S > 1 df pushes
        # since round 6 (ppr.py::_push_superstep_dense)
        from dynamicppr_spark.operators.ppr import PPREngine

        top = [
            r["src"]
            for r in g.out_degrees.orderBy(F.desc("outdeg"), F.asc("src"))
            .limit(32)
            .collect()
        ]
        eng = PPREngine(g, top, eps=0.0, max_supersteps=15, mode="df")
        eng._prepare_push()
        dense = eng._to_dense(eng.state)
        return eng._push_superstep_dense(
            dense, [True] * len(eng.sources), broadcast_frontier=True
        )

    return {
        "q_pagerank": ("step", pagerank_step),
        "q_ppr_static": ("step", ppr_step),
        "q_triangles": ("df", lambda: triangle_count(g)),
        "q_seed_distances": (
            "df",
            lambda: seed_distances(g, [0, 1, 2, 3]),
        ),
        "q_kcore": (
            "df",
            lambda: k_core(g, max(2, g.num_edges // max(1, g.num_vertices))),
        ),
        "q_minhash_lsh": (
            "df",
            lambda: minhash_lsh_pairs(docs(), num_hashes=8, bands=4),
        ),
        "q_minhash_sigs": (
            "df",
            lambda: minhash_signatures(docs(), num_hashes=8, k=3),
        ),
        "q_dedup_corpus": ("df", lambda: dedup_corpus(docs())),
        "q_hygiene_repetition": ("df", lambda: repetition_stats(docs())),
        "q_hygiene_contamination": (
            "df",
            lambda: contamination_by_split(docs(), eval_frac=0.1),
        ),
        "q_pack": ("df", lambda: pack_text(docs(), capacity=2048)),
        "q_cosine_topk": ("df", lambda: cosine_topk(emb(), k=5, n_queries=20)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["explain", "noop"])
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}

    spark = get_spark(
        "dynamicppr-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(64, 2 * CPUS),
    )
    g = _graph(spark)
    cov = _covered(spark, g)
    PLAN_DIR.mkdir(parents=True, exist_ok=True)

    if args.cmd == "explain":
        for name, (kind, fn) in cov.items():
            if only and name not in only:
                continue
            df = fn()
            path = PLAN_DIR / f"{name}_{args.tag}.txt"
            path.write_text(_explain_str(df))
            print(f"wrote {path}")
        return

    timings = {}
    for name, (kind, fn) in cov.items():
        if only and name not in only:
            continue
        if kind != "df":
            continue
        walls = []
        for _ in range(args.repeats):
            df = fn()
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = walls
        print(json.dumps({name: walls}), flush=True)
    print(json.dumps({"noop_timings": timings}))


if __name__ == "__main__":
    main()
