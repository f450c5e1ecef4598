"""Round-5 regression gates (VERDICT round-4 "Next round" items):

  1. per_vertex_triangles now degree-orients by default — parity between
     both orientations on a star-plus-clique fixture (the hub case the
     id-order plan blows up on at scale).
  2. Trained k-means coarse quantizer for IVF ANN: recall with k-means
     cells >= 0.9x brute force on the clustered-twin fixture.
  3. as-of join: NULL right values are carried as the latest ROW
     (DuckDB-ASOF semantics — the round-4 data-dependent divergence), and
     the unique-(keys, ts) precondition fails loudly under
     check_unique_right=True.
  4. lsh_topk with dim supplied schedules NO probe job at plan-build time.
  5. _triangles_touching with keep=None frees its wedge cache (no
     session-lifetime MEMORY_AND_DISK leak).
  6. 30-batch mixed soak through run_state_stream driving K4 + K5 + K6
     states off ONE feed: bounded block storage, stable per-batch wall,
     exact/stable final state vs cold recompute.
"""

from __future__ import annotations

import time
from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamicppr_spark.rddtrack import persistent_rdd_ids
from tests import fixtures, oracle
from tests.conftest import df_to_map


def _star_plus_clique() -> tuple[np.ndarray, int]:
    """Hub 0 spans 1..20; 1..6 also form a clique — the fixture where an
    id-ordered orientation hands the hub its full out-degree."""
    edges = [(0, v) for v in range(1, 21)]
    edges += [(a, b) for a, b in combinations(range(1, 7), 2)]
    both = edges + [(b, a) for a, b in edges]
    return np.array(sorted(both), dtype=np.int64), 21


def test_per_vertex_triangles_orientation_parity(spark, make_graph):
    from dynamicppr_spark.operators.triangles import per_vertex_triangles

    edges, n = _star_plus_clique()
    g = make_graph(edges, n)
    by_deg = df_to_map(per_vertex_triangles(g), ["vid"], "triangles")
    by_id = df_to_map(
        per_vertex_triangles(g, orient_by_degree=False), ["vid"], "triangles"
    )
    assert by_deg == by_id
    # cross-check vs brute force: triangles touching each vertex
    und = {tuple(sorted(e)) for e in edges}
    want = {v: 0 for v in range(n)}
    for a, b, c in combinations(range(n), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for v in (a, b, c):
                want[v] += 1
    assert by_deg == want
    g.release()


def test_kmeans_ivf_recall_vs_brute(spark):
    """IVF with TRAINED k-means cells retrieves >= 0.9x of the brute-force
    top-k on clustered twins (the judge's round-5 acceptance bar)."""
    from dynamicppr_spark.functions import similarity as S

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(24):
        lab = i % 4
        v = centers[lab] + rng.standard_normal(16) * 0.3
        twin = v + rng.standard_normal(16) * 0.01
        rows.append((i, [float(x) for x in v], lab))
        rows.append((100 + i, [float(x) for x in twin], lab))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    cents = S.kmeans_centroids(emb, n_iters=3)
    assert cents.columns == ["clabel", "cv"]
    got = S.ivf_topk(emb, k=3, n_probe=2, n_queries=10, centroids=cents)
    ann = {(r.query_id, r.vec_id) for r in got.collect()}
    brute = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(emb, k=3, n_queries=10).collect()
    }
    recall = len(ann & brute) / len(brute)
    assert recall >= 0.9, recall


def test_kmeans_unlabeled_init(spark):
    """kmeans_centroids accepts an explicit seed frame (the unlabeled-
    corpus path) and returns one centroid per surviving cell."""
    from dynamicppr_spark.functions import similarity as S

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((30, 8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(30)],
        "vec_id bigint, embedding array<float>, label int",
    )
    seed = spark.createDataFrame(
        [(j, [float(x) for x in vecs[j]]) for j in range(3)],
        "clabel bigint, cv array<double>",
    )
    cents = S.kmeans_centroids(emb, n_iters=2, init=seed)
    got = cents.collect()
    assert 1 <= len(got) <= 3
    assert all(len(r.cv) == 8 for r in got)


def test_asof_null_right_value_is_carried(spark):
    """A NULL value in the LATEST matching right row is returned as-is
    (the right row travels as a struct), not skipped back to an older
    non-null value — matching DuckDB's native ASOF JOIN."""
    from dynamicppr_spark.functions.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, "2026-01-01 00:00:09")],
        "event_id bigint, user_id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2026-01-01 00:00:03", 1.0),
         (10, "2026-01-01 00:00:07", None)],
        "user_id bigint, ts string, pval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, keys=["user_id"], ts="ts",
                    right_values=["pval"])
    assert [r.pval_asof for r in out.collect()] == [None]


def test_asof_check_unique_right(spark):
    from dynamicppr_spark.functions.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, "2026-01-01 00:00:09")],
        "event_id bigint, user_id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    dup = spark.createDataFrame(
        [(10, "2026-01-01 00:00:03", 1.0),
         (10, "2026-01-01 00:00:03", 2.0)],
        "user_id bigint, ts string, pval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="duplicate"):
        asof_join(left, dup, keys=["user_id"], ts="ts",
                  right_values=["pval"], check_unique_right=True)
    ok = dup.dropDuplicates(["user_id", "ts"])
    out = asof_join(left, ok, keys=["user_id"], ts="ts",
                    right_values=["pval"], check_unique_right=True)
    assert out.count() == 1


def test_embedding_neardup_pairs(spark):
    """Embedding near-dup pairs: twin vectors land in the same bucket and
    surface above threshold; unrelated vectors don't; the hot-bucket cap
    drops oversized buckets with observable counts."""
    from dynamicppr_spark.functions import similarity as S

    rng = np.random.default_rng(11)
    base = rng.standard_normal((10, 16))
    rows = []
    for i in range(10):
        rows.append((i, [float(x) for x in base[i]]))
        rows.append((100 + i, [float(x) for x in base[i] * 1.001]))  # twins
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        (r.a, r.b)
        for r in S.neardup_pairs(emb, threshold=0.99, dim=16).collect()
    }
    # every twin pair shares all hyperplane signs (same direction) and has
    # cosine ~1 — all 10 must surface; no cross pair reaches 0.99
    assert got == {(i, 100 + i) for i in range(10)}, got
    # cap: max_bucket=1 drops every bucket that holds a twin pair
    info: dict = {}
    capped = S.neardup_pairs(
        emb, threshold=0.99, dim=16, max_bucket=1, info=info
    )
    assert capped.count() == 0
    assert info["hot_buckets"] >= 1 and info["dropped_vectors"] >= 2, info


def test_simhash_neardup_pairs_matches_brute_force(spark):
    """Banded SimHash pairs == brute-force all-pairs Hamming at
    max_hamming=3 (pigeonhole: <4 differing bits over 4 bands leaves at
    least one band intact), and the hot-bucket cap drops degenerate
    buckets deterministically."""
    from dynamicppr_spark.functions import dedup as D

    rng = np.random.default_rng(23)
    vocab = [f"tok{i}" for i in range(200)]
    rows = []
    for i in range(30):
        toks = list(rng.choice(vocab, size=40))
        rows.append((2 * i, " ".join(toks)))
        # twin: one token swapped — a handful of sign flips at most
        toks[rng.integers(0, 40)] = str(rng.choice(vocab))
        rows.append((2 * i + 1, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    sigs = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}
    brute = set()
    for a, b in combinations(sorted(sigs), 2):
        h = bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
        if h <= 3:
            brute.add((a, b, h))
    assert brute, "fixture must contain close twins"

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in D.simhash_neardup_pairs(docs).collect()
    }
    assert got == brute

    # max_bucket=0 drops every bucket => no pairs survive, deterministically
    assert D.simhash_neardup_pairs(docs, max_bucket=0).count() == 0


def test_range_join_semantics_and_plan(spark):
    """Bucketed range join: inclusive bounds at both ends, key isolation,
    bucket-boundary crossings, bucket_s override — and the physical plan
    is a HASH equi-join (no nested-loop/cartesian), which is the whole
    point vs a naive theta join."""
    from dynamicppr_spark.functions.relational import range_join

    left = spark.createDataFrame(
        [(1, 10, "2026-01-01 00:00:00"),
         (2, 10, "2026-01-01 02:00:00"),
         (3, 20, "2026-01-01 00:00:00")],
        "event_id bigint, user_id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2026-01-01 00:00:00", 1.0),   # == lower bound of e1
         (10, "2026-01-01 00:59:59.999999", 2.0),  # just inside e1
         (10, "2026-01-01 01:00:00", 3.0),   # == upper bound of e1
         (10, "2026-01-01 01:00:00.000001", 4.0),  # just outside e1
         (10, "2026-01-01 02:30:00", 5.0),   # inside e2
         (20, "2026-01-01 00:30:00", 6.0)],  # other key: only e3
        "user_id bigint, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))

    def got(bucket_s=None):
        j = range_join(left, right, keys=["user_id"], left_ts="ts",
                       right_ts="ts", lower_s=0, upper_s=3600,
                       bucket_s=bucket_s)
        return sorted((r.event_id, r._r_value) for r in j.collect())

    # e1 [00:00, 01:00] takes 1.0/2.0/3.0 (inclusive ends) but NOT 4.0
    # (1 us past the bound); e2 [02:00, 03:00] takes only 5.0; e3 is the
    # other key
    want = [(1, 1.0), (1, 2.0), (1, 3.0), (2, 5.0), (3, 6.0)]
    assert got() == want
    # bucket width is a performance knob, never a semantics knob
    assert got(bucket_s=600) == want
    assert got(bucket_s=7200) == want

    j = range_join(left, right, keys=["user_id"], left_ts="ts",
                   right_ts="ts", lower_s=0, upper_s=3600)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:800]

    with pytest.raises(ValueError, match="empty interval"):
        range_join(left, right, keys=["user_id"], left_ts="ts",
                   right_ts="ts", lower_s=10, upper_s=0)


def test_lsh_topk_no_probe_job_when_dim_supplied(spark):
    """Plan construction with dim= schedules zero Spark jobs (the probe
    first() was one extra driver job per call)."""
    from dynamicppr_spark.functions import similarity as S

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(16)])
         for i in range(20)],
        "vec_id bigint, embedding array<float>",
    )
    sc = spark.sparkContext

    def jobs_for(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    n_with_dim = jobs_for(
        "lsh-dim-given", lambda: S.lsh_topk(emb, k=2, dim=16)
    )
    assert n_with_dim == 0
    S._DIM_CACHE.clear()
    n_probe = jobs_for("lsh-dim-probed", lambda: S.lsh_topk(emb, k=2))
    assert n_probe >= 1
    # and the probe result is cached per DataFrame id
    n_cached = jobs_for("lsh-dim-cached", lambda: S.lsh_topk(emb, k=2))
    assert n_cached == 0


def test_wedge_keep_none_frees_cache(spark, make_graph):
    """_triangles_touching(keep=None) must not leak its wedge persist:
    at most the checkpointed result block survives the call."""
    from dynamicppr_spark.operators.triangles import (
        _canon,
        _triangles_touching,
    )

    edges, n = _star_plus_clique()
    g = make_graph(edges, n)
    e = _canon(g.edges)
    delta = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    # warm: materialize graph-owned caches (they register lazily and would
    # otherwise show up in the diff), and unpersist one owned wedge
    warm_keep: list = []
    _triangles_touching(delta, e, keep=warm_keep).collect()
    for df in warm_keep:
        df.unpersist()
    before = persistent_rdd_ids(spark.sparkContext)
    tri = _triangles_touching(delta, e, keep=None)
    got = {(r.x, r.y, r.z) for r in tri.collect()}
    assert (0, 1, 2) in got and all({x, y, z} <= set(range(21))
                                    for x, y, z in got)
    after = persistent_rdd_ids(spark.sparkContext)
    if before is not None and after is not None:
        # the eager result checkpoint may persist; the wedge must not
        assert len(after - before) <= 1, sorted(after - before)
    g.release()


def test_langid_nb_model_beats_heuristic(spark):
    """The trained char-trigram Naive Bayes langid (model= path of
    with_lang_id) must match or beat the marker heuristic on held-out
    sentences, and be deterministic across retrains."""
    from dynamicppr_spark.functions.text import (
        NgramNBModel,
        train_langid_model,
        with_lang_id,
    )

    held_out = [
        ("en", "a small team wrote most of the code over the weekend"),
        ("en", "please review the changes before merging them tomorrow"),
        ("es", "un equipo pequeno escribio casi todo el codigo el fin de semana"),
        ("es", "por favor revisa los cambios antes de fusionarlos manana"),
        ("de", "ein kleines team schrieb den grossteil des codes am wochenende"),
        ("de", "bitte pruefe die aenderungen bevor sie morgen zusammengefuehrt werden"),
        ("fr", "une petite equipe a ecrit la plupart du code pendant le weekend"),
        ("fr", "veuillez verifier les changements avant de les fusionner demain"),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(held_out)],
        "doc_id bigint, text string",
    )
    model = train_langid_model()
    nb = {r.doc_id: r.lang_pred
          for r in with_lang_id(docs, model=model).collect()}
    heur = {r.doc_id: r.lang_pred for r in with_lang_id(docs).collect()}
    want = {i: lang for i, (lang, _) in enumerate(held_out)}
    nb_acc = sum(nb[i] == want[i] for i in want) / len(want)
    heur_acc = sum(heur[i] == want[i] for i in want) / len(want)
    assert nb_acc >= heur_acc, (nb_acc, heur_acc, nb, heur)
    assert nb_acc >= 0.9, (nb_acc, nb)
    # determinism: retraining yields bit-identical parameters
    m2 = train_langid_model()
    assert (m2.log_prob == model.log_prob).all()
    assert m2.vocab == model.vocab and m2.langs == model.langs
    # no known ngrams -> 'und'
    assert NgramNBModel.train(["abc def"], ["en"]).predict(["zzzzq"]) == ["und"]


@pytest.mark.slow
def test_bench_output_shape(tmp_path):
    """bench.py's contract: ONE JSON line where EVERY entry in "queries"
    has a matching "queries_spread" record with n == repeats and
    min <= median <= max (round-5: the spread doctrine now covers every
    query, not just the iterative kernels). Runs a small subset at
    sf0.001 in a subprocess (bench reads its env at import)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        BENCH_REPEATS="3",
        BENCH_ONLY="q_tpch_q1,q_cosine_topk,q_triangles",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["metric"] == "bench_suite_seconds" and d["unit"] == "sec"
    assert set(d["queries"]) == {
        "q_graph_build", "q_tpch_q1", "q_cosine_topk", "q_triangles"
    }
    assert set(d["queries_spread"]) == set(d["queries"])
    for name, med in d["queries"].items():
        s = d["queries_spread"][name]
        assert s["n"] == 3, (name, s)
        assert s["min"] <= med <= s["max"], (name, med, s)


@pytest.mark.slow
def test_soak_label_and_triangle_streams_30_batches(spark, make_graph, tmp_path):
    """Round-5 soak for the K4/K5 stream states (the round-3 long-stream
    bug class was only gated for K6): 30 micro-batches through
    run_state_stream with K4 + K5 + K6 states sharing one feed —
    bounded persistent blocks, flat per-batch wall, exact (K4/K6) or
    stable (K5) final state vs cold recompute."""
    from dynamicppr_spark.operators.lpa import label_propagation
    from dynamicppr_spark.streaming.updates import (
        UPDATE_SCHEMA,
        ComponentsStreamState,
        LPAStreamState,
        TriangleStreamState,
        run_state_stream,
    )

    edges, n = fixtures.rmat_graph(n=60, m=260, seed=31)
    rng = np.random.default_rng(37)
    cur_set = {tuple(e) for e in np.unique(edges, axis=0)}
    base_ts = 1_700_000_000
    feed = tmp_path / "feed"
    feed.mkdir()
    for b in range(30):
        rows = []
        for _ in range(3):
            if cur_set and rng.random() < 0.4:
                s, d = list(cur_set)[int(rng.integers(0, len(cur_set)))]
                rows.append(("-", int(s), int(d)))
                cur_set.discard((s, d))
            else:
                s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
                if s != d:
                    rows.append(("+", s, d))
                    cur_set.add((s, d))
        bdf = spark.createDataFrame(
            [(b, op, s, d) for op, s, d in rows],
            "batch_id bigint, op string, src bigint, dst bigint",
        ).withColumn("ts", F.timestamp_seconds(F.lit(base_ts + b)))
        bdf.coalesce(1).write.mode("append").parquet(str(feed))

    class Timed:
        """Wrapper proving run_state_stream's any-.apply contract while
        recording per-batch wall + block counts."""

        def __init__(self, inner):
            self.inner, self.lat, self.blocks = inner, [], []

        def apply(self, batch_df):
            t0 = time.time()
            self.inner.apply(batch_df)
            self.lat.append(time.time() - t0)
            ids = persistent_rdd_ids(spark.sparkContext)
            self.blocks.append(len(ids) if ids is not None else 0)

    cc = Timed(ComponentsStreamState(make_graph(edges, n)))
    lpa = Timed(LPAStreamState(make_graph(edges, n)))
    tri = Timed(TriangleStreamState(make_graph(edges, n)))
    for name, st in (("cc", cc), ("lpa", lpa), ("tri", tri)):
        stream = spark.readStream.schema(UPDATE_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(feed))
        q = run_state_stream(st, stream, query_name=f"soak_{name}")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert st.inner.batches_applied == 30

    final_edges = np.array(sorted(cur_set), dtype=np.int64)
    # K4 exact
    want_cc = oracle.connected_components(final_edges, n)
    got_cc = df_to_map(cc.inner.labels, ["vid"], "component")
    assert got_cc == {v: int(want_cc[v]) for v in range(n)}
    # K6 exact
    assert tri.inner.count == oracle.triangle_count(final_edges, n)
    # K5 stable: one more warm until-stable run is a no-op
    again = label_propagation(
        lpa.inner.graph, n_iter=50, init_labels=lpa.inner.labels,
        until_stable=True,
    )
    assert df_to_map(again, ["vid"], "label") == df_to_map(
        lpa.inner.labels, ["vid"], "label"
    )

    for st in (cc, lpa, tri):
        q4 = max(1, len(st.blocks) // 4)
        assert max(st.blocks[-q4:]) <= max(st.blocks[:q4]) + 10, (
            st.blocks[:q4], st.blocks[-8:]
        )
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        assert med(st.lat[-q4:]) <= 3.0 * med(st.lat[:q4]) + 1.0, (
            med(st.lat[:q4]), med(st.lat[-q4:])
        )
    for st in (cc, lpa, tri):
        st.inner.graph.release()


def test_dedup_corpus_two_stage(spark):
    """dedup_corpus removes exact dups (keep min doc_id per normalized
    text) and LSH near-dups (keep the cluster's canonical min doc_id),
    keeps uniques, and preserves the original columns of survivors."""
    from dynamicppr_spark.functions import dedup as D

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    base = " ".join(rng.choice(vocab, size=60))
    near = base.split()
    near[5] = "CHANGED"
    near = " ".join(near)
    uniq1 = " ".join(rng.choice(vocab, size=60))
    uniq2 = " ".join(rng.choice(vocab, size=60))
    rows = [
        (10, base, "en"),
        (11, "  " + base.upper() + "  ", "en"),  # exact dup after norm
        (12, near, "en"),                        # near dup of 10
        (13, uniq1, "en"),
        (14, uniq2, "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    # sanity: the near pair really is an LSH candidate on this fixture
    prs = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()
    }
    assert (10, 12) in prs

    out = D.dedup_corpus(docs).collect()
    assert {r.doc_id for r in out} == {10, 13, 14}
    by_id = {r.doc_id: r for r in out}
    assert by_id[10].text == base and by_id[10].lang == "en"

    # idempotent: a second pass removes nothing
    again = D.dedup_corpus(spark.createDataFrame(out))
    assert {r.doc_id for r in again.collect()} == {10, 13, 14}


def test_stream_dedup_matches_cold_lsh_clusters(spark, tmp_path):
    """DedupStreamState under an in-order document feed: the maintained
    clusters equal the cold ``lsh_dup_clusters`` of the full corpus
    EXACTLY (caps keep smallest doc_ids, so in-order arrival never
    evicts and the per-batch pair extraction telescopes to the batch
    pair set), and ``release`` frees the state's blocks."""
    from dynamicppr_spark.functions.dedup import lsh_dup_clusters
    from dynamicppr_spark.streaming.updates import (
        DOC_STREAM_SCHEMA,
        DedupStreamState,
        run_dedup_stream,
    )

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(300)]

    texts: dict[int, str] = {}
    rows = []
    base_ts = 1_700_000_000
    did = 0
    for b in range(6):
        for j in range(4):
            if did >= 5 and j == 1:  # exact dup of an earlier doc
                t = texts[int(rng.integers(0, did - 1))]
            elif did >= 5 and j == 2:  # near dup of an earlier doc
                w = texts[int(rng.integers(0, did - 1))].split()
                w[3] = f"x{did}"
                t = " ".join(w)
            else:
                t = " ".join(rng.choice(vocab, size=30))
            texts[did] = t
            rows.append((b, did, t))
            did += 1

    feed = tmp_path / "docs"
    feed.mkdir()
    for b in range(6):
        spark.createDataFrame(
            [r for r in rows if r[0] == b],
            "batch_id bigint, doc_id bigint, text string",
        ).withColumn(
            "ts", F.timestamp_seconds(F.lit(base_ts + b))
        ).coalesce(1).write.mode("append").parquet(str(feed))

    docs_all = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    want = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in lsh_dup_clusters(docs_all).collect()
    }
    assert want, "fixture must produce at least one dup cluster"

    state = DedupStreamState(spark)
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = run_dedup_stream(state, stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.batches_applied == 6
    assert state.docs_seen == len(texts)
    got = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in state.clusters().collect()
    }
    assert got == want

    before = persistent_rdd_ids(spark.sparkContext)
    state.release()
    after = persistent_rdd_ids(spark.sparkContext)
    if before is not None and after is not None:
        # the sigs/pairs/base checkpoints and the inner CC blocks are gone
        assert len(after) < len(before)


def test_kmv_distinct_exact_and_estimated(spark):
    """KMV sketch (functions/sketch.py): exact below k, and above k the
    Spark estimate equals a pure-Python recomputation of the SAME
    md5-order-statistic estimator bit-for-bit (strong oracle — the DuckDB
    side is the driver's events_kmv_users row), with the estimate itself
    inside the ~4-sigma KMV error band around the true distinct count."""
    import hashlib

    from dynamicppr_spark.functions.sketch import _HASH_SPAN, kmv_distinct

    def py_kmv(values, k):
        hs = sorted(
            {
                int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                for v in values
            }
        )[:k]
        n, kth = len(hs), hs[-1]
        est = float(n) if n < k else round((k - 1) * _HASH_SPAN / kth, 6)
        return n, kth, est

    # below k: exact
    small = [f"u{i}" for i in range(40)] * 3  # 40 distinct, repeated
    row = kmv_distinct(
        spark.createDataFrame([(v,) for v in small], "user_id string"),
        "user_id",
        k=256,
    ).collect()[0]
    assert (row.n_hashes, row.est_distinct) == (40, 40.0)
    assert (row.n_hashes, row.kth_hash, row.est_distinct) == py_kmv(
        small, 256
    )

    # above k: estimator parity + accuracy (true=5000, k=256 -> RSE ~6.3%)
    big = [f"user-{i}" for i in range(5000)] * 2
    row = kmv_distinct(
        spark.createDataFrame([(v,) for v in big], "user_id string"),
        "user_id",
        k=256,
    ).collect()[0]
    n, kth, est = py_kmv(big, 256)
    assert (row.n_hashes, row.kth_hash, row.est_distinct) == (n, kth, est)
    assert abs(est - 5000) / 5000 < 0.25


def test_hash_and_stratified_sampling(spark):
    """Deterministic samplers (functions/sample.py): membership parity
    with a pure-Python md5 recomputation (engine-reproducibility is the
    point — Spark's df.sample changes under repartition, these cannot),
    exact per-group quota, small-group keep-all, and a narrow no-shuffle
    plan for the Bernoulli path."""
    import hashlib

    from dynamicppr_spark.functions.sample import (
        hash_sample,
        stratified_sample,
    )
    from dynamicppr_spark.functions.sketch import _HASH_SPAN

    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    rows = [(i, f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, grp string")

    got = sorted(r.id for r in hash_sample(df, "id", 0.25).collect())
    thr = int(0.25 * _HASH_SPAN)
    assert got == sorted(i for i, _ in rows if h(i) < thr)
    # pure filter: no exchange in the plan
    plan = hash_sample(df, "id", 0.25)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)

    got2 = sorted(
        (r.grp, r.id)
        for r in stratified_sample(df, ["grp"], "id", 20).collect()
    )
    want2 = []
    for g in ("g0", "g1", "g2"):
        ids = sorted((h(i), i) for i, gg in rows if gg == g)[:20]
        want2 += [(g, i) for _, i in ids]
    assert got2 == sorted(want2)
    # small group: keep all 5 rows, no over/under-selection
    small = spark.createDataFrame(
        [(i, "only") for i in range(5)], "id bigint, grp string"
    )
    assert stratified_sample(small, ["grp"], "id", 20).count() == 5


def test_kmv_distinct_by_groups(spark):
    """Grouped KMV parity with pure-Python per-group recomputation, and
    the mergeability claim: union-sort-slice of two partials' hs arrays
    equals the sketch of the union (what a 100 TB shard rollup does)."""
    import hashlib

    from dynamicppr_spark.functions.sketch import _HASH_SPAN, kmv_distinct_by

    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    k = 16
    rows = [(f"g{i % 2}", f"u{i % 37}") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    got = {
        r.grp: (r.n_hashes, r.kth_hash, r.est_distinct)
        for r in kmv_distinct_by(df, ["grp"], "uid", k=k).collect()
    }

    def py(vals):
        hs = sorted({h(v) for v in vals})[:k]
        n, kth = len(hs), hs[-1]
        est = float(n) if n < k else round((k - 1) * _HASH_SPAN / kth, 6)
        return n, kth, est, hs

    for g in ("g0", "g1"):
        n, kth, est, _ = py([u for gg, u in rows if gg == g])
        assert got[g] == (n, kth, est)

    # mergeability: sketch(A) U sketch(B) -> sketch(A U B)
    a = [f"u{i}" for i in range(30)]
    b = [f"u{i}" for i in range(20, 55)]
    *_, hs_a = py(a)
    *_, hs_b = py(b)
    merged = sorted(set(hs_a) | set(hs_b))[:k]
    *_, hs_union = py(a + b)
    assert merged == hs_union


def test_soak_dedup_stream_30_batches(spark, tmp_path):
    """Extend the 30-batch soak discipline to the newest stream state:
    DedupStreamState over a 150-doc in-order feed — bounded persistent
    blocks, flat per-batch wall, and exact final-cluster parity with the
    cold lsh_dup_clusters of the full corpus."""
    from dynamicppr_spark.functions.dedup import lsh_dup_clusters
    from dynamicppr_spark.streaming.updates import (
        DOC_STREAM_SCHEMA,
        DedupStreamState,
        run_dedup_stream,
    )

    rng = np.random.default_rng(91)
    vocab = np.array([f"w{i}" for i in range(60)])
    texts: dict[int, str] = {}
    rows = []
    base_ts = 1_700_000_000
    did = 0
    for b in range(30):
        for j in range(5):
            if did >= 8 and j == 1:  # exact dup of an earlier doc
                t = texts[int(rng.integers(0, did - 1))]
            elif did >= 8 and j == 2:  # near dup of an earlier doc
                w = texts[int(rng.integers(0, did - 1))].split()
                w[4] = f"x{did}"
                t = " ".join(w)
            else:
                t = " ".join(rng.choice(vocab, size=25))
            texts[did] = t
            rows.append((b, did, t))
            did += 1

    feed = tmp_path / "docs30"
    feed.mkdir()
    for b in range(30):
        spark.createDataFrame(
            [r for r in rows if r[0] == b],
            "batch_id bigint, doc_id bigint, text string",
        ).withColumn(
            "ts", F.timestamp_seconds(F.lit(base_ts + b))
        ).coalesce(1).write.mode("append").parquet(str(feed))

    state = DedupStreamState(spark)
    lat, blocks = [], []
    orig_apply = state.apply

    def timed_apply(batch_df):
        t0 = time.time()
        orig_apply(batch_df)
        lat.append(time.time() - t0)
        ids = persistent_rdd_ids(spark.sparkContext)
        blocks.append(len(ids) if ids is not None else 0)

    state.apply = timed_apply
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = run_dedup_stream(state, stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.batches_applied == 30
    assert state.docs_seen == 150

    docs_all = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    want = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in lsh_dup_clusters(docs_all).collect()
    }
    assert want, "fixture must produce dup clusters"
    got = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in state.clusters().collect()
    }
    assert got == want

    q4 = max(1, len(blocks) // 4)
    assert max(blocks[-q4:]) <= max(blocks[:q4]) + 10, (blocks[:q4], blocks[-8:])
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    assert med(lat[-q4:]) <= 3.0 * med(lat[:q4]) + 1.0, (
        med(lat[:q4]), med(lat[-q4:])
    )
    state.release()


def test_hash_split_deterministic_bands(spark):
    """hash_split: every row lands in exactly one split, membership is a
    pure function of the id (stable under repartition AND under corpus
    growth — adding rows never reassigns existing ones), proportions
    concentrate near the weights, weight validation is loud."""
    from dynamicppr_spark.functions.sample import hash_split

    df = spark.createDataFrame([(i,) for i in range(4000)], "id bigint")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.id: r.split for r in hash_split(df, "id", w).collect()}
    assert set(got.values()) <= set(w)
    frac = {s: sum(1 for v in got.values() if v == s) / 4000 for s in w}
    for s, p in w.items():
        assert abs(frac[s] - p) < 0.03, frac
    # growth-stability: the first half alone gets identical assignments
    half = spark.createDataFrame([(i,) for i in range(2000)], "id bigint")
    got_half = {r.id: r.split for r in hash_split(half, "id", w).collect()}
    assert got_half == {i: got[i] for i in range(2000)}
    # repartition-stability
    got_rep = {
        r.id: r.split
        for r in hash_split(df.repartition(13), "id", w).collect()
    }
    assert got_rep == got
    with pytest.raises(ValueError):
        hash_split(df, "id", {"a": 0.5, "b": 0.4})


def test_run_corpus_pipeline_job(spark, tmp_path, monkeypatch, capsys):
    """jobs/run_corpus_pipeline.py end-to-end in-process (getOrCreate
    reuses the test session): dedup -> quota -> split -> partitioned
    parquet + one JSON metrics line, with counts matching the same ops
    composed inline (the job adds wiring, not semantics)."""
    import json as _json
    import sys

    from dynamicppr_spark.functions.dedup import dedup_corpus
    from dynamicppr_spark.functions.sample import hash_split, stratified_sample
    from jobs.run_corpus_pipeline import main

    out = tmp_path / "corpus"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_corpus_pipeline.py",
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--quota-col", "lang",
            "--quota", "60",
        ],
    )
    main()
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    m = _json.loads(line)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = hash_split(
        stratified_sample(dedup_corpus(docs), ["lang"], "doc_id", 60),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    want_split = {
        r["split"]: r["n"]
        for r in want.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert m["docs_in"] == docs.count()
    assert m["per_split"] == want_split
    assert m["docs_out"] == sum(want_split.values())
    got = spark.read.parquet(str(out))
    assert got.count() == m["docs_out"]
    assert "split" in got.columns


def test_code_stats_exact(spark):
    """with_code_stats on a handcrafted snippet: exact line/comment/
    length/identifier counts (the code-corpus quality columns), empty
    and no-newline edge cases included."""
    from dynamicppr_spark.functions.text import with_code_stats

    snippet = "# header\n  // note\nx = foo_bar(1)\n\nreturn x"
    rows = [(0, snippet), (1, "oneline"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (
            r.n_lines,
            r.n_comment_lines,
            r.max_line_len,
            r.avg_line_len,
            r.n_identifiers,
        )
        for r in with_code_stats(df).collect()
    }
    # snippet lines: '# header'(8), '  // note'(9), 'x = foo_bar(1)'(14),
    # ''(0), 'return x'(8); identifiers: x, foo_bar, return, x — plus
    # header/note inside comments (the regex is lexical, not syntactic)
    assert got[0] == (5, 2, 14, round(39 / 5, 6), 6)
    assert got[1] == (1, 0, 7, 7.0, 1)
    assert got[2] == (1, 0, 0, 0.0, 0)


def test_top_ngrams_exact(spark):
    """top_ngrams: exact bigram counts on a tiny fixture, deterministic
    tie order at the k boundary, zero grams for sub-n-word docs (the
    Spark sequence(1,0)-counts-down trap is guarded)."""
    from dynamicppr_spark.functions.text import top_ngrams

    rows = [
        (0, "a b a b c"),   # 'a b' x2, 'b a', 'b c'
        (1, "a b"),          # 'a b'
        (2, "solo"),         # no bigrams
        (3, ""),             # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [(r.ngram, r.n_occurrences) for r in top_ngrams(df, 2, 3).collect()]
    assert got == [("a b", 3), ("b a", 1), ("b c", 1)]
    # k cuts inside a tie: ('b a', 1) beats ('b c', 1) alphabetically
    got2 = [(r.ngram, r.n_occurrences) for r in top_ngrams(df, 2, 2).collect()]
    assert got2 == [("a b", 3), ("b a", 1)]
    # trigrams
    got3 = [(r.ngram, r.n_occurrences) for r in top_ngrams(df, 3, 5).collect()]
    assert got3 == [("a b a", 1), ("a b c", 1), ("b a b", 1)]


def test_tfidf_terms_exact(spark):
    """tfidf_terms on a tiny fixture: exact tf/df and hand-computed
    ln-weighted values (unique-term idf = ln 3, everywhere-term idf = 0)."""
    import math

    from dynamicppr_spark.functions.text import tfidf_terms

    rows = [(0, "a a b"), (1, "a c"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf)
        for r in tfidf_terms(df).collect()
    }
    ln = math.log
    assert got[(0, "a")] == (2, 3, round(2 * ln(3 / 3), 6))  # idf 0
    assert got[(0, "b")] == (1, 2, round(ln(3 / 2), 6))
    assert got[(1, "c")] == (1, 1, round(ln(3 / 1), 6))
    assert got[(2, "b")] == (1, 2, round(ln(3 / 2), 6))
    assert len(got) == 6  # (0,a),(0,b),(1,a),(1,c),(2,a),(2,b)


def test_top_terms_per_doc_exact(spark):
    """top_terms_per_doc: ranks cut by (tfidf DESC, term ASC) on a
    fixture with an exact tfidf tie inside one doc; k > distinct terms
    keeps all."""
    import math

    from dynamicppr_spark.functions.text import top_terms_per_doc

    # doc 0: 'b' and 'c' tie exactly (tf=1, df=2 each); 'a' has idf 0
    rows = [(0, "a b c"), (1, "a b d"), (2, "a c d")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.tfidf)
        for r in top_terms_per_doc(df, k=2).collect()
    }
    w = round(math.log(3 / 2), 6)
    assert got[(0, 1)] == ("b", w)  # tie -> alphabetical
    assert got[(0, 2)] == ("c", w)
    assert got[(1, 1)] == ("b", w)
    assert got[(2, 1)] == ("c", w)
    # k larger than the doc's term count: all terms come back
    all3 = [
        r.rank
        for r in top_terms_per_doc(df, k=10).filter(F.col("doc_id") == 0).collect()
    ]
    assert sorted(all3) == [1, 2, 3]


def test_ppr_resume_restores_manifest_params(spark, make_graph, tmp_path):
    """PPREngine.resume without explicit hyperparameters restores alpha,
    eps AND sources from the checkpoint manifest, and the resumed run's
    converged scores equal a straight uninterrupted run's exactly (the
    supersteps are value-deterministic, so identical configuration =>
    identical trajectory). Guards the silent-divergence hazard where a
    resumed engine defaulted to eps=1e-6 against an eps=1e-4 original."""
    from dynamicppr_spark.operators.ppr import PPREngine
    from tests.conftest import scores_to_array

    edges, n = fixtures.two_cliques_bridge()
    g = make_graph(edges, n)
    ck = tmp_path / "ppr_resume"
    # "killed" run: eps/alpha off-default, bounded supersteps
    eng_a = PPREngine(
        g, [0, 7], eps=1e-4, alpha=0.2, max_supersteps=3, ckpt_dir=str(ck)
    )
    eng_a.push_to_convergence()
    assert not eng_a._converged
    # resume with NOTHING but the graph and the checkpoint dir
    eng_b = PPREngine.resume(g, ckpt_dir=str(ck))
    assert eng_b.eps == 1e-4 and eng_b.alpha == 0.2
    assert eng_b.sources == [0, 7]
    assert eng_b.metrics.supersteps == 3
    eng_b.push_to_convergence()
    assert eng_b._converged
    # straight run, same configuration, never killed
    eng_c = PPREngine(g, [0, 7], eps=1e-4, alpha=0.2)
    eng_c.push_to_convergence()
    for s in (0, 7):
        a = scores_to_array(
            eng_b.scores().filter(F.col("source") == s), n
        )
        b = scores_to_array(
            eng_c.scores().filter(F.col("source") == s), n
        )
        np.testing.assert_allclose(a, b, atol=0.0)  # bit-identical
    # explicit kwargs still win over the manifest
    eng_d = PPREngine.resume(g, ckpt_dir=str(ck), eps=5e-3)
    assert eng_d.eps == 5e-3 and eng_d.alpha == 0.2
    # no ckpt_dir is a loud error, not a fresh silent engine
    with pytest.raises(ValueError):
        PPREngine.resume(g)


def test_run_ppr_job_resume(spark, make_graph, tmp_path, monkeypatch, capsys):
    """jobs/run_ppr.py --resume: a killed run (bounded supersteps +
    --ckpt-dir) re-submitted with ONLY --resume --ckpt-dir restores
    sources/alpha/eps from the manifest and converges to the straight
    run's scores. Drives the real argparse entrypoint (getOrCreate
    reuses the test session)."""
    import json as _json
    import sys as _sys

    from jobs.run_ppr import main as run_ppr_main
    from dynamicppr_spark.operators.ppr import PPREngine
    from tests.conftest import scores_to_array

    edges, n = fixtures.two_cliques_bridge()
    rows = [(int(a), int(b)) for a, b in edges]
    epath = str(tmp_path / "edges.parquet")
    spark.createDataFrame(rows, "src bigint, dst bigint").write.parquet(epath)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "scores.parquet")

    # the job stops its session on exit; keep the shared test session alive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    def run(argv):
        monkeypatch.setattr(_sys, "argv", ["run_ppr.py"] + argv)
        run_ppr_main()
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    m1 = run([
        "--edges", epath, "--sources", "0,7", "--eps", "1e-4",
        "--alpha", "0.2", "--max-supersteps", "3", "--ckpt-dir", ck,
    ])
    assert m1["supersteps"] == 3
    m2 = run(["--edges", epath, "--resume", "--ckpt-dir", ck, "--out", out])
    assert m2["sources"] == [0, 7]  # restored from the manifest
    assert m2["supersteps"] > 3
    # straight run, same config, never killed — identical scores
    g = make_graph(edges, n)
    eng = PPREngine(g, [0, 7], eps=1e-4, alpha=0.2)
    eng.push_to_convergence()
    got = spark.read.parquet(out)
    for s in (0, 7):
        a = scores_to_array(got.filter(F.col("source") == s), n)
        b = scores_to_array(eng.scores().filter(F.col("source") == s), n)
        np.testing.assert_allclose(a, b, atol=1e-12)


def test_components_local_mode_matches_df(spark, make_graph):
    """Gated local-mode K4: the driver min-label/pointer-jumping path
    equals the distributed kernel and the numpy oracle exactly — isolated
    vertices (vertex universe >> endpoints) keep their own vid, a long
    path (the pointer-jumping worst case) converges, the gate raises past
    max_local_edges, and 'auto' arbitrates by edge count."""
    from dynamicppr_spark.operators.components import connected_components

    # two components + a long path + isolated vertices 40..49
    edges = [(0, 1), (1, 2), (5, 6)]
    edges += [(10 + i, 11 + i) for i in range(25)]  # path 10..35
    both = edges + [(b, a) for a, b in edges]
    n = 50
    g = make_graph(np.array(sorted(both), dtype=np.int64), n)
    want = oracle.connected_components(np.array(both, dtype=np.int64), n)
    got_local = df_to_map(connected_components(g, mode="local"), ["vid"], "component")
    got_df = df_to_map(connected_components(g), ["vid"], "component")
    assert got_local == {v: int(want[v]) for v in range(n)}
    assert got_local == got_df
    # isolated vertices label themselves
    assert all(got_local[v] == v for v in range(40, 50))
    with pytest.raises(ValueError, match="gated"):
        connected_components(g, mode="local", max_local_edges=3)
    # auto: below the cap -> local result (identical anyway); above -> df
    assert df_to_map(
        connected_components(g, mode="auto"), ["vid"], "component"
    ) == got_local
    assert df_to_map(
        connected_components(g, mode="auto", max_local_edges=3),
        ["vid"],
        "component",
    ) == got_local
    g.release()


def test_components_local_empty_graph(spark):
    """Local-mode K4 on an edgeless graph: every vertex is its own
    component (the empty-collect edge case)."""
    from dynamicppr_spark.graph import LinkGraph
    from dynamicppr_spark.operators.components import connected_components

    g = LinkGraph(
        spark.createDataFrame([], "src bigint, dst bigint"),
        vertices=spark.createDataFrame([(0,), (3,)], "vid bigint"),
        num_partitions=4,
    )
    got = df_to_map(connected_components(g, mode="local"), ["vid"], "component")
    assert got == {0: 0, 3: 3}
    g.release()
