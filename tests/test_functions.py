"""functions/: text analysis, dedup, similarity, multimodal plumbing."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamicppr_spark.functions import dedup as D
from dynamicppr_spark.functions import multimodal as M
from dynamicppr_spark.functions import similarity as S
from dynamicppr_spark.functions import text as T

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over a sleepy dog"),  # near dup of 0
    (3, "el rapido zorro marron salta sobre el perro"),
    (4, "x"),
    (5, "der schnelle braune fuchs springt und das ist gut"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_token_counts(spark, docs):
    got = {r.doc_id: (r.n_tokens, r.n_bpeish) for r in T.with_token_counts(docs).collect()}
    assert got[0] == (9, 9)
    assert got[4] == (1, 1)


def test_quality_monotone(spark, docs):
    q = {r.doc_id: r.quality for r in T.with_quality_score(docs).collect()}
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0
    assert q[0] > q[4]  # real sentence beats single char


def test_lang_id(spark, docs):
    got = {r.doc_id: r.lang_pred for r in T.with_lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "es"
    assert got[5] == "de"
    assert got[4] == "und"


def test_fingerprint_md5_parity(spark, docs):
    got = {r.doc_id: r.fp for r in T.with_fingerprint(docs).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == hashlib.md5(text.strip().lower().encode()).hexdigest()


def test_exact_dedup(spark, docs):
    groups = D.exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 2 and groups[0].keep_doc_id == 0


def test_jaccard_near_dup(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in
             D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_dups(spark, docs):
    cand = {(r.doc_a, r.doc_b) for r in
            D.minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()}
    assert (0, 1) in cand  # exact dups share every band
    assert (0, 3) not in cand


def test_simhash_hamming(spark, docs):
    sim = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(sim[0], sim[1]) == 0  # identical text
    assert ham(sim[0], sim[2]) < ham(sim[0], sim[3])  # near-dup closer


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(30)],
        "vec_id bigint, embedding array<float>, label int",
    )
    got = S.cosine_topk(emb, k=3, n_queries=5).collect()
    v = vecs.astype(np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = v @ v.T
    for q in range(5):
        order = [i for i in np.argsort(-sims[q]) if i != q][:3]
        got_q = sorted(
            [r for r in got if r.query_id == q], key=lambda r: r.rank
        )
        assert [r.vec_id for r in got_q] == order


def test_lsh_ann_recall(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 8)).astype(np.float32)
    # clusters: each vector duplicated with tiny noise => its near neighbor
    noisy = base + rng.standard_normal((20, 8)).astype(np.float32) * 0.01
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(20)] + [
        (100 + i, [float(x) for x in noisy[i]], 0) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    got = S.lsh_topk(emb, k=1, n_planes=4, n_queries=10)
    hits = sum(1 for r in got.collect() if r.rank == 1 and r.vec_id == r.query_id + 100)
    assert hits >= 8  # twin lands in the same bucket nearly always


def test_multimodal_plumbing(spark):
    media = M.synthesize_media(spark, n=32)
    feats = M.extract_features(media, dim=8).collect()
    assert len(feats) == 32
    assert all(len(r.feature) == 8 for r in feats)
    # deterministic: same payload -> same feature
    again = {r.media_id: r.feature for r in M.extract_features(media, dim=8).collect()}
    for r in feats:
        assert again[r.media_id] == r.feature
    frames = M.sample_frames(media, every_ms=500).collect()
    assert len(frames) > 0
    assert all(len(r.frame_sha) == 64 for r in frames)
