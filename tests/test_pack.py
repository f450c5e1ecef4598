"""Sequence-packing (concat-and-chunk) gates for functions/pack.py.

Oracle: a numpy single-stream prefix sum over token counts — the
two-level bucketed prefix sum in pack_chunks must reproduce it exactly
for any num_buckets (bucket-major order == global doc-id order because
the buckets are doc-id ranges).
"""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.functions.pack import pack_chunks


def _ref_manifest(ids, ntoks, capacity):
    """Single-stream reference: one row per (pack, doc) overlap."""
    rows = set()
    start = 0
    for doc_id, n in sorted(zip(ids, ntoks)):
        if n <= 0:
            continue
        end = start + n
        for p in range(start // capacity, (end - 1) // capacity + 1):
            lo, hi = max(start, p * capacity), min(end, (p + 1) * capacity)
            rows.add((p, doc_id, max(0, p * capacity - start), hi - lo))
        start = end
    return rows


def _corpus(spark, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(60):
        # sparse, non-contiguous ids so range buckets are uneven
        doc_id = int(i * 7 + rng.integers(0, 3))
        n = int(rng.integers(1, 40))
        rows.append((doc_id, " ".join(f"w{j}" for j in range(n)), n))
    rows.append((1000, None, 0))  # null text dropped
    rows.append((1001, "   ", 1))  # whitespace-only: one empty token
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], schema="doc_id bigint, text string"
    )
    ids = [d for d, t, n in rows if t is not None]
    ntoks = [n for d, t, n in rows if t is not None]
    return df, ids, ntoks


def test_pack_chunks_matches_single_stream_reference(spark):
    docs, ids, ntoks = _corpus(spark)
    cap = 16
    got = {
        (r["pack_id"], r["doc_id"], r["slice_start"], r["slice_len"])
        for r in pack_chunks(docs, capacity=cap, num_buckets=7).collect()
    }
    assert got == _ref_manifest(ids, ntoks, cap)


def test_pack_chunks_bucket_invariance(spark):
    """The two-level prefix sum is bucket-count independent."""
    docs, _, _ = _corpus(spark, seed=9)
    base = sorted(
        map(tuple, pack_chunks(docs, capacity=32, num_buckets=1).collect())
    )
    for nb in (3, 64, 1000):
        assert (
            sorted(
                map(
                    tuple,
                    pack_chunks(docs, capacity=32, num_buckets=nb).collect(),
                )
            )
            == base
        )


def test_pack_chunks_pack_and_doc_invariants(spark):
    docs, ids, ntoks = _corpus(spark, seed=11)
    cap = 24
    rows = pack_chunks(docs, capacity=cap, num_buckets=5).collect()
    per_pack, per_doc = {}, {}
    for r in rows:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["slice_len"]
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["slice_len"]
        assert 0 < r["slice_len"] <= cap
        assert 0 <= r["slice_start"]
    # every pack but the last is exactly full; packs are contiguous 0..P-1
    last = max(per_pack)
    assert set(per_pack) == set(range(last + 1))
    assert all(per_pack[p] == cap for p in range(last))
    assert 0 < per_pack[last] <= cap
    # per-doc slice lengths reassemble the doc's token count
    want = {d: n for d, n in zip(ids, ntoks) if n > 0}
    assert per_doc == want


def test_pack_text_reassembles_the_token_stream(spark):
    """Concatenating pack_text in pack order reproduces the corpus token
    stream exactly; every pack but the last is capacity-full."""
    from dynamicppr_spark.functions.pack import pack_text

    docs, ids, ntoks = _corpus(spark, seed=13)
    cap = 16
    rows = sorted(
        pack_text(docs, capacity=cap, num_buckets=5).collect(),
        key=lambda r: r["pack_id"],
    )
    # the reference stream: all docs' lowercased whitespace tokens in
    # doc-id order (empty tokens from whitespace-only docs included,
    # matching _tokens semantics)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter("text IS NOT NULL").collect()
    }
    import re

    stream = []
    for d in sorted(texts):
        stream.extend(re.split(r"\s+", texts[d].strip().lower()))
    got_stream = []
    for i, r in enumerate(rows):
        assert r["pack_id"] == i
        toks = r["pack_text"].split(" ")
        assert len(toks) == r["n_tokens"]
        if i < len(rows) - 1:
            assert r["n_tokens"] == cap
        got_stream.extend(toks)
    assert got_stream == stream


def test_pack_chunks_empty_and_bad_args(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = pack_chunks(empty, capacity=8)
    assert out.columns == ["pack_id", "doc_id", "slice_start", "slice_len"]
    assert out.count() == 0
    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="capacity"):
        pack_chunks(docs, capacity=0)
    with pytest.raises(ValueError, match="num_buckets"):
        pack_chunks(docs, capacity=8, num_buckets=0)
