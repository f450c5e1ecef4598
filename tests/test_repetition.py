"""Repetition-stat gates for functions/repetition.py."""

from __future__ import annotations

from dynamicppr_spark.functions.repetition import repetition_stats


def test_repetition_stats_exact(spark):
    docs = spark.createDataFrame(
        [
            # 6 tokens, 3 distinct; "a" x3; bigram "a a" x2 of 5
            (1, "a a a b c b"),
            # degenerate loop: one token repeated
            (2, "x x x x"),
            # fully diverse
            (3, "p q r s"),
            # single token: no bigrams
            (4, "solo"),
            (5, None),
        ],
        schema="doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["distinct_tokens"],
            r["distinct_ratio"],
            r["top_token_frac"],
            r["top_bigram_frac"],
        )
        for r in repetition_stats(docs).collect()
    }
    assert got == {
        1: (6, 3, 0.5, 0.5, 0.4),
        2: (4, 1, 0.25, 1.0, 1.0),
        3: (4, 4, 1.0, 0.25, round(1 / 3, 6)),
        4: (1, 1, 1.0, 1.0, 0.0),
    }


def test_repetition_stats_case_and_whitespace_normalized(spark):
    """Tokenization matches _tokens: lower-cased, trimmed, any-whitespace
    split — 'The the' is one repeated token."""
    docs = spark.createDataFrame(
        [(1, "  The   the\tTHE  ")], schema="doc_id bigint, text string"
    )
    r = repetition_stats(docs).collect()[0]
    assert (r["n_tokens"], r["distinct_tokens"], r["top_token_frac"]) == (
        3,
        1,
        1.0,
    )
