"""Text-analysis operators over the ``documents`` table — training-data
pipeline primitives (language ID, quality scoring, token counting,
fingerprinting). All built-in pyspark.sql.functions (JVM-side, codegen) so
each has an exact DuckDB SQL oracle; no Python in the hot path.

Scale: every operator here is a narrow per-row projection — no shuffle,
full predicate/column pushdown to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Marker stopwords per language for the n-gram/stopword language heuristic.
# The heuristic is deterministic and mirrored exactly in SQL (oracle): the
# predicted language is the marker set with the most token hits, ties broken
# alphabetically, 'und' (undetermined) when no marker hits at all.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "ein"],
    "fr": ["le", "la", "les", "de", "et", "un", "est", "que"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col: str = "text"):
    """Whitespace tokens of lower-cased text (array<string>)."""
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def with_token_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """+ n_tokens (whitespace) and n_bpeish (regex sub-word) counts."""
    return docs.withColumn(
        "n_tokens", F.size(_tokens(col)).cast("bigint")
    ).withColumn(
        "n_bpeish",
        F.size(F.regexp_extract_all(F.col(col), F.lit(TOKEN_RE), 0)).cast(
            "bigint"
        ),
    )


def _stopword_hits(col: str, words: list[str]):
    inlist = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split(trim(lower({col})), '\\\\s+'), t -> t IN ({inlist})))"
    )


def with_quality_score(docs: DataFrame, col: str = "text") -> DataFrame:
    """+ quality in [0,1]: length, mean-token-length and stopword signals.

    quality = 0.4 * min(n_tokens/64, 1)
            + 0.3 * clamp((mean_tok_len - 2) / 6, 0, 1)
            + 0.3 * min(4 * stopword_ratio, 1)
    Rounded to 6 dp for cross-engine comparison stability.
    """
    toks = _tokens(col)
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("double")
    mean_len = (
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n_tok
    )
    stop_ratio = _stopword_hits(col, STOPWORDS).cast("double") / n_tok
    q = (
        F.lit(0.4) * F.least(n_tok / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3)
        * F.greatest(
            F.least((mean_len - F.lit(2.0)) / F.lit(6.0), F.lit(1.0)), F.lit(0.0)
        )
        + F.lit(0.3) * F.least(F.lit(4.0) * stop_ratio, F.lit(1.0))
    )
    return docs.withColumn("quality", F.round(q, 6))


def with_lang_id(docs: DataFrame, col: str = "text") -> DataFrame:
    """+ lang_pred via the deterministic marker-stopword heuristic."""
    hits = {lang: _stopword_hits(col, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # alphabetical order => first max wins the tie deterministically
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (hits[lang] > 0) & (hits[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return docs.withColumn("lang_pred", pred)


def with_fingerprint(docs: DataFrame, col: str = "text") -> DataFrame:
    """+ fp: md5 of normalized text (exact-dup key), and + min_shingle_fp:
    min md5 over 3-word shingles (order-insensitive near-dup signal)."""
    norm = F.trim(F.lower(F.col(col)))
    toks = F.split(norm, r"\s+")
    n = F.size(toks)
    shingles = F.when(n >= 3, F.transform(
        F.sequence(F.lit(0), n - F.lit(3)),
        lambda i: F.md5(
            F.concat_ws(" ", toks[i], toks[i + F.lit(1)], toks[i + F.lit(2)])
        ),
    )).otherwise(F.array(F.md5(norm)))
    return docs.withColumn("fp", F.md5(norm)).withColumn(
        "min_shingle_fp", F.array_min(shingles)
    )


def shingle_table(docs: DataFrame, col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle_md5) — exploded k-word shingles, deduped per doc.

    Docs with fewer than k tokens emit NO shingles (they opt out of
    shingle-based dedup), mirroring the SQL oracle's ``len(t) >= k``
    guard. The when() also keeps Spark 4 ANSI mode from throwing on the
    out-of-bounds tok[i+j] lookups that an unguarded sequence would hit.
    """
    norm = F.trim(F.lower(F.col(col)))
    toks = F.split(norm, r"\s+")
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.md5(
                F.concat_ws(" ", *[toks[i + F.lit(j)] for j in range(k)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )
