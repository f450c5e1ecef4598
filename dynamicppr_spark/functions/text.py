"""Text-analysis operators over the ``documents`` table — training-data
pipeline primitives (language ID, quality scoring, token counting,
fingerprinting). All built-in pyspark.sql.functions (JVM-side, codegen) so
each has an exact DuckDB SQL oracle; no Python in the hot path.

Scale: every operator here is a narrow per-row projection — no shuffle,
full predicate/column pushdown to the parquet scan.
"""

from __future__ import annotations

import pandas as pd
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


def with_lang_id(
    docs: DataFrame, col: str = "text", model: "NgramNBModel | None" = None
) -> DataFrame:
    """+ lang_pred.

    Default: the deterministic marker-stopword heuristic (pure built-ins,
    exact SQL oracle — the driver's ``doc_lang_pred`` query). ``model=``
    swaps in a trained classifier (``NgramNBModel``) evaluated in an
    Arrow-batched pandas UDF — the same plumbing a production fastText/
    CLD3-style model would ride; the classifier travels in the UDF closure
    (a few KB of log-probabilities)."""
    if model is not None:
        from pyspark.sql.types import StringType

        @F.pandas_udf(StringType())
        def _predict(s: pd.Series) -> pd.Series:
            return pd.Series(model.predict(s.fillna("").tolist()))

        return docs.withColumn("lang_pred", _predict(F.col(col)))
    hits = {lang: _stopword_hits(col, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # alphabetical order => first max wins the tie deterministically
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (hits[lang] > 0) & (hits[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return docs.withColumn("lang_pred", pred)


# --------------------------------------------------------------- langid NB
# A tiny deterministic character-trigram Naive Bayes: the model-shaped
# language identifier (the heuristic above is the oracle-checkable
# fallback). Pure numpy, no RNG anywhere — training on the same corpus
# always yields bit-identical log-probabilities.

LANG_SENTENCES: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "we shipped the release notes to every customer yesterday",
        "reading is one of the best ways to learn a language",
        "she walked through the park and watched the birds sing",
        "this document describes how the system handles failures",
        "they finished the project before the deadline with time to spare",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso",
        "enviamos las notas de la version a todos los clientes ayer",
        "leer es una de las mejores maneras de aprender un idioma",
        "ella camino por el parque y miro cantar a los pajaros",
        "este documento describe como el sistema maneja los fallos",
        "terminaron el proyecto antes de la fecha limite con tiempo",
    ],
    "de": [
        "der schnelle braune fuchs springt ueber den faulen hund",
        "wir haben die versionshinweise gestern an alle kunden geschickt",
        "lesen ist eine der besten arten eine sprache zu lernen",
        "sie ging durch den park und hoerte die voegel singen",
        "dieses dokument beschreibt wie das system fehler behandelt",
        "sie beendeten das projekt vor der frist mit zeitreserve",
    ],
    "fr": [
        "le rapide renard brun saute par dessus le chien paresseux",
        "nous avons envoye les notes de version a tous les clients hier",
        "lire est une des meilleures facons d apprendre une langue",
        "elle a marche dans le parc et regarde les oiseaux chanter",
        "ce document decrit comment le systeme gere les pannes",
        "ils ont termine le projet avant la date limite avec de l avance",
    ],
}


def _char_ngrams(text: str, n: int = 3) -> list[str]:
    import re

    t = re.sub(r"\s+", " ", text.strip().lower())
    if len(t) < n:
        return [t] if t else []
    return [t[i : i + n] for i in range(len(t) - n + 1)]


class NgramNBModel:
    """Character n-gram multinomial Naive Bayes over languages.

    ``train`` computes add-one-smoothed log P(ngram | lang) and log priors
    (plain numpy — deterministic, no RNG); ``predict`` scores each text by
    summing the log-probabilities of its KNOWN ngrams (unknown ngrams are
    skipped; a text with no known ngram is 'und'), argmax with
    alphabetical tie-break. Small by construction: langs x vocab doubles."""

    def __init__(self, langs, vocab, log_prior, log_prob, n=3):
        self.langs = langs          # sorted list[str]
        self.vocab = vocab          # dict[str, int]
        self.log_prior = log_prior  # (L,) float64
        self.log_prob = log_prob    # (L, V) float64
        self.n = n

    @classmethod
    def train(
        cls, texts: list[str], labels: list[str], n: int = 3
    ) -> "NgramNBModel":
        import numpy as np

        langs = sorted(set(labels))
        docs_ngrams = [_char_ngrams(t, n) for t in texts]
        vocab: dict[str, int] = {}
        for gs in docs_ngrams:
            for gkey in gs:
                vocab.setdefault(gkey, len(vocab))
        counts = np.zeros((len(langs), len(vocab)))
        n_docs = np.zeros(len(langs))
        li = {l: i for i, l in enumerate(langs)}
        for gs, lab in zip(docs_ngrams, labels):
            n_docs[li[lab]] += 1
            for gkey in gs:
                counts[li[lab], vocab[gkey]] += 1
        log_prob = np.log(
            (counts + 1.0) / (counts.sum(axis=1, keepdims=True) + len(vocab))
        )
        log_prior = np.log(n_docs / n_docs.sum())
        return cls(langs, vocab, log_prior, log_prob, n=n)

    def predict(self, texts: list[str]) -> list[str]:
        import numpy as np

        out = []
        for t in texts:
            idx = [
                self.vocab[gkey]
                for gkey in _char_ngrams(t, self.n)
                if gkey in self.vocab
            ]
            if not idx:
                out.append("und")
                continue
            scores = self.log_prior + self.log_prob[:, idx].sum(axis=1)
            best = float(scores.max())
            # alphabetical tie-break (langs is sorted; argmax takes first)
            out.append(self.langs[int(np.argmax(scores >= best))])
        return out


def train_langid_model(n: int = 3) -> NgramNBModel:
    """The fixture-corpus model: trained on LANG_SENTENCES (deterministic;
    same bits every call). Swap in your own (texts, labels) via
    ``NgramNBModel.train`` for a real corpus."""
    texts, labels = [], []
    for lang, sents in sorted(LANG_SENTENCES.items()):
        texts.extend(sents)
        labels.extend([lang] * len(sents))
    return NgramNBModel.train(texts, labels, n=n)


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
    # explode_outer, not explode: a plain explode makes the optimizer
    # infer a `size(_sh) > 0 AND isnotnull(_sh)` filter and push it below
    # the spread exchange, re-evaluating the whole md5 shingle transform
    # on the single-task scan side (measured 2x on q_hygiene). The n >= k
    # pre-filter in _shingled guarantees non-empty arrays, so the outer
    # variant emits exactly the same rows.
    return _shingled(docs, col=col, k=k).select(
        "doc_id", F.explode_outer("_sh").alias("shingle")
    )


def _shingled(docs: DataFrame, col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, _sh array<string>) — each doc's DISTINCT md5 k-shingles as
    one array, computed NARROWLY (per-doc ``array_distinct`` instead of
    the old explode + global ``.distinct()`` shuffle of |docs x shingles|
    rows — guide §2.4 "remove shuffles outright"; set semantics per doc
    are identical). The input is spread across cores first: the md5
    transform is the expensive part and the single-row-group source would
    otherwise compute it in one scan task (see spread_for_compute).
    Docs with no shingles (fewer than k tokens) are absent."""
    from dynamicppr_spark.plans.partitioning import spread_for_compute

    norm = F.trim(F.lower(F.col(col)))
    toks = F.split(norm, r"\s+")
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - F.lit(k)),
                lambda i: F.md5(
                    F.concat_ws(" ", *[toks[i + F.lit(j)] for j in range(k)])
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = spread_for_compute(docs.select("doc_id", F.col(col)), "doc_id")
    # "has >= 1 shingle" == "has >= k tokens": filter on the CHEAP token
    # count, not on size(_sh) — a size(_sh) predicate is pushed below the
    # spread exchange and re-evaluates the whole md5 shingle transform on
    # the (single-task) scan side (measured 2x on q_hygiene)
    return base.filter(n >= k).select("doc_id", sh.alias("_sh"))


def with_code_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """+ per-document source-code shape stats — the code-corpus quality
    columns (BASELINE.json input_hint: repo files with a ``content``
    column): n_lines, n_comment_lines ('#' or '//' after leading
    whitespace), max_line_len, avg_line_len (round 6), n_identifiers
    ([A-Za-z_][A-Za-z0-9_]* occurrences). A code-LLM pipeline filters on
    exactly these (minified/generated files = huge max_line_len; docs vs
    code = comment ratio; obfuscation = identifier density).

    All built-in higher-order/regex functions (JVM codegen, narrow
    projection, no shuffle) with exact DuckDB oracles: the regexes use
    only syntax Java regex and RE2 agree on.
    """
    lines = F.split(F.col(col), "\n")
    lens = F.transform(lines, lambda l: F.length(l))
    return (
        docs.withColumn("n_lines", F.size(lines).cast("bigint"))
        .withColumn(
            "n_comment_lines",
            F.size(
                F.filter(
                    lines,
                    lambda l: F.ltrim(l).startswith("#")
                    | F.ltrim(l).startswith("//"),
                )
            ).cast("bigint"),
        )
        .withColumn("max_line_len", F.array_max(lens).cast("bigint"))
        .withColumn(
            "avg_line_len",
            F.round(
                F.aggregate(
                    lens, F.lit(0).cast("bigint"), lambda a, x: a + x
                ).cast("double")
                / F.size(lines),
                6,
            ),
        )
        .withColumn(
            "n_identifiers",
            F.regexp_count(
                F.col(col), F.lit(r"[A-Za-z_][A-Za-z0-9_]*")
            ).cast("bigint"),
        )
    )


CODE_STATS_SQL_COLS = """
  len(string_split(text, chr(10))) AS n_lines,
  len(list_filter(string_split(text, chr(10)),
      l -> ltrim(l) LIKE '#%' OR ltrim(l) LIKE '//%')) AS n_comment_lines,
  list_max(list_transform(string_split(text, chr(10)),
      l -> length(l))) AS max_line_len,
  round(CAST(list_sum(list_transform(string_split(text, chr(10)),
      l -> length(l))) AS DOUBLE)
      / len(string_split(text, chr(10))), 6) AS avg_line_len,
  len(regexp_extract_all(text, '[A-Za-z_][A-Za-z0-9_]*'))
      AS n_identifiers"""


def top_ngrams(
    docs: DataFrame, n: int = 2, topk: int = 100, col: str = "text"
) -> DataFrame:
    """Global top-k word n-grams with counts — the vocabulary-building
    primitive (tokenizer/BPE prep counts exactly this table at corpus
    scale). (ngram, n_occurrences), ordered (count DESC, ngram) so ties
    are deterministic and the DuckDB oracle returns the identical set.

    Scale shape: narrow per-row expansion (size-n sliding window via
    transform over a sequence — no join, no UDF), one map-side-combined
    hash aggregation, then a global top-k which Spark executes as
    TakeOrdered (per-partition heap + driver merge of k rows), never a
    full sort of the ngram table.
    """
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) where DuckDB's
    # generate_series(1, 0) is empty — a doc with < n words must yield
    # zero grams on both engines
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(topk)
    )


def top_ngrams_sql(table: str, n: int = 2, topk: int = 100) -> str:
    """DuckDB-exact oracle for ``top_ngrams`` (same tokenization, same
    deterministic tie order)."""
    join_expr = " || ' ' || ".join(f"ws[u.i + {j}]" for j in range(n))
    return f"""
    WITH w AS (
      SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
      FROM {table}
    ),
    g AS (
      SELECT {join_expr} AS ngram
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - {n - 1}, 0)))
             AS u(i)
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM g GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram LIMIT {topk}
    """


def tfidf_terms(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, term, tf, df, tfidf) — per-document TF-IDF term weights,
    the classic sparse document representation (retrieval scoring,
    keyword extraction, cheap near-dup features). tfidf = round(tf *
    ln(n_docs / df), 6); ln on both engines so the DuckDB oracle is
    value-exact.

    Scale shape: narrow token explode, one hash agg on (doc_id, term)
    for tf (map-side combined), one on term for df, an equi-join on term
    (AQE broadcasts the df side when small), and the corpus size joined
    in as a broadcast single-row aggregate — pure dataflow, no windows,
    no driver collect.
    """
    terms = docs.select(
        "doc_id", F.explode(_tokens(col)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = docs.select(
        F.countDistinct("doc_id").cast("double").alias("_n_docs")
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


def tfidf_terms_sql(table: str) -> str:
    """DuckDB-exact oracle for ``tfidf_terms`` (same tokenization, same
    natural-log weighting, same rounding)."""
    return f"""
    WITH t AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM {table}
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM t WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM {table})
    SELECT doc_id, term, tf, df,
           round(tf * ln(n_docs / df), 6) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    """


def top_terms_per_doc(
    docs: DataFrame, k: int = 5, col: str = "text"
) -> DataFrame:
    """(doc_id, rank, term, tfidf) — each document's k highest-TF-IDF
    terms (keyword extraction / document tagging). Deterministic order:
    (tfidf DESC, term ASC), so rank ties cut identically on every engine.

    Scale shape: rides ``tfidf_terms``, then ONE hash agg per doc_id with
    a comparator array_sort + slice — the per-doc buffer is bounded by
    the document's own distinct-term count (bounded by doc length), so
    no window over the corpus-wide term table and no skew beyond the
    longest single document.
    """
    cmp = lambda l, r: (  # noqa: E731 — (tfidf DESC, term ASC) comparator
        F.when(l["tfidf"] > r["tfidf"], -1)
        .when(l["tfidf"] < r["tfidf"], 1)
        .when(l["term"] < r["term"], -1)
        .when(l["term"] > r["term"], 1)
        .otherwise(0)
        .cast("int")
    )
    top = (
        tfidf_terms(docs, col)
        .groupBy("doc_id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("tfidf", "term")), cmp),
                1,
                k,
            ).alias("top")
        )
    )
    return top.select("doc_id", F.posexplode("top")).select(
        "doc_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("col.term").alias("term"),
        F.col("col.tfidf").alias("tfidf"),
    )


def top_terms_per_doc_sql(table: str, k: int = 5) -> str:
    """DuckDB-exact oracle for ``top_terms_per_doc`` (row_number window
    over the same tfidf CTE with the same tie order)."""
    return f"""
    WITH w AS ({tfidf_terms_sql(table)})
    SELECT doc_id,
           CAST(row_number() OVER (
             PARTITION BY doc_id ORDER BY tfidf DESC, term
           ) AS INTEGER) AS rank,
           term, tfidf
    FROM w
    QUALIFY rank <= {k}
    """


# Java-regex ∩ RE2 subset (the with_code_stats discipline): character
# classes, bounded repeats, non-capturing groups and \b only, so Spark and
# DuckDB match the exact same spans.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def redact_pii(docs: DataFrame, col: str = "text") -> DataFrame:
    """PII scrub — the pre-training privacy pass (emails and IPv4
    literals replaced by typed placeholder tokens, counts kept so the
    drop rate is observable per document):

      doc_id         bigint
      n_emails       bigint — email matches in the ORIGINAL text
      n_ipv4         bigint — IPv4 matches in the original text
      text_redacted  string — emails -> <EMAIL>, then IPv4 -> <IP>

    Both counts read the original text (an email's host can never parse
    as a bare IPv4 — the TLD is alphabetic — so the two patterns never
    steal each other's spans). Pure regexp_count/regexp_replace in the
    Java∩RE2 subset: JVM codegen, narrow projection, no shuffle, and the
    identical spans fall out of DuckDB for an exact oracle. A real
    deployment extends the pattern table (phones, SSNs, keys); each new
    pattern is one more column in this same narrow projection.
    """
    c = F.col(col)
    return docs.filter(c.isNotNull()).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.regexp_count(c, F.lit(_PII_EMAIL)).cast("bigint").alias(
            "n_emails"
        ),
        F.regexp_count(c, F.lit(_PII_IPV4)).cast("bigint").alias("n_ipv4"),
        F.regexp_replace(
            F.regexp_replace(c, _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
        ).alias("text_redacted"),
    )


def redact_pii_sql(table: str, col: str = "text") -> str:
    """DuckDB oracle form of ``redact_pii`` (same two patterns; RE2
    matches the same spans as Java regex inside the restricted subset)."""
    e, i = _PII_EMAIL, _PII_IPV4
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all({col}, '{e}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all({col}, '{i}')) AS BIGINT) AS n_ipv4,
       regexp_replace(regexp_replace({col}, '{e}', '<EMAIL>', 'g'),
                      '{i}', '<IP>', 'g') AS text_redacted
FROM {table} WHERE {col} IS NOT NULL"""
