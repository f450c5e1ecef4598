"""Within-document repetition statistics — the Gopher-class quality
signals (Rae et al. 2021 §A1.1; used by MassiveText/Dolma/RedPajama
filters): how dominated a document is by its most frequent token and
word-bigram, and how diverse its vocabulary is. Boilerplate, keyword
stuffing, and generation loops all show up as high top-fraction / low
distinct-ratio long before perplexity filters see them.

Scale design: token and bigram tallies are plain exploded hash-aggs
(map-side combined, shuffled once on (doc_id, gram)); per-doc reduction
is a second hash-agg keyed on doc_id. No windows, no per-row Python —
only counts leave the aggregation, so there is no most-frequent-token
tie to break and the output is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dynamicppr_spark.functions.text import _tokens


def repetition_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """Per-document repetition signals.

      doc_id           bigint
      n_tokens         bigint — whitespace tokens (matches _tokens)
      distinct_tokens  bigint
      distinct_ratio   double — round(distinct/n, 6)
      top_token_frac   double — most frequent token's share of tokens
      top_bigram_frac  double — most frequent bigram's share of the
                                n_tokens-1 bigrams (0.0 for 1-token docs)

    Null-text docs are absent; a whitespace-only doc is one empty token.

    Round-6: computed NARROWLY per document — every signal is a function
    of the doc's own token array, so the old two exploded hash-aggs (four
    shuffles + a join over |docs x tokens| rows) are replaced by in-row
    array ops: n_tokens = size, distinct_tokens = size(array_distinct),
    and each top count = the longest run of equal elements in the SORTED
    token/bigram array (exactly the max group count — integers, so
    bit-identical to the exploded form; guide §2.4 "remove shuffles
    outright"). Input is spread across cores first (the per-doc sort is
    the CPU cost and the one-row-group source scans as one task)."""
    from dynamicppr_spark.plans.partitioning import spread_for_compute

    toks = spread_for_compute(
        docs.filter(F.col(col).isNotNull()).select(
            F.col("doc_id").cast("bigint").alias("doc_id"), F.col(col)
        ),
        "doc_id",
    ).select("doc_id", _tokens(col).alias("_t"))

    def _top_count(arr):
        """Longest run of equal elements in sorted ``arr`` == the max
        multiplicity (0 for an empty array)."""
        return F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("bigint").alias("run"),
                F.lit(0).cast("bigint").alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(acc["prev"] == x, acc["run"] + F.lit(1))
                .otherwise(F.lit(1).cast("bigint"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(acc["prev"] == x, acc["run"] + F.lit(1)).otherwise(
                        F.lit(1).cast("bigint")
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )

    bigrams = F.when(
        F.size("_t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_t") - F.lit(2)),
            lambda i: F.concat_ws(" ", F.col("_t")[i], F.col("_t")[i + F.lit(1)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # groupBy(doc_id) between the token arrays and the stats serves two
    # purposes: (1) duplicate doc_id rows merge their token/bigram
    # MULTISETS exactly like the old exploded hash-aggs (all four signals
    # are order-invariant, and bigrams stay per-row so no cross-row
    # bigram appears); (2) it is a predicate-pushdown BARRIER — a caller
    # filter like top_bigram_frac > 0.9 otherwise pushes below the spread
    # exchange and re-evaluates the whole run-length aggregate on the
    # single-task scan (measured 10s vs 0.8s at bench scale). The groupBy
    # reuses the spread exchange's hashpartitioning(doc_id, cores), so no
    # extra shuffle and no AQE re-coalescing to one partition.
    grouped = toks.select("doc_id", F.col("_t").alias("_t"), bigrams.alias("_bg")).groupBy(
        "doc_id"
    ).agg(
        F.flatten(F.collect_list("_t")).alias("_t"),
        F.flatten(F.collect_list("_bg")).alias("_bg"),
    )
    stats = grouped.select(
        "doc_id",
        F.size("_t").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("_t")).cast("bigint").alias("distinct_tokens"),
        _top_count(F.col("_t")).alias("top_c"),
        _top_count(F.col("_bg")).alias("top_bc"),
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        "distinct_tokens",
        F.round(F.col("distinct_tokens") / F.col("n_tokens"), 6).alias(
            "distinct_ratio"
        ),
        F.round(F.col("top_c") / F.col("n_tokens"), 6).alias("top_token_frac"),
        F.when(F.col("n_tokens") >= 2, F.round(
            F.col("top_bc") / (F.col("n_tokens") - 1), 6,
        )).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )


def repetition_stats_sql(table: str) -> str:
    """DuckDB oracle form of ``repetition_stats``."""
    return f"""
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM {table} WHERE text IS NOT NULL
),
uni AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens,
         count(*)::BIGINT AS distinct_tokens, max(c) AS top_c
  FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, UNNEST(t) AS g FROM toks)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
),
bi AS (
  SELECT doc_id, max(c) AS top_bc
  FROM (
    SELECT doc_id, t[i] || ' ' || t[i+1] AS g, count(*) AS c
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    WHERE len(t) >= 2
    GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT uni.doc_id, n_tokens, distinct_tokens,
       round(distinct_tokens / n_tokens, 6) AS distinct_ratio,
       round(top_c / n_tokens, 6) AS top_token_frac,
       CASE WHEN n_tokens >= 2
            THEN round(COALESCE(top_bc, 0) / (n_tokens - 1), 6)
            ELSE 0.0 END AS top_bigram_frac
FROM uni LEFT JOIN bi ON uni.doc_id = bi.doc_id
"""
