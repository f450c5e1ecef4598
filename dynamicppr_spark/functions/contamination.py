"""Benchmark decontamination: flag training documents whose word
k-gram shingles appear in a held-out evaluation set.

The standard LLM training-data hygiene step (e.g. GPT-3 appendix C,
PaLM §C.2, public Dolma/RedPajama pipelines): before training, every
candidate document is scored by the fraction of its n-grams that also
occur in the evaluation benchmarks; documents above a threshold are
dropped or flagged. Here the shingle machinery is shared with the dedup
operators (functions/text.py::shingle_table — md5 k-word shingles,
deduped per doc), so contamination and MinHash dedup read the same
intermediate at pipeline scale.

Scale design (the 100 TB path):
- The eval side is collapsed to DISTINCT shingles before the join, so
  the train-shingle ∘ eval-shingle equi-join has multiplicity exactly 1
  per (train doc, shingle) — a hot shingle shared by every train doc
  and many eval docs CANNOT pair-explode (the classic decontamination
  skew blowup; compare dedup.py's max_df cap, which is a *drop* — here
  dropping would hide contamination, so the join is made safe by
  construction instead).
- Eval sets are benchmarks — tiny next to the corpus — so the distinct
  eval-shingle table is broadcast-joined when under the session's
  autoBroadcastJoinThreshold (AQE decides; no driver collect here).
- One hash-agg per train doc afterwards. No windows, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dynamicppr_spark.functions.sample import hash_split
from dynamicppr_spark.functions.text import shingle_table


def contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-train-doc overlap with the eval set's k-gram shingles.

    Returns one row per train document that has at least k tokens:

      doc_id             bigint — the training document
      n_shingles         bigint — its distinct k-gram shingles
      n_contaminated     bigint — how many also occur anywhere in eval
      contamination_frac double — round(n_contaminated / n_shingles, 6)

    Docs with fewer than k tokens emit no shingles and are absent (they
    cannot be shingle-contaminated), mirroring shingle_table semantics.
    """
    ev = shingle_table(eval_docs, col=col, k=k).select("shingle").distinct()
    tr = shingle_table(train_docs, col=col, k=k)
    joined = tr.join(
        ev.withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_frac",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


def contamination_by_split(
    docs: DataFrame,
    eval_frac: float = 0.1,
    col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Self-contained form: hold out a deterministic md5 hash-split of
    the corpus as the eval set (functions/sample.py::hash_split — pure
    function of doc_id, so the holdout is stable across engines/re-runs)
    and score the remaining documents against it."""
    if not 0.0 < eval_frac < 1.0:
        raise ValueError(f"eval_frac must be in (0,1), got {eval_frac}")
    s = hash_split(docs, "doc_id", {"train": 1.0 - eval_frac, "eval": eval_frac})
    return contamination(
        s.filter(F.col("split") == "train"),
        s.filter(F.col("split") == "eval"),
        col=col,
        k=k,
    )


def contamination_by_split_sql(
    table: str, eval_frac: float = 0.1, k: int = 3
) -> str:
    """DuckDB oracle form of ``contamination_by_split`` (k fixed at 3,
    matching shingle_table's md5 3-gram form used across the oracles)."""
    if k != 3:
        raise ValueError("the SQL oracle form is written for k=3")
    from dynamicppr_spark.functions.sample import hash_split_case_sql

    case = hash_split_case_sql(
        "doc_id", {"train": 1.0 - eval_frac, "eval": eval_frac}
    )
    return f"""
WITH split AS (
  SELECT doc_id, text, {case} AS split FROM {table}
),
toks AS (
  SELECT doc_id, split,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM split
),
sh AS (
  SELECT DISTINCT doc_id, split,
         md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS shingle
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE split = 'eval')
SELECT s.doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_contaminated,
       round(sum(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS contamination_frac
FROM sh s LEFT JOIN ev ON s.shingle = ev.shingle
WHERE s.split = 'train'
GROUP BY s.doc_id
"""
