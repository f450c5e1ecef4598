"""Deterministic sampling for training-data pipelines.

A 100 TB corpus pipeline samples constantly — eval splits, ablation
subsets, per-source quotas — and the sample must be REPRODUCIBLE across
engines and re-runs (Spark's ``df.sample`` is neither: it is seeded per
partition-split, so a repartition changes the sample). Both samplers here
key on the repo-wide md5 hash family (functions/sketch.py), so the same
rows are selected by Spark, DuckDB, and any future engine, and the driver
checks them value-exactly.

- ``hash_sample``: Bernoulli(p) by hash threshold — a pure narrow filter
  (no shuffle, no RNG state, pushes to the scan), the canonical "take a
  deterministic 1% of the corpus" op. Consistent across tables: sampling
  two tables on a shared key yields aligned rows (the classic
  join-preserving sampler).
- ``stratified_sample``: exactly min(m, |group|) rows per group, chosen
  as the m hash-smallest — per-source/per-language quotas without a
  window over the full group (the skew-killer at scale): the per-group
  threshold comes from the salted two-level k-min
  (sketch.two_level_kmin, every task bounded by m x salts rows), then one
  equi-join back and a filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dynamicppr_spark.functions.sketch import (
    _HASH_SPAN,
    _kmv_hash,
    two_level_kmin,
)


def hash_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose 60-bit md5 hash of
    ``id_col`` falls below rate * 2^60. The md5 order statistic is
    uniform, so the kept fraction concentrates at ``rate``
    (+- ~1/sqrt(rate*n)); identical membership on every engine/run."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_kmv_hash(id_col) < F.lit(int(rate * _HASH_SPAN)))


def hash_sample_pred_sql(id_col: str, rate: float) -> str:
    """The DuckDB predicate form of ``hash_sample`` (same hash, same
    threshold) — compose into an oracle WHERE clause."""
    thr = int(rate * _HASH_SPAN)
    return (
        f"('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT"
        f" < {thr}"
    )


def hash_split(
    df: DataFrame, id_col: str, splits: dict[str, float]
) -> DataFrame:
    """Deterministic dataset split: adds a ``split`` column assigning each
    row to one named split with the given probabilities (must sum to 1),
    by which band of the hash space md5(id) lands in. The eval-split
    primitive: membership is a pure function of the row key, so train/val
    /test never leak into each other across engines, re-runs, or
    repartitions — and adding rows later never reassigns existing ones.
    Bands are laid out in sorted-name order for determinism."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _kmv_hash(id_col)
    expr = None
    acc = 0.0
    names = sorted(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = h < F.lit(int(acc * _HASH_SPAN))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_split_case_sql(id_col: str, splits: dict[str, float]) -> str:
    """The DuckDB CASE expression form of ``hash_split``'s ``split``
    column (same hash, same band edges, same name order)."""
    h = (
        f"('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT"
    )
    names = sorted(splits)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += splits[name]
        whens.append(f"WHEN {h} < {int(acc * _HASH_SPAN)} THEN '{name}'")
    body = " ".join(whens)
    return f"CASE {body} ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame, group_cols: list[str], id_col: str, m: int
) -> DataFrame:
    """Exactly min(m, group size) rows per group: the m hash-smallest
    ``id_col`` rows. Requires ``id_col`` unique per row (a row key like
    event_id/doc_id) — duplicate ids tie in hash order and would
    over-select. DuckDB oracle: QUALIFY row_number() OVER (PARTITION BY
    group ORDER BY hash) <= m, identical because hashes of distinct ids
    are distinct in practice and compared engine-independently.

    Scale shape: one narrow hash projection, the bounded two-level k-min
    per group for the threshold table (small: one row per group), an
    equi-join back on the group key (AQE broadcasts when small), and a
    filter. No window over full groups, so a billion-row group costs the
    same per-task memory as a thousand-row one.
    """
    base = df.withColumn("_h", _kmv_hash(id_col))
    thr = two_level_kmin(
        base.select(*group_cols, "_h"), group_cols, "_h", m
    ).select(
        *group_cols, F.element_at("hs", F.size("hs")).alias("_thr")
    )
    return (
        base.join(thr, group_cols)
        .filter(F.col("_h") <= F.col("_thr"))
        .drop("_h", "_thr")
    )
