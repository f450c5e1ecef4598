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


def budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str,
    id_col: str,
    weight_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic per-group WEIGHT-budget sample — the training-mixture
    primitive ("2B tokens of python, 500M of prose"): within each group,
    keep rows in md5-hash order while the EXCLUSIVE running sum of
    ``weight_col`` is below that group's budget. The crossing row is kept
    (a non-empty group with a positive budget always contributes >= 1
    row); groups absent from ``budgets`` are dropped. Membership is a
    pure function of (id, weights, budgets) — identical across engines,
    re-runs, and repartitions, like every sampler here.

    Scale: the naive form is one window over each FULL group (single-task
    skew at a 10^9-row group). Here the hash space is cut into
    ``n_buckets`` ranges: per-(group, bucket) sums roll up in one
    map-side-combined agg, bucket bases come from a window over
    <= n_buckets rows per group, and the within-bucket exclusive cumsum
    windows over hash-UNIFORM slices of ~|group|/n_buckets rows — no
    task ever sees a whole group, no driver collect (the pack_chunks
    two-level prefix-sum discipline, per-group). The input is read twice
    (bucket sums + the join back) — both reads are the same narrow
    (group, id, weight) projection, so column pruning reaches the scan;
    persist the projection upstream if it is expensive to recompute.
    """
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"negative budget for group {g!r}: {b}")
    bwidth = (1 << 60) // n_buckets + 1
    t = df.withColumn("_h", _kmv_hash(id_col)).withColumn(
        "_b", F.expr(f"_h div {bwidth}")  # exact bigint division: a double
        # quotient of a 60-bit hash rounds (2^60 > 2^53) at bucket edges
    )
    over_buckets = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        t.groupBy(group_col, "_b")
        .agg(F.sum(weight_col).alias("_bs"))
        .withColumn(
            "_base", F.coalesce(F.sum("_bs").over(over_buckets), F.lit(0))
        )
        .select(group_col, "_b", "_base")
    )
    within = (
        Window.partitionBy(group_col, "_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in kv]
        ),
        F.col(group_col),
    )
    return (
        t.join(bases, [group_col, "_b"])
        .withColumn(
            "_prev",
            F.col("_base")
            + F.coalesce(F.sum(weight_col).over(within), F.lit(0)),
        )
        .filter(F.col("_prev") < budget)
        .drop("_h", "_b", "_base", "_prev")
    )


def budget_sample_sql(
    inner: str,
    budgets: dict[str, int],
    group_col: str,
    id_col: str,
    weight_col: str,
) -> str:
    """DuckDB oracle form of ``budget_sample`` over subquery ``inner``
    (which must expose group/id/weight cols): the single-window exclusive
    cumsum — same rows, different plan class (the oracle may window whole
    groups; the engine must not)."""
    case = " ".join(
        f"WHEN '{g}' THEN {b}" for g, b in sorted(budgets.items())
    )
    return f"""
WITH t AS ({inner}),
c AS (SELECT *,
        coalesce(sum({weight_col}) OVER (
          PARTITION BY {group_col}
          ORDER BY ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT, {id_col}
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _prev
      FROM t)
SELECT * EXCLUDE (_prev) FROM c
WHERE _prev < CASE {group_col} {case} ELSE -1 END"""
