"""Relational extensions (SURVEY.md §2d rounds 4-5): as-of join, range
(interval) join, Python UDAF, Python UDTF — each with an exact DuckDB
oracle form.

Previously declared n/a; implemented here Spark-first:
  - as-of join = union + running last-struct window — a single
    shuffle on the join keys, no nested-loop join, scales as any
    co-partitioned window does (DuckDB oracle: native ASOF JOIN).
  - range join = bucketed equi-join (left intervals explode over their
    covered time buckets) + exact post-filter — no nested-loop/cartesian
    (DuckDB oracle: plain inequality-predicate join).
  - UDAF = grouped-agg pandas UDF (Arrow-batched, no per-row Python).
    The demo aggregate is the MEDIAN — order-free, so bit-exact across
    engines (no accumulation-order ulps to paper over).
  - UDTF = PySpark 4 ``@udtf`` lateral table function. The demo splits
    text on single spaces (matching SQL ``string_split(text, ' ')``
    exactly, empties included).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf, udtf


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str,
    right_values: list[str],
    suffix: str = "_asof",
    check_unique_right: bool = False,
) -> DataFrame:
    """For each left row: the ``right_values`` of the LATEST right row
    with ``right.ts <= left.ts`` (inclusive) sharing ``keys`` — NULLs if
    no such row.

    Plan shape: tag-union the two inputs, one window over (keys) ordered
    by (ts, side) carrying the latest right ROW forward as a struct, keep
    left rows. ONE shuffle on the keys; no nested-loop or range join, so
    it survives a 100x scale-up the same way any keyed window does.
    Inclusive tie: right rows sort before left rows at equal ts.

    The right row travels as a single non-null STRUCT, so a NULL value in
    the latest matching row is returned as-is (standard ASOF semantics,
    matching DuckDB's native ASOF JOIN) instead of ``ignorenulls``
    skipping back to an older non-null value.

    Right rows must be unique per (keys, ts) — a violation silently
    multiplies left rows through the union-window. ``check_unique_right``
    (opt-in: one extra aggregate job) asserts the precondition loudly."""
    if check_unique_right:
        n_dup = (
            right.groupBy(*keys, ts)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if n_dup:
            raise ValueError(
                "asof_join: right side has duplicate rows per "
                f"({', '.join(keys)}, {ts}) — pre-aggregate the right side "
                "(each duplicate multiplies matching left rows)"
            )
    lcols = list(left.columns)
    rrow = F.struct(*[F.col(v).alias(v) for v in right_values])
    r = right.select(*keys, ts, rrow.alias("_rrow"))
    l = left.withColumn(
        "_rrow", F.lit(None).cast(r.schema["_rrow"].dataType)
    ).withColumn("_side", F.lit(1))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("_side", F.lit(0)).select(*l.columns)
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(F.col("_rrow"), ignorenulls=True).over(w)
    return (
        u.withColumn("_carried", carried)
        .filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[
                F.col("_carried").getField(v).alias(f"{v}{suffix}")
                for v in right_values
            ],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Interval (range) join: every (left, right) pair sharing ``keys``
    with ``right.right_ts`` in ``[left.left_ts + lower_s, left.left_ts +
    upper_s]`` (inclusive, seconds). Completes the §2d theta/range-join
    category — the one the round-4 verdict left open.

    Plan shape — the classic bucketed range join (what a range-join hint
    does under the hood): timestamps are bucketed at ``bucket_s`` width
    (default: the interval width, so each left row covers <= 2 buckets);
    each left row EXPLODES over the buckets its interval overlaps (a
    bounded constant ~2-3), the join is a plain EQUI-join on
    (keys..., bucket), and the exact range predicate filters after. One
    keyed shuffle, no nested-loop/cartesian — it scales like any hash
    join, where a naive theta join is O(n_l * n_r) per key. Pick
    ``bucket_s`` ~ the interval width: wider buckets cut the explode
    factor but grow the post-filter candidate set.

    All arithmetic is in MICROSECONDS (``unix_micros``; NTZ inputs
    are cast — a constant offset cancels in the range predicate): the range
    predicate is exact at full timestamp precision, so SQL ``BETWEEN`` on
    timestamps reproduces it bit-for-bit (the oracle device)."""
    if upper_s < lower_s:
        raise ValueError("range_join: upper_s < lower_s (empty interval)")
    lo_us, up_us = lower_s * 1_000_000, upper_s * 1_000_000
    b = (int(bucket_s) if bucket_s else max(1, upper_s - lower_s)) * 1_000_000
    def _bucket_of(x):
        # exact integer division for non-negative longs: (x - x % b) is an
        # exact multiple, and a double quotient that IS an integer < 2^53
        # rounds to itself — no float boundary flips at exact multiples
        return ((x - x % F.lit(b)) / F.lit(b)).cast("long")

    lo = F.unix_micros(F.col(left_ts).cast("timestamp")) + F.lit(lo_us)
    hi = F.unix_micros(F.col(left_ts).cast("timestamp")) + F.lit(up_us)
    l = left.withColumn(
        "_bucket", F.explode(F.sequence(_bucket_of(lo), _bucket_of(hi)))
    )
    r = right.withColumn(
        "_bucket", _bucket_of(F.unix_micros(F.col(right_ts).cast("timestamp")))
    ).select(
        *keys,
        "_bucket",
        *[
            F.col(c).alias(f"_r_{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    rts = F.unix_micros(F.col(f"_r_{right_ts}").cast("timestamp"))
    joined = l.join(r, [*keys, "_bucket"]).filter(
        (rts >= F.unix_micros(F.col(left_ts).cast("timestamp")) + F.lit(lo_us))
        & (rts <= F.unix_micros(F.col(left_ts).cast("timestamp")) + F.lit(up_us))
    )
    return joined.drop("_bucket")


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Python UDAF (grouped-agg pandas UDF): median of a double column.

    Median is order-free — ``np.median`` equals SQL ``median`` /
    ``quantile_cont(0.5)`` bit-exactly (mean of the two middle doubles on
    even counts), so the oracle comparison needs no rounding slack."""
    clean = v.dropna()
    return float(np.median(clean.to_numpy())) if len(clean) else None


@udtf(returnType="pos: int, word: string")
class SplitWordsUDTF:
    """Python UDTF: one output row per single-space-delimited token.

    Splits on ``' '`` exactly (empties kept) so SQL
    ``unnest(string_split(text, ' ')) WITH position`` reproduces it
    verbatim — the oracle device for the UDTF surface."""

    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split(" ")):
            yield (i, w)


def register_udtfs(spark) -> None:
    """Register lateral table functions for SQL use."""
    spark.udtf.register("split_words", SplitWordsUDTF)
