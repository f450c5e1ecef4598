"""Relational extensions (SURVEY.md §2d round-4 upgrades): as-of join,
Python UDAF, Python UDTF — each with an exact DuckDB oracle form.

Previously declared n/a; implemented here Spark-first:
  - as-of join = union + running ``last(ignorenulls)`` window — a single
    shuffle on the join keys, no nested-loop/range join, scales as any
    co-partitioned window does (DuckDB oracle: native ASOF JOIN).
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
