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
) -> DataFrame:
    """For each left row: the ``right_values`` of the LATEST right row
    with ``right.ts <= left.ts`` (inclusive) sharing ``keys`` — NULLs if
    no such row.

    Plan shape: tag-union the two inputs, one window over (keys) ordered
    by (ts, side) with ``last(..., ignorenulls=True)`` carrying the right
    values forward, keep left rows. ONE shuffle on the keys; no
    nested-loop or range join, so it survives a 100x scale-up the same
    way any keyed window does. Inclusive tie: right rows sort before left
    rows at equal ts. Right rows must be unique per (keys, ts)
    (pre-aggregate otherwise) and NULL right values are treated as
    absent (ignorenulls carries the previous value past them)."""
    lcols = list(left.columns)
    l = left
    for v in right_values:
        l = l.withColumn(f"_rv_{v}", F.lit(None).cast(right.schema[v].dataType))
    l = l.withColumn("_side", F.lit(1))
    r = right.select(
        *keys, ts, *[F.col(v).alias(f"_rv_{v}") for v in right_values]
    )
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
    out = u
    for v in right_values:
        out = out.withColumn(
            f"{v}{suffix}",
            F.last(F.col(f"_rv_{v}"), ignorenulls=True).over(w),
        )
    return out.filter(F.col("_side") == 1).select(
        *lcols, *[f"{v}{suffix}" for v in right_values]
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
