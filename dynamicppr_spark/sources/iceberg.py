"""Iceberg-shaped source adapter (BASELINE.json: "Iceberg table of
source-code repositories (repo, path, commit, lang, content)").

The production corpus is an Iceberg catalog table — partition pruning +
min/max file skipping come free through Spark's DSv2 scan once the
iceberg-spark-runtime jar is on the classpath. This container ships no
Iceberg jar, so the reader degrades gracefully:

  1. catalog table name  -> spark.read.table(name)   (Iceberg/DSv2)
  2. directory/file path -> spark.read.parquet(path) (sandbox test data)

Column pruning + predicate pushdown are asserted by
tests/test_partitioning.py::test_scan_pushdown on the parquet path; the
Iceberg path uses the same DataFrame plan, so the same pruning applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

REPO_FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def read_repo_files(
    spark: SparkSession,
    source: str,
    langs: list[str] | None = None,
) -> DataFrame:
    """Load the repo_files corpus from an Iceberg table name or a parquet
    path, projecting exactly the engine's columns (scan-level pruning)."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    df = df.select(*REPO_FILES_COLUMNS)
    if langs:
        df = df.filter(F.col("lang").isin(langs))  # pushed to the scan
    return df
