"""Shared pytest fixtures: one session-scoped SparkSession + helpers."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from dynamicppr_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dynamicppr-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def make_graph(spark):
    """Factory: numpy edge array -> LinkGraph (+ optional full vertex set)."""
    from dynamicppr_spark.graph import LinkGraph

    def _make(edges: np.ndarray, n: int | None = None, **kw) -> LinkGraph:
        rows = [(int(a), int(b)) for a, b in np.asarray(edges).reshape(-1, 2)]
        edf = spark.createDataFrame(rows, schema="src bigint, dst bigint")
        vdf = None
        if n is not None:
            vdf = spark.createDataFrame(
                [(int(v),) for v in range(n)], schema="vid bigint"
            )
        kw.setdefault("num_partitions", 8)
        return LinkGraph(edf, vertices=vdf, **kw)

    return _make


def df_to_map(df, key_cols: list[str], val_col: str) -> dict:
    """Collect a small DataFrame into {key_tuple_or_scalar: value}."""
    rows = df.collect()
    if len(key_cols) == 1:
        return {r[key_cols[0]]: r[val_col] for r in rows}
    return {tuple(r[k] for k in key_cols): r[val_col] for r in rows}


def scores_to_array(df, n: int, key: str = "vid", val: str = "score") -> np.ndarray:
    out = np.zeros(n, dtype=np.float64)
    for r in df.collect():
        out[int(r[key])] = float(r[val])
    return out
