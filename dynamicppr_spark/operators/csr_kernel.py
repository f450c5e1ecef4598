"""CSR-block gather-scatter kernel (BASELINE.json north_star: "per-partition
CSR blocks in DataFrames ... iterated via pandas/Arrow UDF gather-scatter").

The scatter step of PPR/PageRank — frontier residuals fanning out along
out-edges — is expressed as a cogroup of the (small) active state with the
(persisted) per-partition CSR blocks on ``part = pmod(vid, P)``, executed by
a vectorized numpy kernel inside ``applyInPandas``:

  - binary-search the block's sorted ``srcs`` for the frontier vids,
  - slice ``dsts`` by ``indptr`` ranges (pure numpy fancy indexing,
    no Python loop over vertices or edges),
  - frontier vids absent from ``srcs`` have out-degree 0 => the dangling
    self-loop contribution falls out of the same lookup, no anti-join.

Compared to the DataFrame scatter join this trades a sort-merge join of
state x edges for one Arrow round trip per partition — the win grows with
frontier size and edge fan-out (the reference's CPU/GPU gather-scatter has
the same shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DELTA_SCHEMA = "source bigint, vid bigint, dr double"


def _scatter_kernel(alpha: float):
    push_coef = 1.0 - alpha

    def scatter(state_pdf: pd.DataFrame, csr_pdf: pd.DataFrame) -> pd.DataFrame:
        if state_pdf.empty:
            return pd.DataFrame({"source": [], "vid": [], "dr": []}).astype(
                {"source": "int64", "vid": "int64", "dr": "float64"}
            )
        src_v = state_pdf["vid"].to_numpy(dtype=np.int64)
        res = state_pdf["residual"].to_numpy(dtype=np.float64)
        src_s = state_pdf["source"].to_numpy(dtype=np.int64)

        if csr_pdf.empty:
            # no edges hash to this partition: everything here is dangling
            return pd.DataFrame(
                {"source": src_s, "vid": src_v, "dr": push_coef * res}
            )
        srcs = np.asarray(csr_pdf["srcs"].iloc[0], dtype=np.int64)
        indptr = np.asarray(csr_pdf["indptr"].iloc[0], dtype=np.int64)
        dsts = np.asarray(csr_pdf["dsts"].iloc[0], dtype=np.int64)

        pos = np.searchsorted(srcs, src_v)
        pos_c = np.minimum(pos, len(srcs) - 1)
        found = srcs[pos_c] == src_v
        # --- dangling: frontier vids with no out-edges self-loop
        d_mask = ~found
        out_dang = (
            src_s[d_mask],
            src_v[d_mask],
            push_coef * res[d_mask],
        )
        # --- gather-scatter for vids with out-edges
        f_idx = np.nonzero(found)[0]
        p = pos_c[f_idx]
        starts, ends = indptr[p], indptr[p + 1]
        counts = ends - starts
        total = int(counts.sum())
        if total:
            # flat edge indices: for each frontier vertex, its dst slice
            offsets = np.repeat(np.cumsum(counts) - counts, counts)
            flat = np.arange(total) - offsets + np.repeat(starts, counts)
            out_src = np.repeat(src_s[f_idx], counts)
            out_vid = dsts[flat]
            out_dr = np.repeat(push_coef * res[f_idx] / counts, counts)
        else:
            out_src = np.empty(0, dtype=np.int64)
            out_vid = np.empty(0, dtype=np.int64)
            out_dr = np.empty(0, dtype=np.float64)
        return pd.DataFrame(
            {
                "source": np.concatenate([out_src, out_dang[0]]),
                "vid": np.concatenate([out_vid, out_dang[1]]),
                "dr": np.concatenate([out_dr, out_dang[2]]),
            }
        )

    return scatter


def csr_scatter(
    active: DataFrame, csr_blocks: DataFrame, alpha: float, num_partitions: int
) -> DataFrame:
    """(source, vid, dr) raw push contributions (pre-aggregation).

    ``active`` must be the frontier (residual != 0) slice of the state.
    """
    withpart = active.select(
        "source",
        "vid",
        "residual",
        F.pmod(F.col("vid"), F.lit(num_partitions)).cast("int").alias("part"),
    )
    return (
        withpart.groupBy("part")
        .cogroup(csr_blocks.groupBy("part"))
        .applyInPandas(_scatter_kernel(alpha), schema=DELTA_SCHEMA)
    )
