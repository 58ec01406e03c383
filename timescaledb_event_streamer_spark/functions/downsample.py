"""Largest-Triangle-Three-Buckets (LTTB) downsampling — the
timescaledb-toolkit ``lttb()`` hyperfunction (public algorithm:
Steinarsson 2013, "Downsampling Time Series for Visual
Representation").

LTTB is inherently sequential *within* a series (each kept point
depends on the previous kept point), so it cannot be a pure
DataFrame expression; but series are independent, so the scale shape
is `groupBy(series_keys).applyInPandas` — Arrow-batched, one shuffle
on the series key, each series downsampled in a single pass of
NumPy. At 100 TB the parallelism is the number of series, which is
exactly the parallelism the problem has.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _lttb_indices(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices kept by LTTB over (x, y), always including the first
    and last points. Assumes x sorted ascending."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    # n_out buckets: first and last are singletons; the middle
    # n_out - 2 buckets split the interior evenly
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    keep = np.empty(n_out, dtype=np.int64)
    keep[0] = 0
    prev = 0
    for bi in range(n_out - 2):
        lo, hi = edges[bi], edges[bi + 1]
        # average of the NEXT bucket (or the last point for the final one)
        nlo, nhi = (edges[bi + 1], edges[bi + 2]) if bi + 2 < len(edges) else (n - 1, n)
        ax, ay = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        # triangle area vs previous kept point and next-bucket average
        px, py = x[prev], y[prev]
        bx, by = x[lo:hi], y[lo:hi]
        area = np.abs((px - ax) * (by - py) - (px - bx) * (ay - py))
        prev = lo + int(area.argmax())
        keep[bi + 1] = prev
    keep[n_out - 1] = n - 1
    return keep


def lttb(
    df: DataFrame,
    series_keys: list[str],
    ts_col: str,
    value_col: str,
    n_out: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Downsample each series to at most ``n_out`` visually-
    representative points. Output schema = input schema (columns not
    in keys/ts/value pass through on the kept rows)."""
    cols = df.columns
    sort_cols = [ts_col] + ([order_tiebreak] if order_tiebreak else [])

    def _one_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        x = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        return pdf.iloc[_lttb_indices(x, y, n_out)]

    return df.groupBy(*series_keys).applyInPandas(_one_series, df.select(*cols).schema)
