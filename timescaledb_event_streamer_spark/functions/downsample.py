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
    in keys/ts/value pass through on the kept rows).

    Seam shape (r11): series-keyed repartition + in-partition sort,
    then ONE mapInPandas pass that walks series as contiguous row
    blocks. The previous ``groupBy().applyInPandas`` form paid the
    per-GROUP Arrow machinery (a JVM group split + a fresh pandas
    frame + a Python call per series) — with real corpora holding
    thousands of short series per partition that overhead dominated
    ~10x over the actual LTTB math. Same shuffle (one exchange on
    the series key), same per-series row order (the in-partition
    sort is (keys..., ts, tiebreak) — identical to the per-group
    sort when the tiebreak makes the order total, which every
    registered caller guarantees), same ``_lttb_indices`` per
    series, so the kept-row multiset is unchanged; series whose
    length is already <= n_out (or n_out < 3) keep every row via a
    vectorized take-all mask and never enter the Python loop."""
    cols = df.columns
    sort_cols = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    def _process(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        new_grp = np.zeros(n, dtype=bool)
        new_grp[0] = True
        for k in series_keys:
            s = pdf[k]
            arr = s.to_numpy()
            # null-safe: a run of null keys is ONE series, matching
            # groupBy().applyInPandas (NaN != NaN would otherwise
            # start a new group per row)
            neq = arr[1:] != arr[:-1]
            na = s.isna().to_numpy()
            new_grp[1:] |= neq & ~(na[1:] & na[:-1])
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, n))
        needs_lttb = (sizes > n_out) & (n_out >= 3)
        if not needs_lttb.any():
            return pdf
        x_all = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        y_all = pdf[value_col].to_numpy(dtype=np.float64)
        keep_parts = [np.flatnonzero(np.repeat(~needs_lttb, sizes))]
        for st, sz in zip(starts[needs_lttb], sizes[needs_lttb]):
            keep_parts.append(
                st + _lttb_indices(x_all[st : st + sz], y_all[st : st + sz], n_out)
            )
        return pdf.iloc[np.sort(np.concatenate(keep_parts))]

    def _walk(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # the trailing series may continue in the next batch:
            # hold its rows back (rows are series-contiguous, so the
            # equal-to-last-key mask IS the trailing block)
            last = pdf.iloc[-1]
            tail_mask = np.ones(len(pdf), dtype=bool)
            for k in series_keys:
                # null-safe carry: a null-keyed trailing series must be
                # held back too, or a series spanning an Arrow batch
                # boundary is LTTB'd as two independent fragments
                if pd.isna(last[k]):
                    tail_mask &= pdf[k].isna().to_numpy()
                else:
                    tail_mask &= (pdf[k] == last[k]).to_numpy()
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield _process(head)
        if carry is not None and len(carry):
            yield _process(carry)

    arranged = df.repartition(n_shuffle, *series_keys).sortWithinPartitions(
        *series_keys, *sort_cols
    )
    return arranged.mapInPandas(_walk, df.select(*cols).schema)
