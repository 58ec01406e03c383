"""Mergeable sketch operators — the 100 TB swap-ins for exact
aggregates (SURVEY §2 B22/B24 docstrings promise them; VERDICT r4
item 7 asks for them as REGISTERED, bound-tested operators).

Two sketches:

- HyperLogLog++ distinct counting is Spark-native
  (`approx_count_distinct`) and needs no code here — the registered
  `ts_count_distinct_hll` wraps it with a declared rsd.

- Heavy hitters: `topk_space_saving` implements the
  truncate-and-merge frequent-items summary (the parallel form of
  Misra-Gries / space-saving used by the toolkit's freq_agg): each
  Arrow batch counts its items exactly (vectorized value_counts — no
  per-row Python), keeps the top ``m`` plus the (m+1)-th count as its
  truncation threshold, and the partials merge by plain summation.
  Guarantee (Misra-Gries merge property): for every item,
  est <= true <= est + err_bound, where err_bound is the sum of the
  batch thresholds — so any item with true count > err_bound is
  guaranteed present. With B batches of a group totalling n rows,
  err_bound <= n/m, i.e. m = 256 certifies every >=0.8%-share heavy
  hitter (n/125 > n/256). The bound is asserted against the exact
  aggregate in tests/test_timeseries3.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_space_saving(
    df: DataFrame,
    key_col: str,
    item_col: str,
    m: int = 256,
) -> DataFrame:
    """Approximate per-key heavy hitters with merge-exact error bounds.

    Returns one row per (key, item) that survived at least one batch's
    top-``m`` truncation: ``est_count`` (underestimate of the true
    count) and ``err_bound`` (the key's summed truncation thresholds —
    the maximum possible undercount for ANY item of that key).

    Scale shape: the Arrow-batch partials are each <= m+1 rows per key,
    so the only shuffle moves sketch-sized data (keys x m), never the
    raw rows — the property that makes freq_agg viable when the item
    cardinality no longer fits a hash aggregate.
    """
    import pandas as pd

    key_t = df.schema[key_col].dataType.simpleString()
    item_t = df.schema[item_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_t}, {item_col} {item_t}, cnt long, thr long"
    )

    def partials(batches):
        for pdf in batches:
            outs = []
            for key, g in pdf.groupby(key_col, sort=False):
                vc = g[item_col].value_counts()
                thr = int(vc.iloc[m]) if len(vc) > m else 0
                top = vc.iloc[:m]
                outs.append(
                    pd.DataFrame(
                        {
                            key_col: key,
                            item_col: top.index.to_numpy(),
                            "cnt": top.to_numpy(),
                            "thr": 0,
                        }
                    )
                )
                # one threshold row per (batch, key): carries the
                # truncation loss into the merged error bound
                outs.append(
                    pd.DataFrame(
                        {key_col: [key], item_col: [None],
                         "cnt": [0], "thr": [thr]}
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                columns=[key_col, item_col, "cnt", "thr"]
            )

    sk = df.select(key_col, item_col).mapInPandas(partials, out_schema)
    bounds = (
        sk.filter(F.col(item_col).isNull())
        .groupBy(key_col)
        .agg(F.sum("thr").alias("err_bound"))
    )
    est = (
        sk.filter(F.col(item_col).isNotNull())
        .groupBy(key_col, item_col)
        .agg(F.sum("cnt").alias("est_count"))
    )
    return est.join(F.broadcast(bounds), key_col)
