"""Exact-summation dtype policy for the moment-sum family
(VERDICT r6 item 7).

The moment-sum operators (B67 ts_stats_agg_2d, E18
embedding_covariance / streaming I23) aggregate integer-quantized
products whose SUMS are the only overflow risk: at the testdata
domains n*Sxy stays inside int64 to ~1e8 rows per series / ~1e8
vectors. Past that, the same plans run exactly in DECIMAL(38,0) —
Spark and DuckDB both aggregate decimals exactly, and every
downstream expression casts the exact sum to double once, so the
final values are bit-identical wherever both dtypes can represent
the sums (pinned by tests/test_exact_sums.py).

Flip with SPARK_GRAFT_MOMENT_SUMS=decimal (read at plan-build time);
default stays int64 — cheaper partials, and honest about where its
bound sits.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

#: env var selecting the moment-sum aggregation dtype:
#: "long" (default, exact to ~1e8 rows/series at testdata domains)
#: or "decimal" (DECIMAL(38,0), exact to ~1e38 — the 100 TB setting)
MOMENT_SUM_ENV = "SPARK_GRAFT_MOMENT_SUMS"


def moment_sum_mode() -> str:
    mode = os.environ.get(MOMENT_SUM_ENV, "long")
    if mode not in ("long", "decimal"):
        raise ValueError(f"{MOMENT_SUM_ENV} must be 'long' or 'decimal', got {mode!r}")
    return mode


def moment_sum(col: Column) -> Column:
    """SUM for integer moment accumulations, in the configured exact
    dtype. Both dtypes are exact (integer semantics, map-side
    combinable, order-independent); decimal trades partial-aggregate
    cheapness for 38-digit headroom."""
    if moment_sum_mode() == "decimal":
        return F.sum(col.cast("decimal(38,0)"))
    return F.sum(col)
