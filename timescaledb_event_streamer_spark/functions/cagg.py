"""Continuous-aggregate maintenance: partial aggregates + merge —
the TimescaleDB `refresh_continuous_aggregate` semantics, Spark-first.

TimescaleDB maintains a cagg by recomputing invalidated buckets when
new rows land in the hypertable; the reference streams the cagg's
materialization events like any other hypertable rows
(internal/systemcatalog: continuous-aggregate catalog; README
"continuous aggregate support"). In Spark the equivalent is the
*partial aggregate merge*: keep the materialization as algebraic
partials (count/sum/min/max), aggregate only the delta, and merge by
union + re-aggregate.

Why union + re-agg instead of a join: both inputs are already keyed
partials, so the merge is one map-side-combinable shuffle of
bucket-cardinality rows, associative across any number of deltas —
refresh cost is O(delta + touched buckets), never O(history). Non-
algebraic reads (avg) derive from the partials at query time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.functions.timeseries import time_bucket_epoch

#: partial-aggregate columns kept in the materialization
PARTIAL_COLS = ("n", "sum_value", "min_value", "max_value")


def cagg_partials(
    events: DataFrame,
    keys: list[str],
    bucket_width_s: int,
    ts_col: str = "ts",
    value_col: str = "value",
    sum_col: str | None = None,
) -> DataFrame:
    """Algebraic partials per (keys, bucket) — the materialized form.

    ``sum_col`` lets the sum ride on a different (typically exact
    integer, e.g. cents) column than min/max: float sums are
    summation-order-dependent, so an integer sum is what makes
    merge(partials) EXACTLY equal the one-shot aggregate regardless of
    how history was split into deltas."""
    return (
        events.withColumn("bucket_s", time_bucket_epoch(F.col(ts_col), bucket_width_s))
        .groupBy(*keys, "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(sum_col or value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def merge_cagg(keys: list[str], *partials: DataFrame) -> DataFrame:
    """Merge any number of partial materializations (associative +
    commutative, so deltas can arrive in any order / any grouping)."""
    unioned = reduce(lambda a, b: a.unionByName(b), partials)
    return unioned.groupBy(*keys, "bucket_s").agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def cagg_read(materialized: DataFrame) -> DataFrame:
    """Query-time view over the partials: derive non-algebraic
    aggregates (avg) without touching raw history."""
    return materialized.select(
        *[c for c in materialized.columns],
        (F.col("sum_value") / F.col("n")).alias("avg_value"),
    )
