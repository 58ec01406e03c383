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


def realtime_cagg_read(
    materialized: DataFrame,
    raw_events: DataFrame,
    keys: list[str],
    bucket_width_s: int,
    watermark_s: int,
    ts_col: str = "ts",
    value_col: str = "value",
    sum_col: str | None = None,
) -> DataFrame:
    """TimescaleDB *real-time* continuous-aggregate read path: the
    materialized partials for buckets strictly below the
    materialization watermark, UNION ALL the on-the-fly aggregation of
    raw rows at-or-after it — so a dashboard query sees rows the
    refresh job hasn't materialized yet (the flagship cagg read;
    reference context: caggs are first-class catalog relations,
    `internal/systemcatalog/catalogeventhandler.go`).

    ``watermark_s`` must be bucket-aligned (TimescaleDB's watermark is
    the end of the last materialized bucket, always a boundary): then
    no bucket spans tiers, the two branches produce disjoint bucket
    sets, and the union needs NO merge re-aggregation — at 100 TB the
    read costs one scan of the (tiny) materialization plus one scan of
    only the raw tail partitions, pruned by the pushed ``ts >=
    watermark`` predicate.
    """
    if watermark_s % bucket_width_s != 0:
        raise ValueError(
            f"watermark {watermark_s} not aligned to {bucket_width_s}s buckets"
        )
    mat = materialized.filter(F.col("bucket_s") < watermark_s)
    # literal timestamp compare so the tail filter reaches the parquet
    # scan as a pushed predicate (ts >= wm ⟺ bucket >= wm under
    # alignment) — chunk exclusion of the materialized history
    tail_rows = raw_events.filter(
        F.col(ts_col) >= F.timestamp_seconds(F.lit(watermark_s))
    )
    tail = cagg_partials(
        tail_rows, keys, bucket_width_s, ts_col=ts_col,
        value_col=value_col, sum_col=sum_col,
    )
    return mat.unionByName(tail)


def cagg_read(materialized: DataFrame) -> DataFrame:
    """Query-time view over the partials: derive non-algebraic
    aggregates (avg) without touching raw history."""
    return materialized.select(
        *[c for c in materialized.columns],
        (F.col("sum_value") / F.col("n")).alias("avg_value"),
    )
