"""TimescaleDB-style time-series functions as Spark column
expressions / DataFrame combinators.

These cover the analytics surface of the hypertable/continuous-
aggregate ecosystem the reference streams for: time_bucket,
time_bucket_gapfill + locf/interpolate, first/last. All are
JVM-side expressions (whole-stage codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_epoch(ts: Column, width_s: int) -> Column:
    """Bucket start as epoch seconds (origin 1970-01-01, see
    catalog/chunks.py for the origin note)."""
    e = F.unix_timestamp(ts)
    return (e - F.pmod(e, F.lit(width_s))).cast("long")


def time_bucket(ts: Column, width_s: int) -> Column:
    """TimescaleDB ``time_bucket(width, ts)`` returning a timestamp."""
    return F.timestamp_seconds(time_bucket_epoch(ts, width_s))


def gapfill_buckets(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    width_s: int,
    start_s: int,
    end_s: int,
) -> DataFrame:
    """Dense bucket grid per key over [start_s, end_s) — the frame
    ``time_bucket_gapfill`` fills into.

    Implemented as distinct-keys × ``sequence()`` explode: the grid is
    generated (not shuffled from data), and the subsequent left join
    hash-partitions on (keys, bucket) — bounded by grid size, not by
    raw data volume.
    """
    n_buckets = (end_s - start_s) // width_s
    grid = (
        df.select(*keys)
        .distinct()
        .withColumn(
            bucket_col,
            F.explode(
                F.sequence(
                    F.lit(start_s), F.lit(start_s + (n_buckets - 1) * width_s), F.lit(width_s)
                )
            ),
        )
    )
    return grid.join(df, on=[*keys, bucket_col], how="left")


def locf(df: DataFrame, keys: list[str], bucket_col: str, value_cols: list[str]) -> DataFrame:
    """Last-observation-carried-forward over the bucket grid
    (TimescaleDB ``locf()`` inside gapfill)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
