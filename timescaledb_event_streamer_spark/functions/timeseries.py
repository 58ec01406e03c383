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


def gapfill_buckets_auto(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    width_s: int,
) -> DataFrame:
    """``gapfill_buckets`` with data-derived bounds.

    The [min, max] bucket bounds are a 1-row aggregate of ``df``
    broadcast-joined into the grid — kept in-plan, never collected to
    the driver. The bounds subplan is still its own scan of ``df``
    unless the caller ``persist()``s it (recommended: ``df`` is
    bucket-grain, small) — the grid, bounds, and left-join branches
    all re-reference it.
    """
    bounds = df.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = (
        df.select(*keys)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            bucket_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(width_s))),
        )
        .drop("_lo", "_hi")
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right
    row with ``right.on <= left.on`` within the same ``by`` group
    (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics,
    inclusive on equal timestamps).

    Spark has no native as-of join; the naive form is a range join
    that explodes quadratically. This implementation is the
    scale-correct shape: union both sides tagged, sort within each
    ``by`` partition, and carry the right values forward with one
    LOCF window — exactly ONE shuffle (on ``by``), zero row
    multiplication, regardless of data volume. The same shape runs
    streaming as `applyInPandasWithState` with the right-side values
    as state.

    Right must be unique per (by, on) — pre-aggregate otherwise
    (duplicate keys make the carried value order-dependent).

    ``tolerance_s``: matches older than this many seconds are nulled
    (pandas merge_asof tolerance).
    """
    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    l2 = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_on"),
        l_payload,
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in value_cols
        ],
        F.lit(None).cast(right.schema[on].dataType).alias("_match_on"),
    )
    r2 = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_on"),
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in value_cols],
        F.col(on).alias("_match_on"),
    )
    # right rows sort before left rows at equal _on => inclusive match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_on").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        "_l",
        "_side",
        "_on",
        F.last("_match_on", ignorenulls=True).over(w).alias("_match_on_f"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    out_vals = value_cols
    if tolerance_s is not None:
        in_tol = (
            F.col("_match_on_f").isNotNull()
            & (
                F.unix_micros(F.col("_on")) - F.unix_micros(F.col("_match_on_f"))
                <= tolerance_s * 1_000_000
            )
        )
        filled = filled.select(
            "_l",
            "_side",
            *[F.when(in_tol, F.col(c)).alias(c) for c in value_cols],
        )
    return filled.filter(F.col("_side") == 0).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col(c) for c in out_vals],
    )
