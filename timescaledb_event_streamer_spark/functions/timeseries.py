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


def gapfill_locf_folded(
    df: DataFrame,
    key: str,
    bucket_col: str,
    value_col: str,
    width_s: int,
    out_col: str,
) -> DataFrame:
    """``gapfill_buckets_auto`` + ``locf`` fused into ONE per-key
    in-row fold (r9, the ts_gapfill_locf drift fix): instead of
    materializing the dense grid, left-joining the data back and
    LOCF-ing with a sort+window over the whole grid, each key packs
    its sparse (bucket -> value) map in a single shuffle, the dense
    bucket sequence is generated IN-ROW from the broadcast 1-row
    global bounds, and the carry-forward is a sequential array fold
    (pure codegen). Identical output values — gaps before the first
    observation stay NULL — with one exchange, no global sort and no
    join-back; at scale the work per key is bounded by the calendar
    span, exactly like the grid form, minus two operators.

    The carry-forward is expressed as SEGMENTS, not per-day steps:
    observation i holds from its own bucket until observation i+1
    (the last one until the global hi), and the leading gap before
    the first observation emits NULLs — linear in total days, no
    growing accumulator.

    ``df`` must be bucket-grain (one row per key x bucket); callers
    should ``persist()`` it since bounds + fold both scan it.
    """
    bounds = df.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    per_key = df.groupBy(key).agg(
        F.array_sort(
            F.collect_list(F.struct(bucket_col, value_col))
        ).alias("_obs")
    )
    obs, lo, hi = F.col("_obs"), F.col("_lo"), F.col("_hi")
    n = F.size(obs)
    width = F.lit(width_s)
    first_b = F.element_at(obs, 1)[bucket_col]
    # leading NULL run [lo, first) — guard: sequence() demands
    # start <= stop for a positive step
    lead = F.when(
        first_b > lo,
        F.transform(
            F.sequence(lo, first_b - width, width),
            lambda d: F.struct(
                d.alias(bucket_col),
                F.lit(None).cast("double").alias("_v"),
            ),
        ),
    ).otherwise(
        F.array().cast(f"array<struct<{bucket_col}:bigint,_v:double>>")
    )
    # observation i covers [obs[i].bucket, next_bucket) where
    # next_bucket = obs[i+1].bucket, or hi + width for the last one
    segs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.element_at(obs, i)[bucket_col],
                    F.when(
                        i < n, F.element_at(obs, i + 1)[bucket_col]
                    ).otherwise(hi + width)
                    - width,
                    width,
                ),
                lambda d: F.struct(
                    d.alias(bucket_col),
                    F.element_at(obs, i)[value_col].alias("_v"),
                ),
            ),
        )
    )
    filled = per_key.crossJoin(F.broadcast(bounds)).select(
        key, F.concat(lead, segs).alias("_arr")
    )
    return filled.select(key, F.explode("_arr").alias("_x")).select(
        key,
        F.col(f"_x.{bucket_col}").alias(bucket_col),
        F.col("_x._v").alias(out_col),
    )


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
