"""Tests for round-4 timeseries additions (plans/queries_timeseries3.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
    ts_downsample_minmax,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, 1, et, v, "p") for i, (ts, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _write(spark, tmp_path, rows):
    df = _events(spark, rows)
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_minmax_downsample_ties_break_on_timestamp(spark, tmp_path):
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (t0, "m", 5.0),
        (t0 + datetime.timedelta(minutes=1), "m", 1.0),   # min, earliest
        (t0 + datetime.timedelta(minutes=2), "m", 1.0),   # min tie, later
        (t0 + datetime.timedelta(minutes=3), "m", 9.0),   # max tie, earlier
        (t0 + datetime.timedelta(minutes=4), "m", 9.0),   # max, latest
    ]
    sf_dir = _write(spark, tmp_path, rows)
    [b] = ts_downsample_minmax(spark, sf_dir).collect()
    assert b["n_points"] == 5
    assert b["v_min"] == 1.0 and b["v_max"] == 9.0
    # min ties -> earliest ts; max ties -> latest ts (struct lex order)
    assert b["ts_min_ms"] == int((t0 + datetime.timedelta(minutes=1)).timestamp() * 1000)
    assert b["ts_max_ms"] == int((t0 + datetime.timedelta(minutes=4)).timestamp() * 1000)


def test_minmax_downsample_rolls_up_associatively(spark, tmp_path):
    """min/max over (value, ts) structs is associative: merging the
    6-hour buckets to 12 hours must equal computing 12-hour buckets
    directly from the raw points — the cagg-rollup property LTTB
    lacks."""
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (t0 + datetime.timedelta(hours=h, minutes=m), "m", float((h * 7 + m) % 13))
        for h in range(12)
        for m in (0, 17, 43)
    ]
    sf_dir = _write(spark, tmp_path, rows)
    six = ts_downsample_minmax(spark, sf_dir)
    merged = (
        six.withColumn("b12", F.col("bucket_s") - F.col("bucket_s") % (12 * 3600))
        .groupBy("series", "b12")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.min(F.struct("v_min", "ts_min_ms")).getField("v_min").alias("v_min"),
            F.min(F.struct("v_min", "ts_min_ms")).getField("ts_min_ms").alias("ts_min_ms"),
            F.max(F.struct("v_max", "ts_max_ms")).getField("v_max").alias("v_max"),
            F.max(F.struct("v_max", "ts_max_ms")).getField("ts_max_ms").alias("ts_max_ms"),
        )
        .collect()
    )
    # direct 12h computation from raw points
    raw = _events(spark, rows)
    ts_ms = (F.unix_micros("ts") / 1000).cast("long")
    direct = (
        raw.select(
            F.col("event_type").alias("series"),
            ((F.unix_micros("ts") / 1_000_000).cast("long") % (12 * 3600) * -1
             + (F.unix_micros("ts") / 1_000_000).cast("long")).alias("b12"),
            F.struct("value", ts_ms.alias("ts_ms")).alias("pt"),
        )
        .groupBy("series", "b12")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("pt").getField("value").alias("v_min"),
            F.min("pt").getField("ts_ms").alias("ts_min_ms"),
            F.max("pt").getField("value").alias("v_max"),
            F.max("pt").getField("ts_ms").alias("ts_max_ms"),
        )
        .collect()
    )
    key = lambda r: (r["series"], r["b12"])  # noqa: E731
    assert sorted(map(tuple, merged), key=str) == sorted(map(tuple, direct), key=str)
    assert {key(r) for r in merged} == {key(r) for r in direct}
