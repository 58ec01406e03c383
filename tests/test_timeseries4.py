"""Tests for round-5 timeseries additions (plans/queries_timeseries4.py):
the value-exact sketch pair and the training-feature window matrix."""

from __future__ import annotations

import datetime
import hashlib
import math

from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
    _HLL_M,
    ts_hll_md5,
    ts_lag_features,
    ts_percentile_hdr,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, ts, uid, et, v, "p")
            for i, (ts, uid, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _write(spark, tmp_path, rows):
    _events(spark, rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    return str(tmp_path)


T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _t(i):
    return T0 + datetime.timedelta(minutes=i)


# -- ts_percentile_hdr --------------------------------------------------


def test_hdr_percentile_error_bound(spark, tmp_path):
    """The HDR bucket keeps 4 mantissa bits, so every estimate must sit
    within 1/16 relative error of the exact rank statistic (the actual
    mid-bucket bound is half that)."""
    # deterministic spread over three orders of magnitude
    vals = [round(0.01 * ((7 * i) % 1000 + 1) * ((i % 37) + 1), 2)
            for i in range(500)]
    rows = [(_t(i), 1, "m", v) for i, v in enumerate(vals)]
    sf_dir = _write(spark, tmp_path, rows)
    [r] = ts_percentile_hdr(spark, sf_dir).collect()
    assert r["n_rows"] == 500
    svals = sorted(vals)
    for q, col in [(0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")]:
        exact = svals[math.ceil(q * len(svals)) - 1]
        assert abs(r[col] - exact) <= exact / 16 + 0.01, (q, r[col], exact)


def test_hdr_linear_region_is_exact(spark, tmp_path):
    """Values below 32 cents take unit-width buckets: the estimate of
    any percentile over a sub-32-cent corpus is EXACT."""
    vals = [0.01, 0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.31]
    rows = [(_t(i), 1, "m", v) for i, v in enumerate(vals)]
    sf_dir = _write(spark, tmp_path, rows)
    [r] = ts_percentile_hdr(spark, sf_dir).collect()
    assert r["p50_est"] == 0.15  # ceil(0.5*8)=4th of the sorted list
    assert r["p99_est"] == 0.31


def test_hdr_sketch_is_partition_invariant(spark, tmp_path):
    """Bucket counts are an associative aggregate — the same corpus
    split 1 way or 8 ways yields identical sketch output (the
    mergeability that makes the sketch a cagg partial at 100 TB)."""
    vals = [round(1.0 + (i * 13 % 400) / 7.0, 2) for i in range(300)]
    rows = [(_t(i), 1, "m", v) for i, v in enumerate(vals)]
    df = _events(spark, rows)
    d1, d8 = f"{tmp_path}/one", f"{tmp_path}/eight"
    df.coalesce(1).write.parquet(f"{d1}/events.parquet")
    df.repartition(8).write.parquet(f"{d8}/events.parquet")
    r1 = {tuple(r) for r in ts_percentile_hdr(spark, d1).collect()}
    r8 = {tuple(r) for r in ts_percentile_hdr(spark, d8).collect()}
    assert r1 == r8


# -- ts_hll_md5 ---------------------------------------------------------


def _hll_reference(user_ids):
    """Pure-Python replica of the registered register/fold pipeline."""
    regs: dict[int, int] = {}
    for uid in set(user_ids):
        hx = hashlib.md5(str(uid).encode()).hexdigest()
        idx = int(hx[:3], 16) % _HLL_M
        w = int(hx[3:18], 16)
        rho = 61 if w == 0 else 61 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s = 0.0
    for idx in sorted(regs):
        s += 2.0 ** -regs[idx]
    z = _HLL_M - len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    raw = alpha * _HLL_M * _HLL_M / (s + z * 1.0)
    if raw <= 2.5 * _HLL_M and z > 0:
        return round(_HLL_M * math.log(_HLL_M * 1.0 / z), 4)
    return round(raw, 4)


def test_hll_matches_pure_python_reference(spark, tmp_path):
    """The whole register pipeline — hash slice, rho, sorted harmonic
    fold, linear-counting branch — must reproduce the pure-Python
    recurrence bit-for-bit (the property the DuckDB oracle certifies
    cross-engine)."""
    uids = [(i * 7919) % 3000 for i in range(4000)]
    rows = [(_t(i % 1440), uid, "m", 1.0) for i, uid in enumerate(uids)]
    sf_dir = _write(spark, tmp_path, rows)
    [r] = ts_hll_md5(spark, sf_dir).collect()
    assert r["n_exact"] == len(set(uids))
    assert r["n_approx"] == _hll_reference(uids)


def test_hll_estimate_within_three_sigma(spark, tmp_path):
    """m=512 gives sigma ~ 1.04/sqrt(512) = 4.6%; the estimate on a
    2000-distinct corpus must land within the 3-sigma band (13.8%)."""
    uids = list(range(2000)) * 2
    rows = [(_t(i % 1440), uid, "m", 1.0) for i, uid in enumerate(uids)]
    sf_dir = _write(spark, tmp_path, rows)
    [r] = ts_hll_md5(spark, sf_dir).collect()
    assert r["n_exact"] == 2000
    assert abs(r["n_approx"] - 2000) / 2000 <= 0.138


def test_hll_is_insensitive_to_duplication(spark, tmp_path):
    """Registers are max-reduced, so multiplying every row 3x must not
    move the estimate at all — the idempotence that makes the sketch
    safe under replay/backfill."""
    uids = [(i * 31) % 500 for i in range(600)]
    base = [(_t(i), uid, "m", 1.0) for i, uid in enumerate(uids)]
    [r1] = ts_hll_md5(spark, _write(spark, f"{tmp_path}/a", base)).collect()
    [r3] = ts_hll_md5(
        spark, _write(spark, f"{tmp_path}/b", base * 3)
    ).collect()
    assert r1["n_approx"] == r3["n_approx"]


# -- ts_lag_features ----------------------------------------------------


def test_lag_features_hand_computed(spark, tmp_path):
    """10 days of one series at 1 event/day: every feature column is
    hand-checkable."""
    daily = [10.00, 20.00, 30.00, 40.00, 50.00, 60.00, 70.00, 80.00,
             90.00, 100.00]
    rows = [
        (T0 + datetime.timedelta(days=i), 1, "m", v)
        for i, v in enumerate(daily)
    ]
    sf_dir = _write(spark, tmp_path, rows)
    out = sorted(
        ts_lag_features(spark, sf_dir).collect(), key=lambda r: r["day_s"]
    )
    assert len(out) == 10
    assert out[0]["rev_lag1"] is None and out[0]["rev_lag7"] is None
    assert out[1]["rev_lag1"] == 10.0
    assert out[8]["rev_lag7"] == 20.0
    # head-of-series trailing mean uses the ACTUAL row count (3 rows)
    assert out[2]["roll7_mean"] == round((10 + 20 + 30) / 3, 6)
    # steady state: mean of days 3..9
    assert out[9]["roll7_mean"] == round(sum(daily[3:]) / 7, 6)
    assert out[9]["roll7_min"] == 40.0 and out[9]["roll7_max"] == 100.0
    assert out[8]["rev_next"] == 100.0
    assert out[9]["rev_next"] is None  # no day 11


def test_lag_features_sums_within_day(spark, tmp_path):
    """Multiple events on one day collapse to the exact cent sum
    before any window runs."""
    rows = [
        (T0, 1, "m", 1.11),
        (T0 + datetime.timedelta(hours=3), 2, "m", 2.22),
        (T0 + datetime.timedelta(days=1), 1, "m", 5.00),
    ]
    sf_dir = _write(spark, tmp_path, rows)
    out = sorted(
        ts_lag_features(spark, sf_dir).collect(), key=lambda r: r["day_s"]
    )
    assert out[0]["revenue"] == 3.33 and out[0]["n_events"] == 2
    assert out[1]["rev_lag1"] == 3.33
    assert out[1]["roll7_mean"] == round((333 + 500) / 200.0, 6)


def test_sketch_rollups_equal_direct(spark, tmp_path):
    """B62/B63: daily sketch partials merged (count addition / register
    max) must equal the sketch computed directly from all raw rows —
    the mergeability that lets 100 TB deployments keep only
    sketch-grain state per chunk."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_hll_rollup,
        ts_percentile_hdr_rollup,
    )

    rows = [
        (T0 + datetime.timedelta(hours=5 * i), (i * 17) % 200, "m",
         round(0.5 + (i * 97 % 3000) / 13.0, 2))
        for i in range(800)
    ]
    sf_dir = _write(spark, tmp_path, rows)
    direct_p = {tuple(r) for r in ts_percentile_hdr(spark, sf_dir).collect()}
    merged_p = {
        tuple(r) for r in ts_percentile_hdr_rollup(spark, sf_dir).collect()
    }
    assert merged_p == direct_p and len(direct_p) > 0
    direct_h = {tuple(r) for r in ts_hll_md5(spark, sf_dir).collect()}
    merged_h = {tuple(r) for r in ts_hll_rollup(spark, sf_dir).collect()}
    assert merged_h == direct_h


def test_interpolated_time_weight_hand_computed(spark, tmp_path):
    """One user, one type: 10.00 held 00:30->01:30 (splits evenly
    across two hour buckets), then 30.00 held 01:30->02:00. Bucket 0
    avg = 10.0; bucket 1 = (10*30min + 30*30min)/60min = 20.0."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_interpolated_time_weight,
    )

    rows = [
        (T0 + datetime.timedelta(minutes=30), 1, "click", 10.0),
        (T0 + datetime.timedelta(minutes=90), 1, "click", 30.0),
        (T0 + datetime.timedelta(minutes=120), 1, "click", 99.0),  # terminator
    ]
    sf = _write(spark, tmp_path, rows)
    got = {
        r["bucket"].hour: r
        for r in ts_interpolated_time_weight(spark, sf).collect()
    }
    assert got[0]["interpolated_avg"] == 10.0
    assert got[0]["covered_us"] == 30 * 60 * 1_000_000
    assert got[1]["interpolated_avg"] == 20.0
    assert got[1]["covered_us"] == 60 * 60 * 1_000_000
    assert got[1]["n_segments"] == 2


def test_interpolated_time_weight_conserves_mass(spark, tmp_path):
    """Bucket-splitting is a partition of each LOCF segment: summing
    covered_us and cents-mass over all buckets must equal the
    unsplit per-segment totals (exact integers, so equality is
    exact)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_interpolated_time_weight,
    )

    rows = [
        (_t(i * 7 + (i % 5) * 13), i % 3, ["a", "b"][i % 2], float(i % 40) + 0.25)
        for i in range(200)
    ]
    sf = _write(spark, tmp_path, rows)
    split = (
        ts_interpolated_time_weight(spark, sf)
        .groupBy("event_type")
        .agg(F.sum("covered_us").alias("dur"))
        .collect()
    )
    ev = spark.read.parquet(f"{sf}/events.parquet")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    direct = (
        ev.select(
            "event_type",
            (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt"),
        )
        .filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
        .groupBy("event_type")
        .agg(F.sum("dt").alias("dur"))
        .collect()
    )
    assert {r["event_type"]: r["dur"] for r in split} == {
        r["event_type"]: r["dur"] for r in direct
    }


def test_asof_tolerance_boundary_and_status(spark, tmp_path):
    """Planted gaps around the 48 h bound: exactly 48 h is FRESH
    (inclusive), 48 h + 1 s is STALE (age reported, value nulled),
    no purchase ever is NONE; and the helper's tolerance_s path
    computes the identical bounded value."""
    from timescaledb_event_streamer_spark.functions.timeseries import (
        asof_join,
    )
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        _ASOF_TOL_S,
        ts_asof_tolerance,
    )
    import pyspark.sql.functions as F

    h48 = datetime.timedelta(seconds=_ASOF_TOL_S)
    rows = [
        # user 1: purchase, then clicks at exactly 48h and 48h+1s
        (T0, 1, "purchase", 10.0),
        (T0 + h48, 1, "click", 1.0),
        (T0 + h48 + datetime.timedelta(seconds=1), 1, "click", 2.0),
        # user 2: click with no purchase at all
        (T0, 2, "click", 3.0),
        # user 3: click 1 minute after purchase
        (T0, 3, "purchase", 40.0),
        (T0 + datetime.timedelta(minutes=1), 3, "click", 4.0),
    ]
    sf = _write(spark, tmp_path, rows)
    out = {r["click_value"]: r for r in ts_asof_tolerance(spark, sf).collect()}
    exact = out[1.0]
    assert exact["match_status"] == "fresh"
    assert exact["match_age_s"] == _ASOF_TOL_S
    assert exact["purchase_value_fresh"] == 10.0
    stale = out[2.0]
    assert stale["match_status"] == "stale"
    assert stale["match_age_s"] == _ASOF_TOL_S + 1
    assert stale["purchase_value_fresh"] is None
    none = out[3.0]
    assert none["match_status"] == "none"
    assert none["match_age_s"] is None and none["purchase_value_fresh"] is None
    fresh = out[4.0]
    assert fresh["match_status"] == "fresh" and fresh["purchase_value_fresh"] == 40.0

    # helper-equivalence: asof_join(tolerance_s=...) nulls exactly the
    # rows the registered query marks non-fresh
    ev = spark.read.parquet(f"{sf}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    helper = {
        r["click_value"]: r["purchase_value"]
        for r in asof_join(
            clicks, purchases, on="ts", by=["user_id"],
            value_cols=["purchase_value"], tolerance_s=_ASOF_TOL_S,
        ).collect()
    }
    assert helper == {
        r["click_value"]: r["purchase_value_fresh"]
        for r in ts_asof_tolerance(spark, sf).collect()
    }


def test_stats_agg_2d_recovers_planted_line(spark, tmp_path):
    """y = 200 cents/hour * x + 500 cents exactly -> slope and
    intercept recover the plant and r2 == 1; a flat series gets
    slope 0 and covariance 0."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_stats_agg_2d,
    )

    rows = []
    for hour in range(10):
        rows.append(
            (T0 + datetime.timedelta(hours=hour), 1, "lin",
             (500 + 200 * hour) / 100.0)
        )
        rows.append((T0 + datetime.timedelta(hours=hour), 1, "flat", 7.5))
    sf = _write(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in ts_stats_agg_2d(spark, sf).collect()}
    lin = out["lin"]
    assert lin["n"] == 10
    assert lin["slope_cents_per_hour"] == 200.0
    assert lin["intercept_cents"] == 500.0
    assert lin["r2"] == 1.0
    flat = out["flat"]
    assert flat["slope_cents_per_hour"] == 0.0
    assert flat["covariance_pop"] == 0.0
    assert flat["intercept_cents"] == 750.0


def test_seasonal_backtest_hand_computed_and_gap_exact(spark, tmp_path):
    """Two days of hourly data: day-2 buckets predicted by day-1.
    Hour 3 of day 1 is MISSING — a row-lag would misalign every later
    bucket; the calendar join must (a) skip day-2-hour-3's backtest
    (no ancestor) and (b) still predict day-2-hour-4 from
    day-1-hour-4 exactly."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_seasonal_backtest,
    )

    rows = []
    day1 = {0: 10.0, 1: 11.0, 2: 12.0, 4: 14.0}  # hour 3 missing
    day2 = {0: 10.5, 1: 11.0, 2: 13.0, 3: 99.0, 4: 15.0}
    for h, v in day1.items():
        rows.append((T0 + datetime.timedelta(hours=h), 1, "s", v))
    for h, v in day2.items():
        rows.append((T0 + datetime.timedelta(hours=24 + h), 1, "s", v))
    sf = _write(spark, tmp_path, rows)
    [r] = ts_seasonal_backtest(spark, sf).collect()
    # backtestable buckets: day-2 hours 0,1,2,4 (hour 3 has no ancestor)
    assert r["n_buckets"] == 4
    # abs errors in cents: |1050-1000| + |1100-1100| + |1300-1200|
    #                    + |1500-1400| = 50 + 0 + 100 + 100
    assert r["total_abs_err_cents"] == 250
    assert r["mae_cents"] == 62.5
    expect_mape = round((50 / 1050 + 0 / 1100 + 100 / 1300 + 100 / 1500) / 4, 6)
    assert r["mape"] == expect_mape


def test_gorilla_estimate_hand_computed(spark, tmp_path):
    """Regular 10s cadence + constant value: dod == 0 and dv == 0
    from the third row, so bits = (64+64) + (14+1) + 3*(1+1);
    an irregular jump lands in the 9-bit bucket."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_gorilla_estimate,
    )

    rows = [
        (T0 + datetime.timedelta(seconds=10 * i), 1, "reg", 5.0)
        for i in range(5)
    ]
    # irregular series: deltas 10, 70 -> dod=60 (9-bit); values
    # 1.00, 1.50, 1.10 -> dv = 50, -40 (9-bit each)
    rows += [
        (T0, 1, "irr", 1.0),
        (T0 + datetime.timedelta(seconds=10), 1, "irr", 1.5),
        (T0 + datetime.timedelta(seconds=80), 1, "irr", 1.1),
    ]
    sf = _write(spark, tmp_path, rows)
    out = {r["hypertable_name"]: r for r in ts_gorilla_estimate(spark, sf).collect()}
    reg = out["reg"]
    assert reg["n_rows"] == 5 and reg["raw_bits"] == 640
    assert reg["est_ts_bits"] == 64 + 14 + 1 + 1 + 1
    assert reg["est_val_bits"] == 64 + 1 + 1 + 1 + 1
    assert reg["est_ratio"] == round(640 / (81 + 68), 4)
    irr = out["irr"]
    assert irr["est_ts_bits"] == 64 + 14 + 9   # dod=60 -> 9 bits
    assert irr["est_val_bits"] == 64 + 9 + 9   # dv=50, -40 -> 9 bits


def test_pivot_features_dense_and_exact(spark, tmp_path):
    """Absent (bucket, type) cells zero-fill (dense matrix), present
    cells carry exact cent sums and counts."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_pivot_features,
    )

    rows = [
        (T0, 1, "click", 1.50),
        (T0 + datetime.timedelta(minutes=10), 2, "click", 2.25),
        (T0, 1, "purchase", 99.99),
        (T0 + datetime.timedelta(hours=1), 1, "view", 0.10),
    ]
    sf = _write(spark, tmp_path, rows)
    out = {r["bucket_s"]: r for r in ts_pivot_features(spark, sf).collect()}
    b0 = out[min(out)]
    assert b0["click_cents"] == 375 and b0["click_n"] == 2
    assert b0["purchase_cents"] == 9999 and b0["purchase_n"] == 1
    assert b0["view_cents"] == 0 and b0["view_n"] == 0
    assert b0["error_cents"] == 0 and b0["signup_n"] == 0
    b1 = out[max(out)]
    assert b1["view_cents"] == 10 and b1["click_n"] == 0
