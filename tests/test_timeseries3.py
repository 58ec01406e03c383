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


def test_asap_smooth_matches_reference_impl(spark, tmp_path):
    """Planted series vs an independent NumPy implementation of the
    same ASAP rule (min roughness subject to kurtosis preservation):
    chosen window and statistics must agree."""
    import numpy as np

    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_asap_smooth,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rng = [(i * 37 + 11) % 97 / 10.0 for i in range(40)]  # deterministic noise
    vals = [round(5.0 + 3.0 * ((i % 7) - 3) / 3.0 + rng[i] * 0.5, 2) for i in range(40)]
    vals[20] = 60.0  # spike the kurtosis rule must preserve
    rows = [(t0 + datetime.timedelta(days=i), "m", vals[i]) for i in range(40)]
    sf_dir = _write(spark, tmp_path, rows)

    [got] = ts_asap_smooth(spark, sf_dir).collect()

    def stats(a):
        mu = a.mean()
        m2 = ((a - mu) ** 2).sum()
        m4 = ((a - mu) ** 4).sum()
        kurt = len(a) * m4 / (m2 * m2)
        d = np.diff(a)
        rough = np.sqrt(((d - d.mean()) ** 2).mean())
        return rough, kurt

    xs = np.array(vals)
    _, kurt_o = stats(xs)
    best = None
    for w in [1] + list(range(2, min(15, len(xs) - 2) + 1)):
        s = xs if w == 1 else np.convolve(xs, np.ones(w) / w, mode="valid")
        rough, kurt = stats(s)
        if w == 1 or kurt >= kurt_o:
            if best is None or rough < best[1] - 1e-12:
                best = (w, rough, kurt)

    assert got["w_chosen"] == best[0]
    assert abs(got["roughness"] - best[1]) < 1e-4
    assert abs(got["kurtosis"] - best[2]) < 1e-4
    assert got["kurtosis"] >= got["kurtosis_orig"] or got["w_chosen"] == 1
    assert got["n_days"] == 40


def test_asap_smooth_constant_series_identity(spark, tmp_path):
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_asap_smooth,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(t0 + datetime.timedelta(days=i), "c", 7.0) for i in range(10)]
    [got] = ts_asap_smooth(spark, _write(spark, tmp_path, rows)).collect()
    # constant series: every window ties at roughness 0 -> w=1 wins
    assert got["w_chosen"] == 1 and got["roughness"] == 0.0


def test_lttb_codegen_matches_reference_chain(spark, tmp_path):
    """The fold must reproduce a direct Python implementation of the
    same LTTB rule (integer bucket edges, next-bucket mean anchor,
    first-match argmax) on a planted series."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        N_OUT,
        ts_lttb_codegen,
    )

    t0 = datetime.datetime(2024, 1, 1)
    vals = [round(((i * 37 + 11) % 97) / 7.0 + (5.0 if i % 13 == 0 else 0.0), 2)
            for i in range(45)]
    rows = [(t0 + datetime.timedelta(days=i), "m", vals[i]) for i in range(45)]
    sf_dir = _write(spark, rows=rows, tmp_path=tmp_path)

    got = sorted(ts_lttb_codegen(spark, sf_dir).collect(), key=lambda r: r["pt_ord"])
    assert len(got) == N_OUT

    xs = [(t0 + datetime.timedelta(days=i)).timestamp() for i in range(45)]
    ys = vals
    n, steps, nedge = 45, N_OUT - 2, N_OUT - 1
    edges = [1 + (i * (n - 2)) // steps for i in range(nedge)]
    keep, prev = [0], 0
    for bi in range(steps):
        lo, hi = edges[bi], edges[bi + 1]
        if bi + 2 < nedge:
            nlo, nhi = edges[bi + 1], edges[bi + 2]
        else:
            nlo, nhi = n - 1, n
        ax = sum(xs[nlo:nhi]) / (nhi - nlo)
        ay = sum(ys[nlo:nhi]) / (nhi - nlo)
        px, py = xs[prev], ys[prev]
        areas = [abs((px - ax) * (ys[j] - py) - (px - xs[j]) * (ay - py))
                 for j in range(lo, hi)]
        prev = lo + max(range(len(areas)), key=lambda k: (areas[k], -k))
        keep.append(prev)
    keep.append(n - 1)

    assert [r["t_s"] for r in got] == [int(xs[k]) for k in keep]
    assert [r["v"] for r in got] == [round(ys[k], 6) for k in keep]


def test_lttb_codegen_short_series_drop_out(spark, tmp_path):
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_lttb_codegen,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(t0 + datetime.timedelta(days=i), "short", 1.0) for i in range(10)]
    assert ts_lttb_codegen(spark, _write(spark, rows=rows, tmp_path=tmp_path)).count() == 0


def test_asap_smooth_degenerate_series_excluded(spark, tmp_path):
    """Series with fewer than 4 daily buckets can't support the
    roughness/kurtosis search and must drop out cleanly instead of
    tripping ANSI arithmetic (regression: single-bucket series threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT)."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_asap_smooth,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = (
        [(t0, "single", 1.0)]
        + [(t0 + datetime.timedelta(days=i), "three", 2.0) for i in range(3)]
        + [(t0 + datetime.timedelta(days=i), "ok", float(i % 5)) for i in range(8)]
    )
    out = {r["series"]: r
           for r in ts_asap_smooth(spark, _write(spark, rows=rows, tmp_path=tmp_path)).collect()}
    assert set(out) == {"ok"}
    assert out["ok"]["n_days"] == 8


def test_realtime_cagg_watermark_moves_and_stays_fresh(spark, tmp_path):
    """Real-time cagg read (functions/cagg.realtime_cagg_read): for
    EVERY bucket-aligned watermark position the materialized∪raw-tail
    read equals the direct one-shot aggregate (merge == direct), and a
    raw row landing past the watermark is visible immediately WITHOUT
    rebuilding the materialization (the freshness property that
    distinguishes realtime caggs from plain materialized views)."""
    from timescaledb_event_streamer_spark.functions.cagg import (
        cagg_partials,
        realtime_cagg_read,
    )

    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (t0 + datetime.timedelta(minutes=37 * i), "m" if i % 2 else "k",
         float(i % 7) + 0.25)
        for i in range(40)
    ]
    events = _events(spark, rows).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    HOUR = 3600
    base_s = int(t0.timestamp())
    direct = {
        (r["event_type"], r["bucket_s"]): (r["n"], r["sum_value"])
        for r in cagg_partials(events, ["event_type"], HOUR, sum_col="cents")
        .collect()
    }

    span_s = 37 * 60 * 40
    watermarks = [base_s + h * HOUR for h in range(0, span_s // HOUR + 2, 5)]
    for wm_s in watermarks:
        mat = cagg_partials(
            events.filter(F.col("ts") < F.timestamp_seconds(F.lit(wm_s))),
            ["event_type"], HOUR, sum_col="cents",
        )
        read = realtime_cagg_read(mat, events, ["event_type"], HOUR, wm_s,
                                  sum_col="cents")
        got = {
            (r["event_type"], r["bucket_s"]): (r["n"], r["sum_value"])
            for r in read.collect()
        }
        assert got == direct, f"merge != direct at watermark {wm_s}"

    # freshness: a brand-new raw row past the watermark shows up in the
    # read even though the materialization was built before it existed
    wm_s = base_s + 10 * HOUR
    mat = cagg_partials(
        events.filter(F.col("ts") < F.timestamp_seconds(F.lit(wm_s))),
        ["event_type"], HOUR, sum_col="cents",
    )
    late_ts = t0 + datetime.timedelta(hours=30)
    late = _events(spark, [(late_ts, "fresh", 2.5)]).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    read = realtime_cagg_read(mat, events.unionByName(late),
                              ["event_type"], HOUR, wm_s, sum_col="cents")
    fresh = [r for r in read.collect() if r["event_type"] == "fresh"]
    assert len(fresh) == 1 and fresh[0]["n"] == 1
    assert fresh[0]["sum_value"] == 250

    # misaligned watermark must fail loudly, not split a bucket
    try:
        realtime_cagg_read(mat, events, ["event_type"], HOUR, wm_s + 17,
                           sum_col="cents")
    except ValueError:
        pass
    else:
        raise AssertionError("misaligned watermark accepted")


def test_hll_swap_error_bound_registered(spark, sf_mid):
    """ts_count_distinct_hll (the REGISTERED rows-only sketch) vs the
    exact registered sibling: HLL++ at rsd=0.02 stays within 2x the
    declared rsd on every hypertable, and the exact n_events column is
    identical (it rides the same aggregate)."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries2 import (
        ts_count_distinct,
    )
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_count_distinct_hll,
    )

    exact = {r["event_type"]: r for r in ts_count_distinct(spark, sf_mid).collect()}
    approx = {r["event_type"]: r for r in ts_count_distinct_hll(spark, sf_mid).collect()}
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        assert a["n_events"] == e["n_events"]
        rel = abs(a["n_users_approx"] - e["n_users"]) / e["n_users"]
        assert rel <= 0.04, (et, rel)


def test_space_saving_sketch_bound_and_recall(spark, sf_mid):
    """Misra-Gries merge guarantee for the registered sketch: for every
    (type, user) the sketch reports, est <= true <= est + err_bound —
    and every EXACT heavy hitter (>=0.8% share, the ts_freq_agg gate)
    is guaranteed to appear in the sketch's candidate set because
    err_bound <= n/256 < n/125."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.operators.sketches import (
        topk_space_saving,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    events = load(spark, sf_mid, "events")
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {}
    for (et, _), n in exact.items():
        totals[et] = totals.get(et, 0) + n

    sk = topk_space_saving(events, "event_type", "user_id", m=256).collect()
    est = {(r["event_type"], r["user_id"]): r for r in sk}
    for key, r in est.items():
        true = exact[key]
        assert r["est_count"] <= true <= r["est_count"] + r["err_bound"], (key, r, true)
    # bound tightness: err_bound <= n_type / 256
    per_type_bound = {r["event_type"]: r["err_bound"] for r in sk}
    for et, b in per_type_bound.items():
        assert b <= totals[et] / 256 + 1, (et, b, totals[et])
    # full heavy-hitter recall at the freq_agg gate
    for (et, uid), n in exact.items():
        if n / totals[et] >= 0.008:
            assert (et, uid) in est, (et, uid, n)


def test_realtime_cagg_invalidation_routing_is_load_bearing(spark, sf_mid):
    """ts_cagg_realtime_invalidation: the dirty-set routing must be
    DOING something — serving dirty buckets from the stale
    materialization would produce different values than the current
    state (so the oracle hash-check genuinely certifies the routing),
    and the routed read's recomputed tier must be non-empty on the
    driver testdata."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_cagg_realtime_invalidation,
    )

    rows = ts_cagg_realtime_invalidation(spark, sf_mid).collect()
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r)
    assert set(by_tier) == {"materialized", "recomputed", "raw_tail"}
    # every dirty bucket REALLY is stale in the materialization: the
    # current-state sum differs from the stale sum wherever an update
    # or delete landed (updates add +1.00, deletes remove rows)
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.cdc.envelope import derive_op
    from timescaledb_event_streamer_spark.functions.cagg import cagg_partials
    from timescaledb_event_streamer_spark.sources.tables import load

    events = load(spark, sf_mid, "events").withColumn(
        "op", derive_op(F.col("event_id"))
    )
    stale = cagg_partials(
        events.withColumn(
            "cents", F.round(F.col("value") * 100, 0).cast("long")
        ),
        ["event_type"], 3600, sum_col="cents",
    )
    stale_sums = {
        (r["event_type"], r["bucket_s"]): (r["n"], r["sum_value"])
        for r in stale.collect()
    }
    mismatches = 0
    for r in by_tier["recomputed"]:
        key = (r["event_type"], r["bucket_s"])
        n_stale, sum_stale = stale_sums[key]
        if n_stale != r["n"] or abs(sum_stale / 100.0 - r["sum_value"]) > 1e-9:
            mismatches += 1
    # nearly every recomputed bucket contains at least one u or d row
    # (that is what made it dirty), so staleness must be visible
    assert mismatches > 0.9 * len(by_tier["recomputed"])


def test_compressed_roundtrip_batching_and_order(spark):
    """B55: a 2500-row segment compresses into ceil(2500/1000) = 3
    order_by=ts batches; first/last read from the array head/tail
    match the true temporal extremes — and the result is invariant
    to the input row order (the order_by sort, not arrival order,
    defines the layout)."""
    import datetime

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        compressed_roundtrip,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 7, "metrics", float(i))
        for i in range(2500)
    ]
    rows += [
        (10_000 + i, base + datetime.timedelta(seconds=i), 8, "metrics", 1.5)
        for i in range(5)
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    ev = spark.createDataFrame(rows, schema)
    out = {r["segment_key"]: r for r in compressed_roundtrip(ev).collect()}
    big = out[7]
    assert big["n_rows"] == 2500 and big["n_batches"] == 3
    assert big["first_cents"] == 0  # value 0.0 at the earliest ts
    assert big["last_cents"] == 249900  # value 2499.0 at the latest
    assert big["sum_cents"] == sum(i * 100 for i in range(2500))
    small = out[8]
    assert small["n_rows"] == 5 and small["n_batches"] == 1
    assert small["sum_cents"] == 5 * 150

    # arrival-order invariance: a shuffled input yields the identical
    # compressed read
    shuffled = ev.orderBy(F.rand(seed=4))
    got2 = {r["segment_key"]: r for r in compressed_roundtrip(shuffled).collect()}
    assert {k: v.asDict() for k, v in out.items()} == {
        k: v.asDict() for k, v in got2.items()
    }


def test_compressed_roundtrip_property(spark):
    """Property: for arbitrary event sets — including timestamps
    that COLLIDE at millisecond grain (the tie the oracle breaks on
    event_id) — the compressed read matches a pure-Python reference
    on every column. Examples are generated up front and namespaced
    by example id so one Spark run covers all of them."""
    import datetime
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        compressed_roundtrip,
    )

    ev = st.tuples(
        st.integers(min_value=0, max_value=50),  # offset ms — ties guaranteed
        st.integers(min_value=0, max_value=2),        # user bucket
        st.integers(min_value=-10_000, max_value=10_000),  # cents
    )
    batch = st.lists(ev, min_size=1, max_size=40)

    collected = []

    @settings(max_examples=15, deadline=None)
    @given(batch)
    def gen(events):
        collected.append(events)

    gen()

    base = datetime.datetime(2024, 3, 4)  # within one 7-day chunk
    rows = []
    ref = {}  # (ht, seg) -> list of (ts_ms, event_id, cents)
    eid = 0
    for ex, events in enumerate(collected):
        ht = f"type_{ex}"
        for off_ms, ub, cents in events:
            ts = base + datetime.timedelta(milliseconds=off_ms)
            ts_ms = int(ts.timestamp() * 1000)
            rows.append((eid, ts, ub, ht, cents / 100.0))
            ref.setdefault((ht, ub), []).append((ts_ms, eid, cents))
            eid += 1
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        (r["hypertable_name"], r["segment_key"]): r
        for r in compressed_roundtrip(df).collect()
    }
    assert set(got) == set(ref)
    for key, pts in ref.items():
        pts.sort()  # (ts_ms, event_id, cents) — the order_by contract
        r = got[key]
        assert r["n_rows"] == len(pts)
        assert r["n_batches"] == math.ceil(len(pts) / 1000)
        assert r["sum_cents"] == sum(c for _, _, c in pts)
        assert r["ts_min_ms"] == pts[0][0]
        assert r["ts_max_ms"] == pts[-1][0]
        assert r["first_cents"] == pts[0][2], key
        assert r["last_cents"] == pts[-1][2], key


def test_compressed_roundtrip_oracle_tiebreak_on_ms_ties(spark, tmp_path):
    """The DuckDB oracle's first/last ordered aggregates key on
    (ts_ms, event_id) exactly like the Spark side — proven on data
    whose timestamps collide at millisecond grain, which the driver
    testdata (unique ts) never exercises."""
    import datetime

    import duckdb
    import pandas as pd

    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        compressed_roundtrip,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_oracles
    from tools.check import canon

    base = datetime.datetime(2024, 3, 4)
    rows = []
    eid = 0
    for off_ms, ub, cents in [
        (5, 1, 100), (5, 1, -300), (5, 1, 200),  # 3-way ts tie, one segment
        (9, 1, 50), (9, 2, 75), (9, 2, 60),      # tie spanning segments
        (1, 2, 10),
    ]:
        rows.append((eid, base + datetime.timedelta(milliseconds=off_ms),
                     ub, "metrics", cents / 100.0))
        eid += 1
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    df = spark.createDataFrame(rows, schema)
    got = canon(compressed_roundtrip(df).toPandas())

    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    want = canon(con.sql(all_oracles()["ts_compressed_roundtrip"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_m4_downsample_first_last_and_extremes(spark, tmp_path):
    """B56: per pixel bucket, M4 keeps the boundary points (first and
    last by timestamp) alongside the extremes — on a bucket where
    the first/last are NOT the min/max, all four differ."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_downsample_m4,
    )

    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (t0, "m", 4.0),                                  # first
        (t0 + datetime.timedelta(minutes=10), "m", 9.0),  # max
        (t0 + datetime.timedelta(minutes=20), "m", 1.0),  # min
        (t0 + datetime.timedelta(minutes=30), "m", 6.0),  # last
    ]
    sf_dir = _write(spark, tmp_path, rows)
    [b] = ts_downsample_m4(spark, sf_dir).collect()
    assert b["n_points"] == 4
    assert (b["v_min"], b["v_max"]) == (1.0, 9.0)
    assert b["v_first"] == 4.0
    assert b["v_last"] == 6.0
    assert b["ts_first_ms"] == int(t0.timestamp() * 1000)
    assert b["ts_last_ms"] == int(
        (t0 + datetime.timedelta(minutes=30)).timestamp() * 1000
    )


def test_m4_oracle_tiebreak_on_ms_ties(spark):
    """B56's first/last tie-break on (ts_ms, event_id) agrees across
    engines on data whose timestamps collide at millisecond grain
    (same discipline and proof shape as B55's)."""
    import datetime

    import duckdb
    import pandas as pd

    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_downsample_m4,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_oracles
    from tools.check import canon

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (0, base + datetime.timedelta(milliseconds=5), 1, "m", 3.0, "p"),
        (1, base + datetime.timedelta(milliseconds=5), 1, "m", 8.0, "p"),
        (2, base + datetime.timedelta(milliseconds=9), 1, "m", 1.0, "p"),
        (3, base + datetime.timedelta(milliseconds=9), 1, "m", 6.0, "p"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = canon(ts_downsample_m4(spark, d).toPandas())
    con = duckdb.connect()
    con.register("events", df.toPandas())
    want = canon(con.sql(all_oracles()["ts_downsample_m4"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    assert got["v_first"].iloc[0] == 3.0  # event_id 0 wins the ts tie
    assert got["v_last"].iloc[0] == 6.0   # event_id 3 wins the ts tie


def test_hist2d_cells_partition_the_events(spark, tmp_path):
    """B57: cells tile the (day, value-bin) plane — counts sum to the
    input size, and a planted point lands in exactly the predicted
    cell with its exact cent mass."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries3 import (
        ts_hist2d,
    )

    t0 = datetime.datetime(2024, 3, 1, 5, 0, 0)
    rows = [
        (t0, "m", 4.5),      # bin 0
        (t0, "m", 14.5),     # bin 1
        (t0 + datetime.timedelta(days=1), "m", 15.5),  # next day, bin 1
        (t0, "m", 9.99),     # bin 0
    ]
    sf_dir = _write(spark, tmp_path, rows)
    out = {(r["bucket_s"], r["v_bin"]): r for r in ts_hist2d(spark, sf_dir).collect()}
    assert sum(r["n_points"] for r in out.values()) == 4
    day0 = int(datetime.datetime(2024, 3, 1).timestamp())
    assert out[(day0, 0)]["n_points"] == 2
    assert out[(day0, 0)]["sum_cents"] == 450 + 999
    assert out[(day0, 1)]["sum_cents"] == 1450
    day1 = day0 + 86400
    assert out[(day1, 1)]["n_points"] == 1
