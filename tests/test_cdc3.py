"""Tests for plans/queries_cdc3.py: DBLog incremental snapshot
semantics and the chunk-stats admin surface."""

from __future__ import annotations

import datetime

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    spark.createDataFrame(
        [(i, ts, uid, et, v, "p") for (i, ts, uid, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_incremental_snapshot_collision_rule(spark, tmp_path):
    """Planted DBLog scenario. max lsn = 2000 -> S = 1000. Chunk 0
    (users 0..99) window = (1000, 1500]; chunk 1 (users 100..199)
    window = (1500, 2000].

    - user 1: snapshot at lsn 900; CDC at 1200 INSIDE chunk-0 window
      -> superseded ('cdc', state 1200).
    - user 2: snapshot at lsn 800; CDC at 1600 OUTSIDE chunk-0 window
      -> snapshot survives ('snapshot', state 800).
    - user 3: snapshot at lsn 700, no CDC -> 'snapshot'.
    - user 150: snapshot at lsn 600; CDC at 1900 INSIDE chunk-1
      window -> 'cdc'.
    - user 4: first event at lsn 1100 > S -> not in the snapshot, no
      output row (picked up by the ongoing stream, not the snapshot).
    """
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        cdc_incremental_snapshot,
    )

    t = T0
    rows = [
        (900, t, 1, "a", 10.0),
        (1200, t, 1, "a", 11.0),
        (800, t, 2, "a", 20.0),
        (1600, t, 2, "a", 21.0),
        (700, t, 3, "a", 30.0),
        (600, t, 150, "a", 40.0),
        (1900, t, 150, "a", 41.0),
        (1100, t, 4, "a", 50.0),
        (2000, t, 999, "a", 0.5),  # sets max lsn; user 999 snapshotless
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in cdc_incremental_snapshot(spark, sf).collect()}
    assert out[1]["source"] == "cdc" and out[1]["state_event_id"] == 1200
    assert out[1]["low_lsn"] == 1000 and out[1]["high_lsn"] == 1500
    assert out[2]["source"] == "snapshot" and out[2]["state_event_id"] == 800
    assert out[3]["source"] == "snapshot" and out[3]["state_value"] == 30.0
    assert out[150]["source"] == "cdc" and out[150]["state_event_id"] == 1900
    assert out[150]["low_lsn"] == 1500 and out[150]["high_lsn"] == 2000
    assert 4 not in out and 999 not in out
    assert set(out) == {1, 2, 3, 150}


def test_incremental_snapshot_latest_in_window_wins(spark, tmp_path):
    """Two CDC events inside the same window: the LATEST supersedes
    (row_number over event_id DESC)."""
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        cdc_incremental_snapshot,
    )

    t = T0
    rows = [
        (100, t, 7, "a", 1.0),
        (1100, t, 7, "a", 2.0),
        (1400, t, 7, "a", 3.0),
        (2000, t, 999, "a", 0.5),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in cdc_incremental_snapshot(spark, sf).collect()}
    assert out[7]["source"] == "cdc"
    assert out[7]["state_event_id"] == 1400
    assert out[7]["state_value"] == 3.0


def test_chunk_stats_hand_computed(spark, tmp_path):
    """Three events of one type in two 7-day ranges; chunk counts,
    totals, and skew come out exactly."""
    from timescaledb_event_streamer_spark.catalog.chunks import space_slice
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        ts_chunk_stats,
    )
    import pyspark.sql.functions as F

    # users 1 and 2: find whether they land in the same hash slice so
    # the expected chunk count is derived, not guessed
    sl = {
        r["u"]: r["s"]
        for r in spark.createDataFrame([(1,), (2,)], "u long")
        .select("u", space_slice(F.col("u")).alias("s"))
        .collect()
    }
    rows = [
        (1, T0, 1, "a", 1.0),
        (2, T0, 1, "a", 2.0),
        (3, T0 + datetime.timedelta(days=8), 2, "a", 3.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = ts_chunk_stats(spark, sf).collect()
    assert r["hypertable_name"] == "a"
    assert r["n_time_ranges"] == 2
    assert r["n_chunks"] == 2  # (range1, slice(u1)) and (range2, slice(u2))
    assert r["n_slices_used"] == (1 if sl[1] == sl[2] else 2)
    assert r["total_rows"] == 3
    assert r["largest_chunk_rows"] == 2 and r["smallest_chunk_rows"] == 1
    assert r["skew_ratio"] == 2.0
    assert r["est_bytes"] == 3 * 64
    assert r["max_range_end_s"] - r["min_range_start_s"] == 2 * 7 * 24 * 3600


def test_dropped_chunk_filter_routes_old_chunks(spark, tmp_path):
    """Events land in three 7-day chunks; the oldest chunk's range
    ended more than 14 days before the newest event, so its events
    are accounted as dropped, not silently discarded."""
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        cdc_dropped_chunk_filter,
    )

    rows = [
        (1, T0, 1, "a", 1.0),                                  # old chunk
        (2, T0 + datetime.timedelta(days=25), 1, "a", 2.0),    # live
        (3, T0 + datetime.timedelta(days=26), 2, "a", 3.0),    # live
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        (r["range_start_s"], r["chunk_status"]): r["n_events"]
        for r in cdc_dropped_chunk_filter(spark, sf).collect()
    }
    statuses = {k[1] for k in out}
    assert statuses == {"live", "dropped"}
    assert sum(v for (rs, st), v in out.items() if st == "dropped") == 1
    assert sum(v for (rs, st), v in out.items() if st == "live") == 2


def test_publication_repair_actions(spark, tmp_path):
    """The repair plan re-adds expected tables missing from the
    publication, drops the stale internal table, keeps matches —
    and emits executable ALTER PUBLICATION DDL for add/drop."""
    import hashlib

    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        cdc_publication_repair,
    )

    rows = [
        (i, T0 + datetime.timedelta(days=7 * i), 1, "a", 1.0) for i in range(6)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["table_name"]: r for r in cdc_publication_repair(spark, sf).collect()}
    stale = "_timescaledb_internal._compressed_hypertable_99"
    assert out[stale]["action"] == "drop"
    assert out[stale]["ddl"].startswith("ALTER PUBLICATION cdc_pub DROP TABLE ")
    for name, r in out.items():
        if name == stale:
            continue
        want = (
            "add"
            if int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % 3 == 0
            else "keep"
        )
        assert r["action"] == want, name
        if want == "add":
            assert r["ddl"] == f"ALTER PUBLICATION cdc_pub ADD TABLE {name}"
    assert {r["action"] for r in out.values()} == {"add", "drop", "keep"}
    # injectivity: every distinct (hypertable, 7-day range) maps to
    # its OWN expected table — the aliasing regression (offset-based
    # numbering collapsing two live chunks into one name) would make
    # this count come up short
    assert len(out) == 6 + 1  # six weekly chunks + the stale entry


def test_empty_txn_ack_advances_confirmed_flush(spark, tmp_path):
    """A29 planted scenario mirroring the reference assertion: txn 0
    holds published ('purchase') traffic; txns 1 and 2 hold ONLY
    unpublished tables — their ack rows must still appear at their
    commit LSNs, flagged acked_without_data, and their LSNs must sit
    beyond every emitted data LSN (lsn2 > lsn1)."""
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        cdc_empty_txn_ack,
    )

    rows = []
    # txn 0: events 0-9, two purchases
    for eid in range(10):
        et = "purchase" if eid in (3, 7) else "click"
        rows.append((eid, T0, 1, et, 1.0))
    # txns 1-2: events 10-29, no purchases at all
    for eid in range(10, 30):
        rows.append((eid, T0, 1, "view", 1.0))
    sf = _write_events(spark, tmp_path, rows)
    got = {r["xid"]: r for r in cdc_empty_txn_ack(spark, sf).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["n_emitted"] == 2 and got[0]["acked_without_data"] is False
    for xid in (1, 2):
        r = got[xid]
        assert r["n_emitted"] == 0 and r["acked_without_data"] is True
        assert r["ack_lsn"] == (xid * 10 + 9) * 4 + 3
        # the reference's lsn2 > lsn1: the empty txn's ack is beyond
        # the last emitted data LSN (7*4+2 = 30)
        assert r["ack_beyond_emitted"] is True
        assert r["ack_lsn"] > 7 * 4 + 2


def test_empty_txn_ack_prefix_scan_multibucket(spark, tmp_path):
    """The two-phase prefix max (ack_emitted_high) must equal the
    naive global running max even when the txns span many buckets —
    bucket=16 over 40 txns forces 3 buckets, exercising the exclusive
    bucket-prefix broadcast + bucket-local window composition."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        ack_emitted_high,
        ack_txn_table,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    rows = []
    # 40 txns x 10 events; purchases scattered so last_emit is null
    # for some txns and the running max crosses bucket boundaries
    for eid in range(400):
        et = "purchase" if eid % 37 == 3 else "view"
        rows.append((eid, T0, 1, et, 1.0))
    sf = _write_events(spark, tmp_path, rows)
    t = ack_txn_table(load(spark, sf, "events"))
    got = {
        r["xid"]: r["emitted_high"]
        for r in ack_emitted_high(t, bucket=16).collect()
    }
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("xid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["xid"]: r["eh"]
        for r in t.select(
            "xid", F.max("last_emit").over(w).alias("eh")
        ).collect()
    }
    assert len(got) == 40 and got == want


def test_empty_txn_ack_no_global_window_over_txn_rows(spark, sf_small):
    """Plan audit for the r6 verdict's scale finding: the txn-grain
    running max must be a bucket-partitioned window; the only
    unpartitioned window allowed is the one over the metadata-sized
    bucket table (orders by ack_bucket, not xid)."""
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    plan = (
        all_queries()["cdc_empty_txn_ack"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        spec = line[line.index("windowspecdefinition(") :]
        if "xid#" in spec.split(",")[0] or ", xid#" in spec.split(")")[0]:
            # txn-grain ordering -> must be partitioned by the bucket
            assert "ack_bucket#" in spec, line
        else:
            # bucket-grain window: orders by ack_bucket only
            assert "ack_bucket#" in spec, line


def test_implicit_decompression_marker_first_touch_only(spark, tmp_path):
    """A30 planted scenario: one compressed chunk receives inserts
    from two transactions — exactly ONE '$d' marker appears, carries
    the FIRST transaction's xid, and sorts before every insert of the
    chunk (pos_in_chunk == 1); the head chunk emits nothing."""
    import datetime as dt

    from timescaledb_event_streamer_spark.catalog.chunks import CHUNK_INTERVAL_S
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        cdc_implicit_decompression,
    )

    old = T0
    head = T0 + dt.timedelta(seconds=3 * CHUNK_INTERVAL_S)
    rows = [
        # old (compressed) chunk: inserts from txn 0 (eids 3, 5) and
        # txn 1 (eid 105); eid 10 is a delete (op 'd') — not an insert
        (3, old, 1, "metrics", 1.0),
        (5, old, 1, "metrics", 2.0),
        (10, old, 1, "metrics", 0.0),
        (105, old, 1, "metrics", 3.0),
        # head chunk traffic (never compressed)
        (207, head, 1, "metrics", 4.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = sorted(
        cdc_implicit_decompression(spark, sf).collect(),
        key=lambda r: r["lsn"],
    )
    markers = [r for r in out if r["kind"] == "$d"]
    inserts = [r for r in out if r["kind"] == "c"]
    assert len(markers) == 1 and len(inserts) == 3
    m = markers[0]
    assert m["xid"] == 0  # first-touch transaction
    assert m["lsn"] == 3 * 4 + 2 - 1  # just before the first insert
    assert m["pos_in_chunk"] == 1
    assert [r["lsn"] for r in inserts] == [14, 22, 422]
    assert [r["pos_in_chunk"] for r in inserts] == [2, 3, 4]
    # head-chunk insert (eid 207) emitted nothing
    assert all(r["range_start_s"] == inserts[0]["range_start_s"] for r in out)


def test_known_chunks_reload_pause_scenario(spark, tmp_path):
    """A31 planted scenario: chunks 0-1 exist before the pause point
    (P = max_lsn/2); chunk 2 is created entirely while paused. On
    resume: 0-1 keep (no re-snapshot), 2 routes to publish+snapshot
    with its buffered rows, and needs_snapshot <=> no pre-pause
    events."""
    import datetime as dt

    from timescaledb_event_streamer_spark.catalog.chunks import CHUNK_INTERVAL_S
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        cdc_known_chunks_reload,
    )

    c = dt.timedelta(seconds=CHUNK_INTERVAL_S)
    rows = [
        # chunk 0: events 0-3 (pre-pause; P = 10//2 = 5)
        (0, T0, 1, "m", 1.0), (1, T0, 1, "m", 1.0),
        (2, T0, 1, "m", 1.0), (3, T0, 1, "m", 1.0),
        # chunk 1: event 4 pre-pause, 7 post-pause (known, streams on)
        (4, T0 + c, 1, "m", 1.0), (7, T0 + c, 1, "m", 1.0),
        # chunk 2: events 8-10 all post-pause (created while paused)
        (8, T0 + 2 * c, 1, "m", 1.0), (9, T0 + 2 * c, 1, "m", 1.0),
        (10, T0 + 2 * c, 1, "m", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["range_start_s"]: r for r in cdc_known_chunks_reload(spark, sf).collect()
    }
    assert len(got) == 3
    by_order = [got[k] for k in sorted(got)]
    c0, c1, c2 = by_order
    assert c0["status"] == "known" and c0["action"] == "keep"
    assert c0["needs_snapshot"] is False and c0["n_post_pause"] == 0
    assert c1["status"] == "known" and c1["n_pre_pause"] == 1
    assert c1["n_post_pause"] == 1  # buffered rows stream on resume
    assert c2["status"] == "discovered"
    assert c2["action"] == "publish+snapshot"
    assert c2["needs_snapshot"] is True and c2["n_pre_pause"] == 0
    assert c2["n_post_pause"] == 3 and c2["first_lsn"] == 8
