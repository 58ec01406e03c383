"""pgoutput binary frame codec tests (sources/pgoutput.py): frame
anatomy, tuple/key images per op, PG-epoch commit timestamps, relation
cstring decode, and the segmented transaction attach — including a
transaction whose data frames cross an LSN-segment boundary, which
exercises the cross-segment carry instead of the in-segment LOCF."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sources.pgoutput import (
    SEGMENT_BITS,
    parse_pgoutput,
    relation_catalog,
    synthesize_pgoutput,
)

TS = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, TS, uid, et, val, props) for eid, uid, et, val, props in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_frame_wire_anatomy(spark):
    ev = _events(spark, [(3, 7, "metrics", 20.5, "p")])  # op 'c' (3 % 10)
    frames = {f["frame"][50:52]: f["frame"] for f in synthesize_pgoutput(ev).collect()}
    assert set(frames) == {"42", "43", "52", "49"}  # B, C, R, I
    ins = frames["49"]
    assert ins[:2] == "77"  # XLogData wrapper
    assert int(ins[2:18], 16) == 3 * 4 + 2  # walStart = event LSN
    # I payload: relid(4B) then 'N' then ncols=3
    assert ins[60:62] == "4E"
    assert int(ins[62:66], 16) == 3


def test_roundtrip_images_per_op(spark):
    ev = _events(
        spark,
        [
            (3, 7, "metrics", 20.5, "pr"),   # c
            (11, 8, "metrics", 1.25, "qx"),  # u (11 % 10 == 1)
            (20, 9, "metrics", 0.0, "zz"),   # d (20 % 10 == 0)
        ],
    )
    rows = {r["op"]: r for r in parse_pgoutput(synthesize_pgoutput(ev)).collect()}
    assert set(rows) == {"c", "u", "d"}

    ins, upd, dele = rows["c"], rows["u"], rows["d"]
    assert ins["after_user_id"] == 7 and ins["after_cents"] == 2050
    assert ins["after_props"] == "pr" and ins["before_user_id"] is None
    assert upd["before_user_id"] == 8 and upd["after_cents"] == 125
    assert dele["before_user_id"] == 9 and dele["after_user_id"] is None
    assert dele["after_cents"] is None and dele["after_props"] is None
    for r in rows.values():
        assert r["topic"] == "timescaledb.public.metrics"
        assert r["source_schema"] == "public"
        assert r["source_table"] == "metrics"
        # commit ts of the (single) txn: every op carries it
        assert r["ts_ms"] == int(TS.timestamp() * 1000)


def test_relation_catalog_cstrings(spark):
    ev = _events(spark, [(3, 1, "metrics_v2", 1.0, "p"), (4, 1, "clicks", 2.0, "q")])
    cat = {r["relname"]: r for r in relation_catalog(synthesize_pgoutput(ev)).collect()}
    assert set(cat) == {"metrics_v2", "clicks"}
    assert all(r["namespace"] == "public" for r in cat.values())
    assert len({r["relid"] for r in cat.values()}) == 2


def test_xid_attach_across_segment_boundary(spark):
    """Transaction 10's B frame (LSN 4000) sits in segment 0; its later
    data frames (LSN > 4096) sit in segment 1, which contains no B
    frame — only the cross-segment carry can label them."""
    seg_size = 1 << SEGMENT_BITS
    eids = [1003, 1013, 1024, 1045, 1087, 1099]  # xid 10, LSNs 4014..4398
    assert any(e * 4 + 2 > seg_size for e in eids)
    assert 10 * 400 < seg_size
    ev = _events(spark, [(e, 1, "metrics", 1.0, "p") for e in eids])
    rows = parse_pgoutput(synthesize_pgoutput(ev)).collect()
    assert len(rows) == len(eids)
    assert {r["xid"] for r in rows} == {10}
    boundary_rows = [r for r in rows if r["lsn"] > seg_size]
    assert boundary_rows, "test data must cross the segment boundary"


def test_lsn_order_and_props_roundtrip_hostile_text(spark):
    """Props with JSON/hex-hostile content survive the length-prefixed
    byte encoding (no terminator search on values)."""
    hostile = 'a"b\\c\nd\x01eé'
    ev = _events(spark, [(3, 1, "m", 1.0, hostile), (4, 2, "m", 2.0, "")])
    rows = sorted(
        parse_pgoutput(synthesize_pgoutput(ev)).collect(), key=lambda r: r["lsn"]
    )
    assert [r["lsn"] for r in rows] == [14, 18]
    assert rows[0]["after_props"] == hostile
    assert rows[1]["after_props"] == ""


def test_streaming_decode_matches_batch(spark, tmp_path):
    """The stateless frame decode runs identically under Structured
    Streaming (file source of raw frames -> decode -> stream-static
    broadcast join with the relation catalog -> memory sink) — the
    live replication path's shape (I7 + the binary codec)."""
    from timescaledb_event_streamer_spark.sources.pgoutput import decode_frames

    ev = _events(
        spark,
        [(3, 7, "metrics", 20.5, "p"), (11, 8, "clicks", 1.25, "q"),
         (20, 9, "metrics", 0.0, "z")],
    )
    frames = synthesize_pgoutput(ev)
    path = str(tmp_path / "frames")
    frames.write.mode("overwrite").parquet(path)

    cat = relation_catalog(spark.read.parquet(path))  # static side

    def envelope(df):
        return (
            decode_frames(df)
            .filter(F.col("op").isNotNull())
            .join(F.broadcast(cat), "relid")
            .select("lsn", "op", "relname", "_key_uid", "_new_uid",
                    "after_cents_s", "after_props")
        )

    batch = {tuple(r) for r in envelope(spark.read.parquet(path)).collect()}

    stream = spark.readStream.schema("frame string").parquet(path)
    q = (
        envelope(stream)
        .writeStream.format("memory")
        .queryName("pgoutput_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in spark.sql("SELECT * FROM pgoutput_mem").collect()}
    finally:
        q.stop()
    assert streamed == batch and len(batch) == 3


from hypothesis import given, settings
from hypothesis import strategies as st

_PROPS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2**40), st.integers(0, 10_000), _PROPS),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    )
)
def test_pgoutput_roundtrip_property(spark, rows):
    """Arbitrary text payloads and event ids survive the binary tuple
    encoding: length prefixes are byte counts (multi-byte UTF-8 safe)
    and values never collide with frame markers."""
    ev = _events(spark, [(eid, uid, "m", 1.0, props) for eid, uid, props in rows])
    got = {r["lsn"]: r for r in parse_pgoutput(synthesize_pgoutput(ev)).collect()}
    assert len(got) == len(rows)
    for eid, uid, props in rows:
        r = got[eid * 4 + 2]
        op = "d" if eid % 10 == 0 else ("u" if eid % 10 in (1, 2) else "c")
        assert r["op"] == op
        assert r["key_user_id"] == uid
        if op != "d":
            assert r["after_props"] == props


def test_pgoutput_envelope_stream_matches_batch(spark, tmp_path):
    """End-to-end LIVE binary path: streamed frames -> decode ->
    stateful transaction tracker -> relation join, row-identical to
    the batch parse — including a transaction whose B frame arrives in
    an earlier micro-batch than its data frames (carried state)."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_pgoutput,
        pgoutput_envelope_stream,
    )

    eids = [3, 11, 20, 105, 111, 207]  # 3 txns (0, 1, 2), mixed ops
    ev = _events(spark, [(e, e % 7, "metrics", 1.5, f"p{e}") for e in eids])
    frames = synthesize_pgoutput(ev)

    d = str(tmp_path / "framelog")
    # two LSN-ordered deliveries: txn 0+1 frames, then txn 2's
    split_lsn = 2 * 400
    frames.filter(_u_frame_lsn() < split_lsn).coalesce(1).write.mode("append").parquet(d)
    frames.filter(_u_frame_lsn() >= split_lsn).coalesce(1).write.mode("append").parquet(d)

    cat = relation_catalog(spark.read.parquet(d))
    cols = ("lsn", "op", "topic", "xid", "ts_ms", "key_user_id",
            "before_user_id", "after_user_id", "after_cents", "after_props")

    batch = {
        tuple(r[c] for c in cols) for r in parse_pgoutput(frames).collect()
    }

    stream = (
        spark.readStream.schema("frame string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        pgoutput_envelope_stream(stream, cat)
        .writeStream.format("memory")
        .queryName("pgout_stream_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        streamed = {
            tuple(r[c] for c in cols)
            for r in spark.sql("SELECT * FROM pgout_stream_mem").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and len(batch) == len(eids)


def _u_frame_lsn():
    """walStart of an XLogData frame (hex chars 3-18)."""
    return F.conv(F.col("frame").substr(F.lit(3), F.lit(16)), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# admin frames (T / M / Y / O) — golden wire bytes built by hand, so
# the decode is tested independently of synthesize_admin_frames (the
# registered query's oracle covers the round-trip; this covers decode
# against the frame anatomy spec itself)


def _xlog(wal_start: int, payload: str) -> str:
    h = format(wal_start, "016X")
    return "77" + h + h + "0" * 16 + payload


def _hx(s: str) -> str:
    return s.encode().hex().upper() + "00"


def test_admin_frames_golden_decode(spark):
    from timescaledb_event_streamer_spark.sources.pgoutput import parse_admin_frames

    frames = [
        # M: flags=transactional, embedded lsn 42, prefix 'evt', content 'hello'
        _xlog(42, "4D" + "01" + format(42, "016X") + _hx("evt")
              + "00000005" + "hello".encode().hex().upper()),
        # T: 2 relations, options CASCADE|RESTART (3)
        _xlog(99, "54" + "00000002" + "03" + "00004001" + "00004002"),
        # Y: typoid 0x5001, public.metrics_t
        _xlog(0, "59" + "00005001" + _hx("public") + _hx("metrics_t")),
        # O: commit lsn 100, origin 'origin1'
        _xlog(100, "4F" + format(100, "016X") + _hx("origin1")),
        # R catalog rows the T decode resolves against (ncols=0 tail)
        _xlog(0, "52" + "00004001" + _hx("public") + _hx("tbl_a") + "64" + "0000"),
        _xlog(0, "52" + "00004002" + _hx("public") + _hx("tbl_b") + "64" + "0000"),
    ]
    df = spark.createDataFrame([(f,) for f in frames], "frame string")
    collected = parse_admin_frames(df).collect()
    rows = {(r["op"], r["source_table"]): r for r in collected}
    m = rows[("m", None)]
    assert (m["lsn"], m["prefix"], m["content"], m["transactional"]) == (
        42, "evt", "hello", "true",
    )
    ta, tb = rows[("t", "tbl_a")], rows[("t", "tbl_b")]
    for t in (ta, tb):
        assert (t["lsn"], t["cascade_opt"], t["restart_identity"]) == (
            99, "true", "true",
        )
    y = rows[("y", "metrics_t")]
    assert (y["lsn"], y["prefix"]) == (0, "public")
    o = next(r for r in collected if r["op"] == "o")
    assert (o["lsn"], o["prefix"]) == (100, "origin1")


def test_admin_truncate_options_bits(spark):
    from timescaledb_event_streamer_spark.sources.pgoutput import parse_admin_frames

    # options=1 → CASCADE only; options=2 → RESTART IDENTITY only
    frames = [
        _xlog(7, "54" + "00000001" + "01" + "00004001"),
        _xlog(8, "54" + "00000001" + "02" + "00004002"),
        _xlog(0, "52" + "00004001" + _hx("public") + _hx("a") + "64" + "0000"),
        _xlog(0, "52" + "00004002" + _hx("public") + _hx("b") + "64" + "0000"),
    ]
    df = spark.createDataFrame([(f,) for f in frames], "frame string")
    out = {r["source_table"]: r for r in parse_admin_frames(df).collect()}
    assert (out["a"]["cascade_opt"], out["a"]["restart_identity"]) == ("true", "false")
    assert (out["b"]["cascade_opt"], out["b"]["restart_identity"]) == ("false", "true")


def test_admin_frames_streaming_parity(spark, tmp_path):
    """parse_admin_frames is stateless (projections + filter + explode
    + broadcast catalog join), so the SAME function runs under
    Structured Streaming unmodified — the live path for truncate
    fan-out and logical-decoding messages. Batch and stream must agree
    row-for-row."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_admin_frames,
        synthesize_admin_frames,
    )

    ev = _events(
        spark,
        [(5, 7, "metrics", 20.5, "hello"), (15, 8, "clicks", 1.25, "world"),
         (25, 9, "metrics", 0.0, "zz"), (30, 9, "clicks", 3.5, "w")],
    )
    path = str(tmp_path / "admin_frames")
    synthesize_admin_frames(ev).write.mode("overwrite").parquet(path)

    batch = {tuple(r) for r in parse_admin_frames(spark.read.parquet(path)).collect()}
    assert batch  # m (ids 5,15,25) + t/y per table + o

    stream = spark.readStream.schema("frame string").parquet(path)
    q = (
        parse_admin_frames(stream)
        .writeStream.format("memory")
        .queryName("admin_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in spark.sql("SELECT * FROM admin_mem").collect()}
    finally:
        q.stop()
    assert streamed == batch


def test_cross_codec_envelope_consistency(spark):
    """The JSON (wal2json) and BINARY (pgoutput) wire paths over the
    SAME transaction log must recover identical envelopes: op, topic
    routing, schema/table, transaction id, key and after-image values.
    Each codec has its own LSN layout (wal2json: event_id as hi/lo;
    pgoutput: 4*event_id + 2), so rows align on the recovered event id
    — everything else must match field-for-field."""
    from timescaledb_event_streamer_spark.sources.wal2json import (
        parse_wal2json,
        synthesize_wal2json,
    )

    ev = _events(
        spark,
        [(3, 7, "metrics", 20.5, "pr"), (11, 8, "metrics", 1.25, "qx"),
         (20, 9, "clicks", 0.0, "zz"), (105, 4, "clicks", 7.75, "ab"),
         (111, 5, "metrics", 2.5, "cd"), (207, 6, "clicks", 9.0, "ef")],
    )

    wal = parse_wal2json(synthesize_wal2json(ev))
    w_rows = {
        r["lsn"]: r
        for r in wal.select(
            "lsn", "topic", "op", "source_schema", "source_table", "xid",
            F.col("after")["user_id"].alias("after_uid"),
            F.col("after")["props"].alias("after_props"),
            F.col("before")["user_id"].alias("before_uid"),
        ).collect()
    }
    p_rows = {
        (r["lsn"] - 2) // 4: r
        for r in parse_pgoutput(synthesize_pgoutput(ev)).collect()
    }
    assert set(w_rows) == set(p_rows) == {3, 11, 20, 105, 111, 207}
    for eid, p in p_rows.items():
        w = w_rows[eid]
        assert (w["topic"], w["op"]) == (p["topic"], p["op"])
        assert (w["source_schema"], w["source_table"]) == (
            p["source_schema"], p["source_table"],
        )
        assert w["xid"] == p["xid"]
        a_uid = int(w["after_uid"]) if w["after_uid"] is not None else None
        b_uid = int(w["before_uid"]) if w["before_uid"] is not None else None
        assert a_uid == p["after_user_id"]
        assert b_uid == p["before_user_id"]
        assert w["after_props"] == p["after_props"]


def test_admin_message_content_hostile_text(spark):
    """M-frame content is length-prefixed raw bytes: multi-byte UTF-8,
    quotes, control chars, and empty strings must survive the
    encode/decode unchanged (byte-count prefixes, not terminators)."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_admin_frames,
        synthesize_admin_frames,
    )

    hostile = ['a"b\\c\nd\x01eé', "", "null\x07\x00after".replace("\x00", ""), "日本語🙂"]
    # event ids ending in 5 produce M frames
    ev = _events(
        spark,
        [(5 + 10 * i, i, "metrics", 1.0, props) for i, props in enumerate(hostile)],
    )
    out = {
        r["lsn"]: r["content"]
        for r in parse_admin_frames(synthesize_admin_frames(ev)).collect()
        if r["op"] == "m"
    }
    assert len(out) == len(hostile)
    for i, props in enumerate(hostile):
        assert out[(5 + 10 * i) * 4 + 1] == props


def test_keepalive_wire_anatomy(spark):
    """'k' frame: 1-byte tag + ServerWALEnd(8B BE) + ServerTime(8B BE,
    micros since the PG epoch) + ReplyRequested(1B) — 18 bytes / 36
    hex chars exactly (replicationhandler.go:163-176)."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        PG_EPOCH_OFFSET_US,
        synthesize_copydata,
    )

    # event_id 15 -> keepalive (15 % 5 == 0) with reply bit (15 % 15)
    ev = _events(spark, [(15, 1, "metrics", 1.0, "p")])
    [row] = synthesize_copydata(ev).collect()
    frame = row["frame"]
    assert row["slot"] == "metrics"
    assert len(frame) == 36  # 1B tag + 8B + 8B + 1B = 18 bytes
    assert frame[:2] == "6B"
    assert int(frame[2:18], 16) == 15 * 4 + 2  # serverWalEnd
    pg_us = int(frame[18:34], 16)
    assert pg_us == int(TS.timestamp() * 1_000_000) - PG_EPOCH_OFFSET_US
    assert frame[34:36] == "01"  # reply requested


def test_standby_status_roundtrip(spark):
    """Received LSN = WALStart + len(WALData)
    (replicationcontext.go:241-249); standby write == apply ==
    received + 1 (replicationconnection.go:94-105); keepalives and
    reply-requested counted per slot; multi-byte props lengths are
    BYTE lengths, not char lengths."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_standby_status,
        synthesize_copydata,
    )

    ev = _events(
        spark,
        [
            (1, 1, "m", 1.0, "abc"),      # w: lsn 6, payload 3B
            (2, 1, "m", 1.0, "éé"),       # w: lsn 10, payload 4B (2x2)
            (5, 1, "m", 1.0, "ignored"),  # k: wal_end 22, no reply
            (15, 1, "m", 1.0, "x"),       # k: wal_end 62, reply
            (3, 1, "other", 1.0, "zz"),   # w on a second slot
        ],
    )
    out = {r["slot"]: r for r in
           parse_standby_status(synthesize_copydata(ev)).collect()}
    m = out["m"]
    assert m["n_frames"] == 4 and m["n_keepalive"] == 2 and m["n_xlog"] == 2
    assert m["n_reply_requested"] == 1
    assert m["last_received_lsn"] == 10 + 4  # lsn(eid 2) + byte len('éé')
    assert m["standby_write_lsn"] == 15 and m["standby_apply_lsn"] == 15
    assert m["max_keepalive_wal_end"] == 62
    assert m["last_server_time_ms"] == int(TS.timestamp() * 1000)
    o = out["other"]
    assert o["n_keepalive"] == 0 and o["n_xlog"] == 1
    assert o["max_keepalive_wal_end"] is None
    assert o["last_received_lsn"] == 3 * 4 + 2 + 2


from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),            # event_id
            st.text(
                alphabet=st.characters(codec="utf-8",
                                       blacklist_categories=("Cs",)),
                max_size=12,
            ),                                  # props payload
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_standby_status_property(spark, rows):
    """For any frame mix, the parsed posture must equal the
    directly-computed reference: received LSN from byte lengths,
    counters from the id-derived frame kinds."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_standby_status,
        synthesize_copydata,
    )

    ev = _events(spark, [(eid, 1, "s", 1.0, props) for eid, props in rows])
    [got] = parse_standby_status(synthesize_copydata(ev)).collect()
    ks = [eid for eid, _ in rows if eid % 5 == 0]
    ws = [(eid, props) for eid, props in rows if eid % 5 != 0]
    assert got["n_keepalive"] == len(ks)
    assert got["n_xlog"] == len(ws)
    assert got["n_reply_requested"] == len([k for k in ks if k % 15 == 0])
    want_recv = max(
        (eid * 4 + 2 + len(props.encode("utf-8")) for eid, props in ws),
        default=None,
    )
    assert got["last_received_lsn"] == want_recv
    if want_recv is not None:
        assert got["standby_write_lsn"] == want_recv + 1
    assert got["max_keepalive_wal_end"] == (max(ks) * 4 + 2 if ks else None)


def test_relation_versioning_resolves_as_of_lsn(spark):
    """A relation re-announced mid-stream flips the schema for LATER
    data frames only; the version table carries one interval per
    announcement (typemanager decoder-plan rebuild semantics)."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        relation_versions,
        resolve_schema_versions,
        synthesize_versioned_log,
    )

    # max eid 100 -> v2 threshold at LSN 200; eids 10/40 decode v1
    # (LSNs 42/162), eids 60/100 decode v2 (LSNs 242/402)
    ev = _events(spark, [(e, 1, "m", 1.0, "p") for e in (10, 40, 60, 100)])
    log = synthesize_versioned_log(ev)
    vers = {r["from_lsn"]: r for r in relation_versions(log).collect()}
    assert set(vers) == {0, 200}
    assert vers[0]["n_cols"] == 3 and vers[200]["n_cols"] == 4
    assert vers[0]["to_lsn"] == 200
    out = {r["schema_version_cols"]: r
           for r in resolve_schema_versions(log).collect()}
    assert out[3]["n_events"] == 2 and out[3]["last_lsn"] == 162
    assert out[4]["n_events"] == 2 and out[4]["first_lsn"] == 242


def test_relation_versioning_streaming_parity(spark, tmp_path):
    """The schema-version resolve is a stream-static broadcast
    interval join: streamed frames against the statically-decoded
    version table produce the same per-version ledger as batch."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        decode_frames,
        relation_versions,
        resolve_schema_versions,
        synthesize_versioned_log,
    )

    ev = _events(spark, [(e, 1, "m", 1.0, "p") for e in (10, 40, 60, 100)])
    log = synthesize_versioned_log(ev)
    path = str(tmp_path / "frames")
    log.write.mode("overwrite").parquet(path)

    static_frames = spark.read.parquet(path)
    vers = relation_versions(static_frames)
    stream = spark.readStream.schema("frame string").parquet(path)
    data = decode_frames(stream).filter(F.col("op").isNotNull()).select("relid", "lsn")
    joined = data.join(
        F.broadcast(vers),
        (data["relid"] == vers["relid"])
        & (data["lsn"] >= vers["from_lsn"])
        & (data["lsn"] < vers["to_lsn"]),
    ).select("relname", "n_cols", "lsn")
    q = (
        joined.writeStream.format("memory")
        .queryName("vers_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["relname"], r["n_cols"], r["lsn"])
        for r in spark.sql("SELECT * FROM vers_stream").collect()
    }
    want_batch = resolve_schema_versions(static_frames).collect()
    assert len(got) == 4
    assert {(v, n) for _, v, n, *_ in
            [(r["source_table"], r["schema_version_cols"], r["n_events"])
             for r in want_batch]} == {(3, 2), (4, 2)}
    assert {(3 if lsn < 200 else 4) for _, _, lsn in got} == {3, 4}
    for name, ncols, lsn in got:
        assert ncols == (3 if lsn < 200 else 4) and name == "m"


def test_decode_ignores_interleaved_keepalives(spark):
    """A mixed CopyData stream (keepalive 'k' frames between XLogData
    'w' frames, as a live connection delivers) must decode the data
    frames and silently skip the keepalives — an 18-byte 'k' frame has
    no payload at the XLogData message offset and must never be
    misread as one."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        decode_frames,
        synthesize_copydata,
        synthesize_pgoutput,
    )

    ev = _events(spark, [(e, 1, "m", 1.0, f"p{e}") for e in (3, 5, 10, 23)])
    mixed = synthesize_pgoutput(ev).unionByName(
        synthesize_copydata(ev).select("frame")
    )
    rows = decode_frames(mixed).filter(F.col("op").isNotNull()).collect()
    # every event decodes exactly once despite the interleaved 'k's
    # (eids 5 and 10 also appear as keepalives in the copydata mix)
    assert sorted(r["lsn"] for r in rows) == [e * 4 + 2 for e in (3, 5, 10, 23)]


def test_corrupt_frames_never_kill_the_query(spark):
    """Torn/corrupted frames (reconnect artifacts) must decode to
    nothing — not abort the job. Includes a frame whose u64 LSN field
    exceeds 2^63, which a plain ANSI cast would turn into a
    query-killing CAST_INVALID_INPUT."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        decode_frames,
        parse_admin_frames,
        parse_standby_status,
    )

    bad = ["", "77", "77ABC", "6B00", "ZZNOTHEX", "4D4D4D", "77" + "F" * 60]
    frames = spark.createDataFrame([(b,) for b in bad], "frame string")
    assert decode_frames(frames).filter("op IS NOT NULL").count() == 0
    assert parse_admin_frames(frames).count() == 0
    slotted = spark.createDataFrame([("s", b) for b in bad], "slot string, frame string")
    # the all-FF 'w' frame parses with a NULL lsn; posture stays sane
    [row] = parse_standby_status(slotted).collect()
    assert row["n_frames"] == len(bad)


def test_release_persisted_frames(spark):
    """The batch entry points persist their frame tables for
    multi-branch reuse; release_persisted_frames() reclaims the cached
    blocks eagerly for long-lived sessions (ADVICE r4) and is
    re-entrant — the next parse simply re-persists."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_pgoutput,
        release_persisted_frames,
        synthesize_pgoutput,
    )

    release_persisted_frames()  # drain anything earlier tests cached
    ev = _events(spark, [(3, 7, "metrics", 20.5, "p"), (11, 8, "clicks", 1.0, "q")])
    out = parse_pgoutput(synthesize_pgoutput(ev))
    assert out.count() > 0
    released = release_persisted_frames()
    assert released >= 1
    # re-entrant: a fresh parse works and re-registers its cache
    assert parse_pgoutput(synthesize_pgoutput(ev)).count() > 0
    assert release_persisted_frames() >= 1
    assert release_persisted_frames() == 0
