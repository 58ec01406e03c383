"""Golden-bytes tests for the replication handshake codecs
(sources/pg_replication.py) — reply streams built with struct.pack
exactly as a PostgreSQL server frames them (protocol v3), decoded by
the hex-codegen walk, values asserted field by field (the G4
golden-bytes discipline)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sources import pg_replication as pr


def _msg(t: bytes, body: bytes) -> bytes:
    return t + struct.pack(">I", len(body) + 4) + body


def _field(name: bytes, oid: int) -> bytes:
    return (
        name + b"\x00"
        + struct.pack(">I", 0) + struct.pack(">h", 0)
        + struct.pack(">I", oid)
        + struct.pack(">h", -1) + struct.pack(">i", -1)
        + struct.pack(">h", 0)
    )


def _dval(v: bytes | None) -> bytes:
    if v is None:
        return struct.pack(">i", -1)
    return struct.pack(">I", len(v)) + v


def _identify_stream() -> bytes:
    t = struct.pack(">h", 4) + b"".join(
        _field(n, o)
        for n, o in [
            (b"systemid", 25), (b"timeline", 23),
            (b"xlogpos", 25), (b"dbname", 25),
        ]
    )
    d = struct.pack(">h", 4) + b"".join(
        _dval(v)
        for v in [b"7229999999999999999", b"3", b"1/ABCDEF12", b"postgres"]
    )
    return _msg(b"T", t) + _msg(b"D", d) + _msg(b"C", b"IDENTIFY_SYSTEM\x00")


def _hex_df(spark, raw: bytes):
    return spark.createDataFrame([(raw.hex().upper(),)], "reply string")


def test_identify_system_golden_bytes(spark):
    out = pr.parse_identify_system(_hex_df(spark, _identify_stream())).collect()[0]
    assert out["declared_fields"] == "systemid,timeline,xlogpos,dbname"
    assert out["system_id"] == "7229999999999999999"
    assert out["timeline"] == 3
    assert out["xlogpos_text"] == "1/ABCDEF12"
    assert out["xlogpos_lsn"] == (1 << 32) + 0xABCDEF12
    assert out["dbname"] == "postgres"


def test_create_slot_reply_null_snapshot(spark):
    """Existing-slot path: snapshot_name comes back NULL (-1 length,
    replicationconnection.go:168 returns '' for found slots) — the
    DataRow walk must step over the NULL without shifting later
    columns."""
    t = struct.pack(">h", 4) + b"".join(
        _field(n, 25)
        for n in [b"slot_name", b"consistent_point",
                  b"snapshot_name", b"output_plugin"]
    )
    d = struct.pack(">h", 4) + b"".join(
        _dval(v) for v in [b"timescaledb", b"0/15D68C50", None, b"pgoutput"]
    )
    raw = _msg(b"T", t) + _msg(b"D", d) + _msg(b"C", b"CREATE_REPLICATION_SLOT\x00")
    out = pr.parse_create_slot_reply(_hex_df(spark, raw)).collect()[0]
    assert out["slot_name"] == "timescaledb"
    assert out["consistent_point_lsn"] == 0x15D68C50
    assert out["snapshot_name"] is None
    assert out["output_plugin"] == "pgoutput"


def test_copy_both_response(spark):
    raw = _msg(b"W", b"\x00" + struct.pack(">h", 2) + struct.pack(">hh", 0, 0))
    row = (
        _hex_df(spark, raw)
        .select(F.explode(pr.split_backend_messages(F.col("reply"))).alias("m"))
        .select(
            F.col("m.msg_type").alias("t"),
            pr.decode_copy_both(F.col("m.body")).alias("cb"),
        )
        .collect()
    )
    assert len(row) == 1 and row[0]["t"] == "W"
    assert row[0]["cb"]["overall_format"] == 0
    assert row[0]["cb"]["ncols"] == 2
    assert row[0]["cb"]["col_formats"] == [0, 0]


def test_stream_split_survives_torn_tail(spark):
    """A truncated trailing message (reconnect tear) must not kill the
    walk or the query — decoded prefix survives, tail is dropped (the
    try_cast discipline the pgoutput codec uses)."""
    good = _identify_stream()
    torn = good + b"D\x00\x00"  # type byte + half a length prefix
    msgs = (
        _hex_df(spark, torn)
        .select(pr.split_backend_messages(F.col("reply")).alias("m"))
        .collect()[0]["m"]
    )
    assert [m["msg_type"] for m in msgs] == ["T", "D", "C"]
    out = pr.parse_identify_system(_hex_df(spark, torn)).collect()[0]
    assert out["system_id"] == "7229999999999999999"


def test_lsn_text_roundtrip(spark):
    df = spark.createDataFrame(
        [(0,), (0xABCDEF12,), ((7 << 32) + 5,), ((0x7FFFFFFF << 32) + 0xFFFFFFFF,)],
        "lsn long",
    )
    out = df.select(
        "lsn", pr.lsn_from_text(pr.lsn_to_text(F.col("lsn"))).alias("rt")
    ).collect()
    for r in out:
        assert r["rt"] == r["lsn"], r


@pytest.mark.parametrize(
    "cf,off,xlog,want_lsn,want_src",
    [
        (500, None, 900, 500, "confirmed_flush"),   # slot ahead of storage
        (500, 700, 900, 700, "offset"),             # offset further ahead
        (500, 100, 900, 500, "confirmed_flush"),    # stale offset ignored
        (0, None, 900, 900, "xlog_pos"),            # fresh slot, no offset
        (0, 300, 900, 300, "offset"),               # only offset knows
        (None, None, 900, 900, "xlog_pos"),         # nothing stored at all
    ],
)
def test_restart_lsn_rule(spark, cf, off, xlog, want_lsn, want_src):
    """locateRestartLSN (replicationconnection.go:216-290): base =
    confirmed_flush, a further-ahead offset wins, zero falls back to
    the server xlogpos."""
    df = spark.createDataFrame(
        [(cf, off, xlog)], "cf long, off long, xlog long"
    )
    row = df.select(
        pr.restart_lsn(F.col("cf"), F.col("off"), F.col("xlog")).alias("lsn"),
        pr.restart_source(F.col("cf"), F.col("off"), F.col("xlog")).alias("src"),
    ).collect()[0]
    assert row["lsn"] == want_lsn
    assert row["src"] == want_src


def test_encode_decode_roundtrip_parity(spark):
    """Own encoder framing must be byte-compatible with the golden
    struct.pack framing (same header arithmetic, same field tails)."""
    enc = spark.range(1).select(
        pr.encode_query_reply(
            [
                (F.lit("systemid"), 25), (F.lit("timeline"), 23),
                (F.lit("xlogpos"), 25), (F.lit("dbname"), 25),
            ],
            [F.lit("7229999999999999999"), F.lit("3"),
             F.lit("1/ABCDEF12"), F.lit("postgres")],
            "IDENTIFY_SYSTEM",
        ).alias("reply")
    )
    got = enc.collect()[0]["reply"]
    assert got == _identify_stream().hex().upper()


def test_query_reply_roundtrip_property(spark):
    """Property: ANY single-row reply (field names, text values, NULLs,
    unicode payloads) survives encode_query_reply -> backend-message
    walk -> decode_data_row/decode_row_description intact. Exercises
    the length arithmetic on multi-byte UTF-8 and empty strings, which
    fixed-example goldens can miss."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name_st = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                               max_codepoint=0x7F),
        min_size=1, max_size=12,
    )
    val_st = st.one_of(
        st.none(),
        st.text(max_size=24).filter(lambda s: "\x00" not in s),
    )
    cases = st.lists(st.tuples(name_st, val_st), min_size=1, max_size=4)

    collected = []

    @settings(max_examples=25, deadline=None)
    @given(cases)
    def check(fields):
        collected.append(fields)

    check()

    # examples are generated up front (hypothesis drives only the
    # collection phase) so Spark execution stays outside @given —
    # shrinking never re-enters the JVM
    for fields in collected:
        n = len(fields)
        enc = spark.range(1).select(
            pr.encode_query_reply(
                [(F.lit(nm), 25) for nm, _ in fields],
                [None if v is None else F.lit(v) for _, v in fields],
                "SELECT 1",
            ).alias("reply")
        )
        stream = F.col("reply")
        msgs = pr.split_backend_messages(stream)
        t_body = F.filter(msgs, lambda m: m.getField("msg_type") == "T")[0][
            "body"
        ]
        d_body = F.filter(msgs, lambda m: m.getField("msg_type") == "D")[0][
            "body"
        ]
        row = enc.select(
            pr.decode_row_description(t_body, max_fields=n).alias("desc"),
            pr.decode_data_row(d_body, max_cols=n).alias("vals"),
        ).collect()[0]
        assert row["desc"]["nfields"] == n
        assert list(row["desc"]["names"]) == [nm for nm, _ in fields]
        assert list(row["vals"]) == [v for _, v in fields], fields
