"""wal2json v2 parser tests (sources/wal2json.py): hand-crafted
documents covering every action kind, replica-identity images, LSN
hex math, and transaction-marker dropping — the unit-level contract
mirroring the reference's decoder tests."""

from __future__ import annotations

from timescaledb_event_streamer_spark.sources.wal2json import (
    lsn_to_long,
    parse_wal2json,
)

SAMPLES = [
    # begin/commit markers must be dropped
    '{"action":"B","xid":777,"lsn":"0/10"}',
    '{"action":"C","xid":777,"lsn":"0/20"}',
    # insert: columns only
    '{"action":"I","schema":"public","table":"metrics","lsn":"0/16B2B68",'
    '"timestamp":"2024-01-02 03:04:05.000000+00","xid":777,'
    '"columns":[{"name":"id","type":"bigint","value":1},'
    '{"name":"temp","type":"double precision","value":21.5}]}',
    # update: columns + identity (replica identity key image)
    '{"action":"U","schema":"public","table":"metrics","lsn":"0/16B2C00",'
    '"timestamp":"2024-01-02 03:04:06.000000+00","xid":778,'
    '"columns":[{"name":"id","type":"bigint","value":1},'
    '{"name":"temp","type":"double precision","value":22.0}],'
    '"identity":[{"name":"id","type":"bigint","value":1}]}',
    # delete: identity only
    '{"action":"D","schema":"public","table":"metrics","lsn":"1/0",'
    '"timestamp":"2024-01-02 03:04:07.000000+00","xid":779,'
    '"identity":[{"name":"id","type":"bigint","value":1}]}',
    # truncate
    '{"action":"T","schema":"public","table":"metrics","lsn":"1/A",'
    '"timestamp":"2024-01-02 03:04:08.000000+00","xid":780}',
    # logical decoding message
    '{"action":"M","schema":"public","lsn":"1/B",'
    '"timestamp":"2024-01-02 03:04:09.000000+00","xid":781,'
    '"prefix":"wal-heartbeat","content":"ping"}',
]


def _parsed(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["value"])
    rows = parse_wal2json(df).orderBy("lsn").collect()
    return {r["op"]: r for r in rows}, rows


def test_markers_dropped_and_ops_mapped(spark):
    by_op, rows = _parsed(spark)
    assert len(rows) == 5  # B/C dropped
    assert set(by_op) == {"c", "u", "d", "t", "m"}


def test_images_follow_action(spark):
    by_op, _ = _parsed(spark)
    ins, upd, dele = by_op["c"], by_op["u"], by_op["d"]
    assert ins["before"] is None and ins["after"] == {"id": "1", "temp": "21.5"}
    assert upd["before"] == {"id": "1"} and upd["after"]["temp"] == "22.0"
    assert dele["after"] is None and dele["before"] == {"id": "1"}


def test_lsn_hex_math(spark):
    by_op, _ = _parsed(spark)
    assert by_op["c"]["lsn"] == 0x16B2B68
    assert by_op["d"]["lsn"] == (1 << 32)  # '1/0'
    assert by_op["t"]["lsn"] == (1 << 32) + 0xA
    df = spark.createDataFrame([("FFFFFFFF/FFFFFFFF",)], ["l"])
    assert df.select(lsn_to_long(df["l"]).alias("v")).first()["v"] == -1  # wraps 2^64-1


def test_topic_and_metadata(spark):
    by_op, _ = _parsed(spark)
    assert by_op["c"]["topic"] == "timescaledb.public.metrics"
    assert by_op["m"]["topic"] == "timescaledb.public.$messages"
    assert by_op["m"]["message_prefix"] == "wal-heartbeat"
    assert by_op["m"]["message_content"] == "ping"
    assert by_op["u"]["xid"] == 778
    assert by_op["c"]["ts_ms"] == 1704164645000


def test_streaming_parse(spark, tmp_path):
    """The same parser runs under Structured Streaming (file source
    -> memory sink) — batch/stream parity for the ingestion seam."""
    src = tmp_path / "wal"
    src.mkdir()
    (src / "batch0.json").write_text("\n".join(SAMPLES))
    stream = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(src))
    )
    q = (
        parse_wal2json(stream)
        .writeStream.format("memory")
        .queryName("wal2json_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT op FROM wal2json_mem").collect()
    finally:
        q.stop()
    assert sorted(r["op"] for r in got) == ["c", "d", "m", "t", "u"]


from hypothesis import given, settings
from hypothesis import strategies as st

# text values incl. JSON-hostile characters (quotes, backslashes,
# newlines, unicode) — the codec must survive anything PG TEXT holds
_VALS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2**62 - 1), st.integers(0, 10_000), _VALS),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_wal2json_value_roundtrip_property(spark, rows):
    """Synthesized-then-parsed values survive arbitrary text payloads:
    to_json escaping and from_json parsing are exact inverses for the
    after-image, and the hex LSN round-trips every non-negative long."""
    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.sources.wal2json import (
        parse_wal2json,
        synthesize_wal2json,
    )

    events = spark.createDataFrame(
        [(eid, __import__("datetime").datetime(2024, 1, 1), uid, "click", 1.5, props)
         for eid, uid, props in rows],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    got = {
        r["lsn"]: r
        for r in parse_wal2json(synthesize_wal2json(events)).collect()
    }
    for eid, uid, props in rows:
        assert eid in got, f"lsn {eid} lost in round-trip"
        r = got[eid]
        if r["op"] in ("c", "u"):
            assert r["after"]["props"] == props
            assert r["after"]["user_id"] == str(uid)
        else:
            assert r["before"]["user_id"] == str(uid)
