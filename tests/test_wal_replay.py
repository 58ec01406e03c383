"""WAL replay contract test: a canned wal2json v2 byte log replayed
through the I3 streaming pipeline (source -> parse -> table filter ->
topic route -> memory sink), asserted row-for-row identical to the
batch parser over the same bytes.

This is the closest this environment gets to the reference's live
logical-replication path (internal/replication/replicationconnection/
+ replicationchannel/): the wire seam is exercised with real multi-
transaction frame sequences — B/C markers, I/U/D/T within a txn, a
logical-decoding message — arriving across multiple replay batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.catalog.tablefilter import TableFilter
from timescaledb_event_streamer_spark.sources.wal2json import parse_wal2json

# Two committed transactions plus an excluded table's traffic.
# Txn 900: insert + update on public.metrics.
# Txn 901: delete + truncate + a logical-decoding message.
# Txn 902: traffic on public.audit_log only — filtered out downstream.
WAL_LOG = {
    "batch0.json": [
        '{"action":"B","xid":900,"lsn":"0/1000"}',
        '{"action":"I","schema":"public","table":"metrics","lsn":"0/1010",'
        '"timestamp":"2024-03-01 10:00:00.000000+00","xid":900,'
        '"columns":[{"name":"id","type":"bigint","value":7},'
        '{"name":"temp","type":"double precision","value":20.5}]}',
        '{"action":"U","schema":"public","table":"metrics","lsn":"0/1020",'
        '"timestamp":"2024-03-01 10:00:01.000000+00","xid":900,'
        '"columns":[{"name":"id","type":"bigint","value":7},'
        '{"name":"temp","type":"double precision","value":21.0}],'
        '"identity":[{"name":"id","type":"bigint","value":7}]}',
        '{"action":"C","xid":900,"lsn":"0/1030"}',
    ],
    "batch1.json": [
        '{"action":"B","xid":901,"lsn":"0/2000"}',
        '{"action":"D","schema":"public","table":"metrics","lsn":"0/2010",'
        '"timestamp":"2024-03-01 10:05:00.000000+00","xid":901,'
        '"identity":[{"name":"id","type":"bigint","value":7}]}',
        '{"action":"T","schema":"public","table":"metrics","lsn":"0/2020",'
        '"timestamp":"2024-03-01 10:05:01.000000+00","xid":901}',
        '{"action":"M","schema":"public","lsn":"0/2030",'
        '"timestamp":"2024-03-01 10:05:02.000000+00","xid":901,'
        '"prefix":"app-signal","content":"resync"}',
        '{"action":"C","xid":901,"lsn":"0/2040"}',
        '{"action":"B","xid":902,"lsn":"0/3000"}',
        '{"action":"I","schema":"public","table":"audit_log","lsn":"0/3010",'
        '"timestamp":"2024-03-01 10:06:00.000000+00","xid":902,'
        '"columns":[{"name":"id","type":"bigint","value":1}]}',
        '{"action":"C","xid":902,"lsn":"0/3020"}',
    ],
}

FILTER = TableFilter(excludes=["public.audit_log"])


def _pipeline(lines_df):
    """The I3 shape over the WAL seam: parse -> filter -> route (the
    topic is already assigned by the parser; message events carry the
    $messages pseudo-table and a NULL source_table, which the filter
    must pass through)."""
    env = parse_wal2json(lines_df)
    return env.filter(
        F.col("source_table").isNull()
        | FILTER.column(F.col("source_schema"), F.col("source_table"))
    )


def _write_log(tmp_path):
    src = tmp_path / "wal"
    src.mkdir()
    for fname, lines in WAL_LOG.items():
        (src / fname).write_text("\n".join(lines))
    return src


def _key(r):
    return (r["lsn"], r["op"], r["topic"], r["xid"], r["before"], r["after"],
            r["ts_ms"], r["message_prefix"], r["message_content"])


def test_wal_replay_stream_matches_batch(spark, tmp_path):
    src = _write_log(tmp_path)

    batch = _pipeline(spark.read.text(str(src))).collect()

    stream = spark.readStream.format("text").schema("value string").load(str(src))
    q = (
        _pipeline(stream)
        .writeStream.format("memory")
        .queryName("wal_replay_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = spark.sql("SELECT * FROM wal_replay_mem").collect()
    finally:
        q.stop()

    assert sorted(map(_key, streamed)) == sorted(map(_key, batch))
    assert len(streamed) == 5  # B/C dropped, audit_log filtered


def test_wal_replay_envelope_contents(spark, tmp_path):
    src = _write_log(tmp_path)
    rows = {r["op"]: r for r in _pipeline(spark.read.text(str(src))).collect()}

    # every data op of both transactions came through, markers did not
    assert set(rows) == {"c", "u", "d", "t", "m"}

    ins, upd, dele, trunc, msg = (rows[o] for o in ("c", "u", "d", "t", "m"))
    assert ins["after"] == {"id": "7", "temp": "20.5"} and ins["before"] is None
    assert upd["before"] == {"id": "7"} and upd["after"]["temp"] == "21.0"
    assert dele["before"] == {"id": "7"} and dele["after"] is None
    assert trunc["before"] is None and trunc["after"] is None
    assert msg["message_prefix"] == "app-signal"
    assert msg["message_content"] == "resync"
    assert msg["topic"] == "timescaledb.public.$messages"

    # commit grouping survives: xid partitions the log, LSNs ascend in it
    assert ins["xid"] == upd["xid"] == 900
    assert dele["xid"] == trunc["xid"] == msg["xid"] == 901
    assert ins["lsn"] < upd["lsn"] < dele["lsn"] < trunc["lsn"] < msg["lsn"]

    # the excluded table's committed insert never reaches the sink
    assert all(r["topic"] != "timescaledb.public.audit_log" for r in rows.values())


def test_wal_replay_resumes_from_checkpoint_without_duplicates(spark, tmp_path):
    """Restartable offsets (spi/statestorage): a checkpointed stream
    consumes batch0, stops, and on restart with batch1 present emits
    ONLY batch1's envelopes — no replay of batch0, no loss."""
    src = tmp_path / "wal"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (src / "batch0.json").write_text("\n".join(WAL_LOG["batch0.json"]))

    def run_once():
        stream = spark.readStream.format("text").schema("value string").load(str(src))
        q = (
            _pipeline(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    first = spark.read.parquet(out).collect()
    assert sorted(r["lsn"] for r in first) == [0x1010, 0x1020]

    (src / "batch1.json").write_text("\n".join(WAL_LOG["batch1.json"]))
    run_once()
    both = spark.read.parquet(out).collect()
    # batch0's two envelopes exactly once + batch1's three (audit_log filtered)
    lsns = sorted(r["lsn"] for r in both)
    assert lsns == [0x1010, 0x1020, 0x2010, 0x2020, 0x2030]


def test_restart_lsn_drives_replay_skip(spark, tmp_path):
    """Integration of the J18 restart decision with the replay path:
    compute the restart point exactly as the reference's
    locateRestartLSN would (slot's confirmed_flush vs the offset
    store vs server xlogpos), then resume the wal2json replay from
    it — the resumed envelope set must be exactly the full set minus
    the already-confirmed prefix (the reference's restart-skip rule,
    replicationhandler.go:195-206, applied at the source)."""
    from timescaledb_event_streamer_spark.sources.pg_replication import (
        restart_lsn,
    )

    d = tmp_path / "wal"
    d.mkdir()
    for name, lines in WAL_LOG.items():
        (d / name).write_text("\n".join(lines))
    full = parse_wal2json(spark.read.text(str(d)))

    # slot says everything through txn 900's commit is confirmed;
    # the offset store is stale; xlogpos is far ahead
    inputs = spark.createDataFrame(
        [(0x1030, 0x1010, 0x3000)], "cf long, off long, xlog long"
    )
    restart = inputs.select(
        restart_lsn(F.col("cf"), F.col("off"), F.col("xlog")).alias("r")
    ).collect()[0]["r"]
    assert restart == 0x1030  # confirmed flush wins over the stale offset

    # the parsed envelope already carries the numeric LSN ordering key
    resumed = full.filter(F.col("lsn") > restart)
    full_lsns = {r["lsn"] for r in full.collect()}
    resumed_lsns = {r["lsn"] for r in resumed.collect()}
    skipped = full_lsns - resumed_lsns
    assert skipped == {0x1010, 0x1020}  # exactly txn 900's rows
    assert resumed_lsns and all(l > 0x1030 for l in resumed_lsns)
