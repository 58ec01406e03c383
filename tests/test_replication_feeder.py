"""ReplicationFeeder transport loop (VERDICT r6 item 3).

A local TCP socketserver replays the RECORDED golden session
(tests/golden/*.bin — struct.pack-authored, never this repo's
encoders); the feeder drives the full conversation over that real
socket with NO psycopg: handshake commands out, replies decoded,
CopyData pumped into a landing directory as hex lines, standby
status updates flowing back on the reference's cadence rules
(replicationhandler.go:115-190, replicationconnection.go:93-104).
The landed frames then go through the SAME Spark decode chain the
synthesized paths use (parse_pgoutput), closing the loop:
socket in -> envelopes + correctly-advancing acks out.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sources import pg_replication as pr
from timescaledb_event_streamer_spark.sources.pg_replication import (
    ProtocolError,
    ReplicationFeeder,
)
from timescaledb_event_streamer_spark.sources.pgoutput import parse_pgoutput

GOLDEN = Path(__file__).resolve().parent / "golden"

# scenario constants pinned by tools/make_golden_replication.py
U_LSN, C_LSN = 1006, 1011
U_PAYLOAD_LEN = 40  # 'U' + relid(4) + 'K' + 10 + 'N' + 23
C_PAYLOAD_LEN = 26  # 'C' + flags(1) + 3x int64


class _GoldenSession(socketserver.BaseRequestHandler):
    """Replays the golden replies: one reply blob per frontend Query
    message, then the CopyData stream after START_REPLICATION."""

    def _read_query(self) -> str:
        buf = b""
        while len(buf) < 5:
            buf += self.request.recv(4096)
        assert buf[0:1] == b"Q"
        (length,) = struct.unpack(">I", buf[1:5])
        while len(buf) < 1 + length:
            buf += self.request.recv(4096)
        return buf[5 : 1 + length].decode().rstrip("\x00")

    def handle(self):
        q1 = self._read_query()
        assert q1 == "IDENTIFY_SYSTEM"
        self.request.sendall((GOLDEN / "identify_system.bin").read_bytes())
        q2 = self._read_query()
        assert q2.startswith("CREATE_REPLICATION_SLOT")
        self.request.sendall((GOLDEN / "create_slot.bin").read_bytes())
        q3 = self._read_query()
        assert q3.startswith("START_REPLICATION SLOT")
        self.server.start_command = q3
        self.request.sendall((GOLDEN / "copy_both.bin").read_bytes())
        self.request.sendall(
            (GOLDEN / "copydata_stream_keepalive.bin").read_bytes()
        )
        # collect whatever status updates the feeder sends before it
        # sees EOF, then half-close our sending side
        self.request.shutdown(socket.SHUT_WR)
        acks = b""
        while True:
            chunk = self.request.recv(4096)
            if not chunk:
                break
            acks += chunk
        self.server.ack_bytes = acks


@pytest.fixture()
def golden_server():
    srv = socketserver.TCPServer(("127.0.0.1", 0), _GoldenSession)
    srv.start_command = None
    srv.ack_bytes = b""
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    yield srv
    t.join(timeout=10)
    srv.server_close()


def _connect(srv) -> socket.socket:
    s = socket.create_connection(srv.server_address, timeout=10)
    return s


def _parse_acks(raw: bytes) -> list[dict]:
    """Independent struct-level parse of the feeder's outbound
    CopyData StandbyStatusUpdate frames."""
    out = []
    pos = 0
    while pos < len(raw):
        assert raw[pos : pos + 1] == b"d"
        (length,) = struct.unpack(">I", raw[pos + 1 : pos + 5])
        body = raw[pos + 5 : pos + 1 + length]
        assert body[0:1] == b"r"
        w, fl, ap, _ts, rep = struct.unpack(">QQQQb", body[1:34])
        out.append({"write": w, "flush": fl, "apply": ap, "reply": rep})
        pos += 1 + length
    return out


def test_feeder_end_to_end_over_socket(spark, tmp_path, golden_server):
    landing = tmp_path / "landing"
    with _connect(golden_server) as sock:
        feeder = ReplicationFeeder(
            sock,
            landing_dir=str(landing),
            slot_name="timescaledb_metrics",
            publication="pub",
            wallclock_us=lambda: 1_709_294_400_000_000,
        )
        hs = feeder.handshake()
        n = feeder.pump()
        # EOF reached; the session is drained — send a final status
        # so the server thread can record the acks
        feeder.send_status()

    # handshake decoded the golden replies (cross-checked against the
    # Spark column codecs below)
    assert hs["system_id"] == "7284066390163781250"
    assert hs["timeline"] == 1
    assert hs["xlogpos_text"] == "0/100FAB"
    assert hs["slot_name"] == "timescaledb_metrics"
    assert hs["snapshot_name"] == "00000003-000004D2-1"
    assert hs["output_plugin"] == "pgoutput"
    assert hs["start_lsn_text"] == "0/100FAB"
    assert "START_REPLICATION SLOT timescaledb_metrics LOGICAL 0/100FAB" in (
        golden_server.start_command or ""
    )

    ident_spark = pr.parse_identify_system(
        spark.createDataFrame(
            [((GOLDEN / "identify_system.bin").read_bytes().hex().upper(),)],
            "reply string",
        )
    ).collect()[0]
    assert ident_spark["system_id"] == hs["system_id"]
    assert ident_spark["xlogpos_text"] == hs["xlogpos_text"]

    # six XLogData frames landed (keepalives are not data)
    assert n == 6
    files = sorted(landing.glob("frames-*.txt"))
    assert files and not list(landing.glob("*.tmp"))

    # the reply-requested keepalive (after U) forced a status whose
    # positions are processed + 1 = (U_LSN + len(payload)) + 1 —
    # the J14 rule — and the final status advanced monotonically
    acks = _parse_acks(golden_server.ack_bytes)
    assert len(acks) == 2
    assert acks[0]["write"] == U_LSN + U_PAYLOAD_LEN + 1 == 1047
    assert acks[0]["write"] == acks[0]["flush"] == acks[0]["apply"]
    assert acks[1]["write"] == max(1047, C_LSN + C_PAYLOAD_LEN + 1)
    assert acks[1]["write"] >= acks[0]["write"]
    assert feeder.server_wal_end == 1009  # max keepalive walEnd (D_LSN - 1)
    assert feeder.processed_lsn + 1 == acks[1]["write"]

    # Spark side: the landed hex lines ARE parse_pgoutput input — the
    # identical chain the golden-bytes test drives, now fed by the
    # transport loop
    frames = spark.read.text(str(landing)).select(
        F.col("value").alias("frame")
    )
    env = {r["op"]: r for r in parse_pgoutput(frames).collect()}
    assert set(env) == {"c", "u", "d"}
    for r in env.values():
        assert r["topic"] == "timescaledb.public.metrics"
        assert r["xid"] == 777
        assert r["ts_ms"] == 1709294400000


def test_feeder_status_cadence_uses_injected_clock(tmp_path):
    """With no traffic demanding replies, the 5s cadence alone emits
    statuses (replicationhandler.go:119-137): a fake clock stepping
    past the deadline before each read triggers exactly one status
    per elapsed interval."""
    stream = (GOLDEN / "copydata_stream.bin").read_bytes()

    class Replay:
        def __init__(self, data):
            self.data = data
            self.pos = 0
            self.sent = b""

        def read(self, n):
            chunk = self.data[self.pos : self.pos + n]
            self.pos += len(chunk)
            return chunk

        def write(self, b):
            self.sent += b

    ticks = iter([0.0, 0.0, 6.0, 6.0, 6.0, 13.0] + [13.0] * 50)
    conn = Replay(stream)
    feeder = ReplicationFeeder(
        conn,
        landing_dir=str(tmp_path / "land"),
        status_interval_s=5.0,
        clock=lambda: next(ticks),
        wallclock_us=lambda: 946_684_800_000_000,
    )
    n = feeder.pump()
    assert n == 6
    acks = _parse_acks(conn.sent)
    # two deadline crossings (t=6 and t=13) -> two cadence statuses
    assert len(acks) == 2
    assert all(a["write"] == a["apply"] == a["flush"] for a in acks)
    # positions advance with processed frames between the two
    assert acks[1]["write"] >= acks[0]["write"]


def test_feeder_eof_mid_frame_raises(tmp_path):
    class Half:
        def __init__(self, data):
            self.data = data
            self.pos = 0

        def read(self, n):
            chunk = self.data[self.pos : self.pos + n]
            self.pos += len(chunk)
            return chunk

    stream = (GOLDEN / "copydata_stream.bin").read_bytes()[:-3]
    feeder = ReplicationFeeder(Half(stream))
    with pytest.raises(ProtocolError):
        feeder.pump()


def test_feeder_streaming_source_consumes_landing(spark, tmp_path):
    """The landing contract is what streaming I10 consumes: a
    readStream over the feeder's directory decodes to the same
    envelope rows as the batch read."""
    stream = (GOLDEN / "copydata_stream_keepalive.bin").read_bytes()

    class Replay:
        def __init__(self, data):
            self.data = data
            self.pos = 0

        def read(self, n):
            chunk = self.data[self.pos : self.pos + n]
            self.pos += len(chunk)
            return chunk

    landing = tmp_path / "landing"
    feeder = ReplicationFeeder(Replay(stream), landing_dir=str(landing))
    assert feeder.pump() == 6

    from timescaledb_event_streamer_spark.sources.pgoutput import (
        pgoutput_envelope_stream,
        relation_catalog,
    )

    batch = spark.read.text(str(landing)).select(
        F.col("value").alias("frame")
    )
    catalog = relation_catalog(batch)
    src = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(landing))
        .select(F.col("value").alias("frame"))
    )
    env = pgoutput_envelope_stream(src, catalog)
    q = (
        env.writeStream.format("memory")
        .queryName("feeder_env")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select op, xid from feeder_env").collect()
    assert {r["op"] for r in rows} == {"c", "u", "d"}
    assert all(r["xid"] == 777 for r in rows)


def test_feeder_restart_resumes_from_acked_lsn(golden_server, tmp_path):
    """The restart contract end-to-end: a later session passes the
    previous session's ack position (processed + 1) as the
    START_REPLICATION start point — the server sees the exact LSN
    text the restart_lsn rule produced, which is how a deployment
    avoids replaying acknowledged WAL after a feeder restart."""
    landing = tmp_path / "landing2"
    with _connect(golden_server) as sock:
        feeder = ReplicationFeeder(
            sock,
            landing_dir=str(landing),
            slot_name="timescaledb_metrics",
            publication="pub",
            wallclock_us=lambda: 1_709_294_400_000_000,
        )
        # simulate resuming after the previous session acked 1046:
        # restart point = processed + 1 = 1047 = hex 0/417
        hs = feeder.handshake(restart_lsn_text="0/417")
        feeder.pump()
    assert hs["start_lsn_text"] == "0/417"
    assert "START_REPLICATION SLOT timescaledb_metrics LOGICAL 0/417" in (
        golden_server.start_command or ""
    )


# -- H16: the supervised reconnect loop --------------------------------------


class _FlakySession(_GoldenSession):
    """First connection: replies to the handshake, streams the golden
    CopyData but CUTS the socket mid-frame after the first XLogData.
    Second connection: the full golden session. The per-server
    attempt counter lives on the server object."""

    def handle(self):
        with self.server.lock:
            self.server.attempts += 1
            attempt = self.server.attempts
        q1 = self._read_query()
        assert q1 == "IDENTIFY_SYSTEM"
        self.request.sendall((GOLDEN / "identify_system.bin").read_bytes())
        q2 = self._read_query()
        assert q2.startswith("CREATE_REPLICATION_SLOT")
        self.request.sendall((GOLDEN / "create_slot.bin").read_bytes())
        q3 = self._read_query()
        assert q3.startswith("START_REPLICATION SLOT")
        with self.server.lock:
            self.server.start_commands.append(q3)
        self.request.sendall((GOLDEN / "copy_both.bin").read_bytes())
        stream = (GOLDEN / "copydata_stream_keepalive.bin").read_bytes()
        if attempt == 1:
            # walk to the end of the FIFTH backend message (the 'U'
            # XLogData at walStart 1006) and cut 3 bytes INSIDE the
            # sixth — a mid-frame EOF after real progress
            pos = 0
            for _ in range(5):
                (length,) = struct.unpack(">I", stream[pos + 1 : pos + 5])
                pos += 1 + length
            self.request.sendall(stream[: pos + 3])
            self.request.close()
            return
        self.request.sendall(stream)
        self.request.shutdown(socket.SHUT_WR)
        while self.request.recv(4096):
            pass


class _QuietThreadingTCPServer(socketserver.ThreadingTCPServer):
    """The deliberate mid-frame cut makes the handler thread die on
    ConnectionReset/BrokenPipe — expected, so don't let the stdlib
    print its unhandled-exception block onto the pytest stream."""

    def handle_error(self, request, client_address):
        pass


@pytest.fixture()
def flaky_server():
    srv = _QuietThreadingTCPServer(("127.0.0.1", 0), _FlakySession)
    srv.daemon_threads = True
    srv.attempts, srv.start_commands = 0, []
    srv.lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_run_resilient_reconnects_and_resumes(flaky_server, tmp_path):
    """H16: the supervisor survives a mid-frame cut — backs off,
    redials, and the SECOND session's START_REPLICATION begins at
    processed + 1 from the first session's landed frame, so
    acknowledged WAL is never re-requested."""
    host, port = flaky_server.server_address
    slept = []

    def connect():
        return socket.create_connection((host, port), timeout=10)

    summary = pr.run_resilient(
        connect,
        landing_dir=str(tmp_path / "landing"),
        slot_name="timescaledb_metrics",
        publication="pub",
        sleep=slept.append,
        wallclock_us=lambda: 1_709_294_400_000_000,
    )
    assert flaky_server.attempts == 2
    assert summary["sessions"] == 2
    assert summary["frames_landed"] >= 6  # 4 pre-cut frames + the retry's re-delivery
    assert slept and slept[0] == 0.5  # first backoff step
    # the first session landed the 'U' frame (walStart 1006, payload
    # 40 -> processed 1046); the retry must start at 1047 = 0/417
    second = flaky_server.start_commands[1]
    assert "LOGICAL 0/417" in second, second


def test_run_resilient_gives_up_after_budget(tmp_path):
    """Connection refused every time: the supervisor applies capped
    exponential backoff and finally re-raises."""
    slept = []

    def connect():
        raise OSError("dial failed")

    with pytest.raises(OSError, match="dial failed"):
        pr.run_resilient(
            connect,
            max_reconnects=3,
            backoff_base_s=1.0,
            backoff_cap_s=2.0,
            sleep=slept.append,
        )
    assert slept == [1.0, 2.0, 2.0]  # exponential, capped
