"""NATS JetStream sink delivery loop (H18): real protocol bytes
(INFO/CONNECT/SUB/HPUB/MSG) driven end-to-end against a local
NATS-shaped TCP server from executor-side foreachPartition, the
reference's header-key + synchronous-PubAck contract (nats.go Emit),
all three authorization modes of nats.go:46-64, and the streaming
path through a checkpoint."""

from __future__ import annotations

import base64
import json
import socketserver
import threading
import uuid

import pytest

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sinks.nats_delivery import (
    NatsDeliveryError,
    NatsJetStreamPublisher,
    nats_sink_batch,
    nats_sink_stream,
)
from timescaledb_event_streamer_spark.sinks.nats_wire import (
    CLIENT_NAME,
    connect_options,
    crc16,
    decode_nkey_seed,
    encode_nkey_seed,
    parse_creds_file,
    parse_headers,
)


# -- wire-layer unit coverage ----------------------------------------

def test_crc16_xmodem_vector():
    assert crc16(b"123456789") == 0x31C3  # public CCITT/XModem check


def test_nkey_seed_roundtrip_and_validation():
    raw = bytes(range(32))
    seed = encode_nkey_seed(raw)
    assert seed.startswith("SU")
    assert decode_nkey_seed(seed) == raw
    with pytest.raises(ValueError, match="CRC"):
        decode_nkey_seed(seed[:-1] + ("A" if seed[-1] != "A" else "B"))


def test_creds_file_parse():
    txt = (
        "-----BEGIN NATS USER JWT-----\neyJWT\n"
        "------END NATS USER JWT------\n\n"
        "-----BEGIN USER NKEY SEED-----\nSUSEED\n"
        "------END USER NKEY SEED------\n"
    )
    assert parse_creds_file(txt) == ("eyJWT", "SUSEED")


def test_unknown_authorization_is_loud():
    with pytest.raises(ValueError, match="doesn't exist"):
        connect_options("token")


def test_jwt_mode_signs_the_nonce():
    pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey,
    )

    key = Ed25519PrivateKey.generate()
    raw = key.private_bytes_raw()
    opts = connect_options(
        "jwt", jwt="eyX", seed=encode_nkey_seed(raw), nonce=b"abc123"
    )
    assert opts["jwt"] == "eyX"
    assert opts["name"] == CLIENT_NAME  # nats.go:95
    sig = base64.urlsafe_b64decode(opts["sig"] + "==")
    key.public_key().verify(sig, b"abc123")  # raises on mismatch


# -- NATS-shaped local server ----------------------------------------

class _NatsHandler(socketserver.StreamRequestHandler):
    """INFO(+nonce) -> CONNECT auth check -> SUB/HPUB handling with
    JetStream PubAck replies to the reply inbox. Messages land in
    server.logs[subject]. `fail_first` answers the first N publishes
    with a JetStream error ack."""

    def _info(self) -> dict:
        return {
            "server_id": "local-test",
            "version": "2.10.0",
            "headers": True,
            "max_payload": 1 << 20,
            "nonce": self.nonce,
        }

    def handle(self):
        self.nonce = uuid.uuid4().hex
        self.wfile.write(
            b"INFO " + json.dumps(self._info()).encode() + b"\r\n"
        )
        self._serve_loop()

    def _serve_loop(self):
        srv = self.server
        self.inboxes: dict[str, str] = {}  # sid -> subject
        while True:
            line = self.rfile.readline()
            if not line:
                return
            line = line.rstrip(b"\r\n")
            if not line:
                continue
            op, _, rest = line.partition(b" ")
            op = op.upper()
            if op == b"CONNECT":
                opts = json.loads(rest)
                with srv.lock:
                    srv.connects.append((opts, self.nonce))
                if not srv.check_auth(opts, self.nonce):
                    self.wfile.write(
                        b"-ERR 'Authorization Violation'\r\n"
                    )
                    return
            elif op == b"SUB":
                subject, sid = rest.decode().split()
                self.inboxes[sid] = subject
            elif op == b"PING":
                self.wfile.write(b"PONG\r\n")
            elif op == b"HPUB":
                parts = rest.decode().split()
                subject = parts[0]
                reply = parts[1] if len(parts) == 4 else None
                hdr_len, total = int(parts[-2]), int(parts[-1])
                blob = self.rfile.read(total + 2)[:total]
                headers = parse_headers(blob[:hdr_len])
                payload = blob[hdr_len:]
                with srv.lock:
                    if srv.fail_first > 0:
                        srv.fail_first -= 1
                        ack = {"error": {"code": 503, "description": "no responders"}}
                    else:
                        log = srv.logs.setdefault(subject, [])
                        log.append((headers, payload))
                        ack = {"stream": "EVENTS", "seq": len(log)}
                if reply:
                    data = json.dumps(ack).encode()
                    self.wfile.write(
                        f"MSG {reply} 1 {len(data)}\r\n".encode()
                        + data
                        + b"\r\n"
                    )


class _QuietNats(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def handle_error(self, request, client_address):
        pass  # publisher disconnects at partition end are expected


@pytest.fixture()
def nats_server():
    srv = _QuietNats(("127.0.0.1", 0), _NatsHandler)
    srv.logs, srv.connects = {}, []
    srv.fail_first = 0
    srv.lock = threading.Lock()
    srv.check_auth = lambda opts, nonce: True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


# -- publisher semantics ---------------------------------------------

def test_sync_publish_acks_in_order(nats_server):
    with NatsJetStreamPublisher(
        nats_server.server_address, username="u", password="p"
    ) as pub:
        a1 = pub.publish("prefix.public.t1", '{"id":1}', b"env-1")
        a2 = pub.publish("prefix.public.t1", '{"id":2}', b"env-2")
    assert (a1["stream"], a1["seq"]) == ("EVENTS", 1)
    assert a2["seq"] == 2
    with nats_server.lock:
        log = nats_server.logs["prefix.public.t1"]
    # the reference's Emit contract: header key + envelope payload
    assert log[0][0]["key"] == '{"id":1}'
    assert log[0][1] == b"env-1"
    opts = nats_server.connects[0][0]
    assert opts["name"] == CLIENT_NAME
    assert (opts["user"], opts["pass"]) == ("u", "p")


def test_userinfo_rejection_fails_delivery(nats_server):
    nats_server.check_auth = (
        lambda opts, nonce: opts.get("pass") == "sekrit"
    )
    with NatsJetStreamPublisher(
        nats_server.server_address,
        username="u",
        password="wrong",
        max_reconnects=1,
        reconnect_wait_s=0.01,
    ) as pub:
        with pytest.raises(NatsDeliveryError):
            pub.publish("t", "", b"x")


def test_nkey_auth_verified_by_server(nats_server):
    pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey,
    )

    key = Ed25519PrivateKey.generate()
    seed = encode_nkey_seed(key.private_bytes_raw())
    pub_key = key.public_key()

    def check(opts, nonce):
        try:
            sig = base64.urlsafe_b64decode(opts["sig"] + "==")
            pub_key.verify(sig, nonce.encode())
            return opts.get("jwt") == "eyUSER"
        except Exception:
            return False

    nats_server.check_auth = check
    creds = (
        "-----BEGIN NATS USER JWT-----\neyUSER\n"
        "------END NATS USER JWT------\n"
        f"-----BEGIN USER NKEY SEED-----\n{seed}\n"
        "------END USER NKEY SEED------\n"
    )
    with NatsJetStreamPublisher(
        nats_server.server_address,
        authorization="credentials",
        creds_text=creds,
    ) as pub:
        ack = pub.publish("t", "", b"signed")
    assert ack["seq"] == 1


def test_jetstream_error_ack_raises(nats_server):
    nats_server.fail_first = 1
    with NatsJetStreamPublisher(
        nats_server.server_address, username="u", password="p"
    ) as pub:
        with pytest.raises(NatsDeliveryError, match="no responders"):
            pub.publish("t", "", b"x")


# -- Spark end-to-end ------------------------------------------------

def _shaped(spark, n=20):
    return spark.range(n).select(
        F.concat(
            F.lit("prefix.public.s"), (F.col("id") % 2).cast("string")
        ).alias("subject"),
        F.to_json(F.struct(F.col("id"))).alias("key"),
        F.encode(
            F.to_json(F.struct(F.col("id"), (F.col("id") * 7).alias("v"))),
            "utf-8",
        ).alias("envelope"),
    )


def test_batch_delivery_from_executors(spark, nats_server):
    df = _shaped(spark, 20).repartition(4)
    nats_sink_batch(
        df, nats_server.server_address, username="u", password="p"
    )
    with nats_server.lock:
        logs = {k: list(v) for k, v in nats_server.logs.items()}
    msgs = [(s, h, p) for s, log in logs.items() for h, p in log]
    assert len(msgs) == 20
    for subject, headers, payload in msgs:
        d = json.loads(payload)
        assert subject.endswith(str(d["id"] % 2))
        assert json.loads(headers["key"]) == {"id": d["id"]}
        assert d["v"] == d["id"] * 7


def test_streaming_delivery_with_checkpoint(spark, nats_server, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _shaped(spark, 8).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b0")
    )
    stream = (
        spark.readStream.schema("subject STRING, key STRING, envelope BINARY")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    for _ in range(2):  # second run on the same checkpoint: no replay
        q = (
            nats_sink_stream(
                stream,
                nats_server.server_address,
                checkpoint_dir=str(tmp_path / "ckpt"),
                username="u",
                password="p",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    with nats_server.lock:
        assert sum(len(v) for v in nats_server.logs.values()) == 8
