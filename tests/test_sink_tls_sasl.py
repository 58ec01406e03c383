"""Kafka SASL + sink-side TLS (r10) — the last reference sink
security surface: kafka.go:54-66 wires sarama SASL
(sink.kafka.sasl.{enabled,user,password,mechanism}) and kafka.go:67-78
TLS onto the producer; redis.go:86-95 carries TLSConfig too, and the
NATS client upgrades to TLS after INFO. Here each path is driven over
a REAL local TLS/SASL-requiring protocol-shaped server:

- SaslHandshake v1 + SaslAuthenticate v0 wire roundtrips
- PLAIN end-to-end produce, wrong-password pinned non-retriable
- SCRAM-SHA-256 (RFC 5802 core reused from sources/pg_auth) with the
  server verifying the client proof from STORED KEYS ONLY and the
  client verifying the server signature (mutual auth), wrong-password
  pinned
- unsupported-mechanism handshake rejection
- TLS on all three broker sinks (kafka from byte 0, redis from byte
  0, NATS upgrade-after-INFO), with a private-CA verifying context
- config-driven assembly: the sasl/tls property names reach the
  delivery loop
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import socketserver
import ssl
import struct
import threading
import uuid

import pytest

from tests.test_kafka_sink import _BrokerHandler, _QuietBroker
from tests.test_nats_sink import _NatsHandler, _QuietNats
from tests.test_pg_tls import certpair  # noqa: F401 (fixture)
from tests.test_redis_sink import _QuietRedis, _RedisHandler
from timescaledb_event_streamer_spark.sinks.kafka_delivery import (
    CLIENT_ID,
    KafkaDeliveryError,
    KafkaProducer,
)
from timescaledb_event_streamer_spark.sinks.kafka_wire import (
    ERROR_SASL_AUTHENTICATION_FAILED,
    ERROR_UNSUPPORTED_SASL_MECHANISM,
    decode_produce_request,
    decode_record_batch,
    decode_sasl_authenticate_request,
    decode_sasl_authenticate_response,
    decode_sasl_handshake_request,
    decode_sasl_handshake_response,
    encode_produce_response,
    encode_sasl_authenticate_request,
    encode_sasl_authenticate_response,
    encode_sasl_handshake_request,
    encode_sasl_handshake_response,
    plain_auth_bytes,
)
from timescaledb_event_streamer_spark.sinks.nats_delivery import (
    NatsJetStreamPublisher,
)
from timescaledb_event_streamer_spark.sinks.redis_delivery import (
    RedisStreamsPublisher,
)
from timescaledb_event_streamer_spark.sources.pg_auth import parse_scram_attrs


# -- wire-layer unit coverage ----------------------------------------

def test_plain_auth_bytes_rfc4616():
    assert plain_auth_bytes("user", "pass") == b"\x00user\x00pass"
    assert plain_auth_bytes("u", "p", authzid="admin") == b"admin\x00u\x00p"


def test_sasl_handshake_roundtrip():
    frame = encode_sasl_handshake_request(3, CLIENT_ID, "SCRAM-SHA-256")
    req = decode_sasl_handshake_request(frame)
    assert req["api_version"] == 1
    assert req["correlation_id"] == 3
    assert req["client_id"] == CLIENT_ID
    assert req["mechanism"] == "SCRAM-SHA-256"
    resp_frame = encode_sasl_handshake_response(
        3, 0, ["PLAIN", "SCRAM-SHA-256"]
    )
    resp = decode_sasl_handshake_response(resp_frame)
    assert resp == {
        "correlation_id": 3,
        "error_code": 0,
        "mechanisms": ["PLAIN", "SCRAM-SHA-256"],
    }


def test_sasl_authenticate_roundtrip():
    frame = encode_sasl_authenticate_request(5, CLIENT_ID, b"n,,n=u,r=abc")
    req = decode_sasl_authenticate_request(frame)
    assert req["correlation_id"] == 5
    assert req["auth_bytes"] == b"n,,n=u,r=abc"
    resp_frame = encode_sasl_authenticate_response(
        5, ERROR_SASL_AUTHENTICATION_FAILED, b"", "bad creds"
    )
    resp = decode_sasl_authenticate_response(resp_frame)
    assert resp["error_code"] == ERROR_SASL_AUTHENTICATION_FAILED
    assert resp["error_message"] == "bad creds"
    assert resp["auth_bytes"] == b""


# -- SASL-requiring broker-shaped server ------------------------------

class _SaslBrokerHandler(socketserver.BaseRequestHandler):
    """Handshake -> authenticate -> produce. PLAIN compares
    credentials; SCRAM-SHA-256 verifies the client proof from STORED
    verifiers only (salt, i, StoredKey, ServerKey — the server-side
    algorithm, no reuse of the client module). Produce before
    successful auth drops the connection, like a real broker."""

    SALT = b"kafkasaltkafka00"
    ITERATIONS = 4096

    def _recv_frame(self):
        head = b""
        while len(head) < 4:
            chunk = self.request.recv(4 - len(head))
            if not chunk:
                return None
            head += chunk
        (size,) = struct.unpack(">i", head)
        body = b""
        while len(body) < size:
            chunk = self.request.recv(size - len(body))
            if not chunk:
                return None
            body += chunk
        return head + body

    def handle(self):
        srv = self.server
        salted = hashlib.pbkdf2_hmac(
            "sha256", srv.password.encode(), self.SALT, self.ITERATIONS,
            dklen=32,
        )
        stored_key = hashlib.sha256(
            hmac.digest(salted, b"Client Key", "sha256")
        ).digest()
        server_key = hmac.digest(salted, b"Server Key", "sha256")
        mech = None
        authed = False
        scram_state = None  # (client_first_bare, server_first)
        while True:
            frame = self._recv_frame()
            if frame is None:
                return
            (api_key,) = struct.unpack_from(">h", frame, 4)
            if api_key == 17:
                req = decode_sasl_handshake_request(frame)
                if req["mechanism"] not in srv.mechanisms:
                    self.request.sendall(
                        encode_sasl_handshake_response(
                            req["correlation_id"],
                            ERROR_UNSUPPORTED_SASL_MECHANISM,
                            sorted(srv.mechanisms),
                        )
                    )
                    continue
                mech = req["mechanism"]
                self.request.sendall(
                    encode_sasl_handshake_response(
                        req["correlation_id"], 0, sorted(srv.mechanisms)
                    )
                )
            elif api_key == 36:
                req = decode_sasl_authenticate_request(frame)
                cid = req["correlation_id"]
                if mech == "PLAIN":
                    _zid, user, pwd = req["auth_bytes"].split(b"\x00")
                    if (user.decode(), pwd.decode()) == (
                        srv.user,
                        srv.password,
                    ):
                        authed = True
                        self.request.sendall(
                            encode_sasl_authenticate_response(cid, 0)
                        )
                    else:
                        self.request.sendall(
                            encode_sasl_authenticate_response(
                                cid,
                                ERROR_SASL_AUTHENTICATION_FAILED,
                                b"",
                                "Authentication failed: invalid credentials",
                            )
                        )
                        return
                elif mech == "SCRAM-SHA-256":
                    msg = req["auth_bytes"].decode()
                    if scram_state is None:
                        assert msg.startswith("n,,")
                        client_first_bare = msg[3:]
                        attrs = parse_scram_attrs(client_first_bare)
                        assert attrs["n"] == srv.user
                        full_nonce = attrs["r"] + "BROKERNONCE42"
                        server_first = (
                            f"r={full_nonce},"
                            f"s={base64.b64encode(self.SALT).decode()},"
                            f"i={self.ITERATIONS}"
                        )
                        scram_state = (client_first_bare, server_first)
                        self.request.sendall(
                            encode_sasl_authenticate_response(
                                cid, 0, server_first.encode()
                            )
                        )
                    else:
                        client_first_bare, server_first = scram_state
                        attrs = parse_scram_attrs(msg)
                        without_proof = msg[: msg.rindex(",p=")]
                        auth_message = ",".join(
                            [client_first_bare, server_first, without_proof]
                        )
                        client_sig = hmac.digest(
                            stored_key, auth_message.encode(), "sha256"
                        )
                        proof = base64.b64decode(attrs["p"])
                        client_key = bytes(
                            a ^ b for a, b in zip(proof, client_sig)
                        )
                        if (
                            hashlib.sha256(client_key).digest()
                            == stored_key
                        ):
                            authed = True
                            server_sig = hmac.digest(
                                server_key, auth_message.encode(), "sha256"
                            )
                            self.request.sendall(
                                encode_sasl_authenticate_response(
                                    cid,
                                    0,
                                    b"v="
                                    + base64.b64encode(server_sig),
                                )
                            )
                        else:
                            self.request.sendall(
                                encode_sasl_authenticate_response(
                                    cid,
                                    ERROR_SASL_AUTHENTICATION_FAILED,
                                    b"",
                                    "Authentication failed: invalid proof",
                                )
                            )
                            return
                else:
                    return
            elif api_key == 0:
                if not authed:
                    return  # real brokers drop unauthenticated produce
                req = decode_produce_request(frame)
                results = {}
                with srv.lock:
                    for topic, parts in req["topics"].items():
                        results[topic] = {}
                        for partition, batch in parts.items():
                            decoded = decode_record_batch(batch)
                            log = srv.logs.setdefault(
                                (topic, partition), []
                            )
                            base = len(log)
                            log.extend(decoded["records"])
                            results[topic][partition] = (0, base)
                    srv.requests.append(req)
                if req["acks"] != 0:
                    self.request.sendall(
                        encode_produce_response(
                            req["correlation_id"], results
                        )
                    )
            else:
                return


@pytest.fixture()
def sasl_broker():
    srv = _QuietBroker(("127.0.0.1", 0), _SaslBrokerHandler)
    srv.logs, srv.requests = {}, []
    srv.lock = threading.Lock()
    srv.user, srv.password = "sink_user", "s3kret-sink"
    srv.mechanisms = {"PLAIN", "SCRAM-SHA-256"}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_sasl_plain_produce_end_to_end(sasl_broker):
    with KafkaProducer(
        sasl_broker.server_address,
        sasl_mechanism="PLAIN",
        sasl_username="sink_user",
        sasl_password="s3kret-sink",
    ) as p:
        offs = p.send_batch("t", [(b"k", b"v", 1)])
    assert offs == {0: 0}
    with sasl_broker.lock:
        assert len(sasl_broker.logs[("t", 0)]) == 1


def test_sasl_plain_wrong_password_fails_fast(sasl_broker):
    with KafkaProducer(
        sasl_broker.server_address,
        sasl_mechanism="PLAIN",
        sasl_username="sink_user",
        sasl_password="WRONG",
        max_retries=5,
    ) as p:
        with pytest.raises(
            KafkaDeliveryError, match="authentication failed"
        ):
            p.send_batch("t", [(b"k", b"v", 1)])
    with sasl_broker.lock:
        assert sasl_broker.logs == {}  # nothing delivered


def test_sasl_scram_produce_end_to_end(sasl_broker):
    """Full RFC 5802 over SaslAuthenticate: client proof verified
    server-side from stored keys, server signature verified
    client-side (mutual)."""
    with KafkaProducer(
        sasl_broker.server_address,
        sasl_mechanism="SCRAM-SHA-256",
        sasl_username="sink_user",
        sasl_password="s3kret-sink",
    ) as p:
        offs = p.send_batch("t", [(b"a", b"1", 5), (b"b", b"2", 6)])
    assert offs == {0: 0}
    with sasl_broker.lock:
        assert [
            (k, v) for k, v, _, _ in sasl_broker.logs[("t", 0)]
        ] == [(b"a", b"1"), (b"b", b"2")]


def test_sasl_scram_wrong_password_fails_fast(sasl_broker):
    with KafkaProducer(
        sasl_broker.server_address,
        sasl_mechanism="SCRAM-SHA-256",
        sasl_username="sink_user",
        sasl_password="WRONG",
    ) as p:
        with pytest.raises(
            KafkaDeliveryError, match="authentication failed"
        ):
            p.send_batch("t", [(b"k", b"v", 1)])


def test_sasl_unsupported_mechanism_rejected(sasl_broker):
    sasl_broker.mechanisms = {"SCRAM-SHA-256"}
    with KafkaProducer(
        sasl_broker.server_address,
        sasl_mechanism="PLAIN",
        sasl_username="u",
        sasl_password="p",
    ) as p:
        with pytest.raises(
            KafkaDeliveryError, match="rejected SASL mechanism"
        ):
            p.send_batch("t", [(b"k", b"v", 1)])


def test_unknown_mechanism_is_a_config_error():
    with pytest.raises(ValueError, match="unsupported SASL mechanism"):
        KafkaProducer(("h", 1), sasl_mechanism="GSSAPI")


# -- TLS-wrapped sink servers -----------------------------------------

def _server_ctx(certpair) -> ssl.SSLContext:
    key, cert = certpair
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    return ctx


class _TlsMixin:
    """TLS-from-byte-0 server: wrap each accepted connection."""

    def get_request(self):
        sock, addr = super().get_request()
        return self.ssl_ctx.wrap_socket(sock, server_side=True), addr


class _TlsBroker(_TlsMixin, _QuietBroker):
    pass


class _TlsRedis(_TlsMixin, _QuietRedis):
    pass


def test_kafka_tls_produce_with_private_ca(certpair):
    """TLS + SASL-PLAIN over the encrypted channel, verifying context
    trusting the private CA — the kafka.go:67-78 posture with
    verification ON."""
    _key, cert = certpair
    srv = _TlsBroker(("127.0.0.1", 0), _SaslBrokerHandler)
    srv.ssl_ctx = _server_ctx(certpair)
    srv.logs, srv.requests = {}, []
    srv.lock = threading.Lock()
    srv.user, srv.password = "u", "p"
    srv.mechanisms = {"PLAIN"}
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        _host, port = srv.server_address
        with KafkaProducer(
            ("localhost", port),
            tls=True,
            tls_opts={"cafile": cert},
            sasl_mechanism="PLAIN",
            sasl_username="u",
            sasl_password="p",
        ) as p:
            offs = p.send_batch("t", [(b"k", b"v", 1)])
        assert offs == {0: 0}
        with srv.lock:
            assert len(srv.logs[("t", 0)]) == 1
    finally:
        srv.shutdown()
        srv.server_close()


def test_kafka_tls_default_verify_rejects_self_signed(certpair):
    """Secure-by-default: no cafile, no skip_verify -> the self-signed
    server cert FAILS verification instead of silently encrypting to
    an unauthenticated peer. A trust failure is deterministic, so it
    must surface IMMEDIATELY — never burn max_retries backoffs before
    reporting the real error (r10 advice)."""
    import time as _t

    srv = _TlsBroker(("127.0.0.1", 0), _BrokerHandler)
    srv.ssl_ctx = _server_ctx(certpair)
    srv.logs, srv.requests = {}, []
    srv.fail_first = 0
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        _host, port = srv.server_address
        with KafkaProducer(
            ("localhost", port), tls=True, max_retries=10,
            retry_backoff_s=0.5,
        ) as p:
            t0 = _t.monotonic()
            with pytest.raises(ssl.SSLCertVerificationError):
                p.send_batch("t", [(b"k", b"v", 1)])
            # 10 retries at 0.5s escalating backoff would be >27s;
            # the non-retriable path raises on the first attempt
            assert _t.monotonic() - t0 < 2.0
    finally:
        srv.shutdown()
        srv.server_close()


def test_scram_username_rfc5802_escaping():
    """Kafka authenticates on the SCRAM-level username (unlike PG,
    which takes it from the startup packet), so ',' and '=' in a real
    username must be '=2C'/'=3D'-escaped in client-first-bare instead
    of producing a message the server misparses (RFC 5802 §5.1)."""
    from timescaledb_event_streamer_spark.sources.pg_auth import ScramClient

    c = ScramClient("pw", nonce="NNN", username="acme,eu=prod")
    assert c.client_first_bare == "n=acme=2Ceu=3Dprod,r=NNN"
    # the escape must not double-fire on the '=' it introduces
    c2 = ScramClient("pw", nonce="NNN", username="a=,b")
    assert c2.client_first_bare == "n=a=3D=2Cb,r=NNN"
    # plain usernames (and PG's empty default) pass through unchanged
    assert ScramClient("pw", nonce="N", username="user").client_first_bare == "n=user,r=N"
    assert ScramClient("pw", nonce="N").client_first_bare == "n=,r=N"


def test_redis_tls_xadd(certpair):
    _key, cert = certpair
    srv = _TlsRedis(("127.0.0.1", 0), _RedisHandler)
    srv.ssl_ctx = _server_ctx(certpair)
    srv.streams, srv.selects = {}, []
    srv.password = "r3dis"
    srv.fail_first = 0
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        _host, port = srv.server_address
        with RedisStreamsPublisher(
            ("localhost", port),
            password="r3dis",
            tls=True,
            tls_opts={"cafile": cert},
        ) as pub:
            pub.xadd("prefix.public.t", '{"id":1}', '{"op":"c"}')
        with srv.lock:
            assert srv.streams["prefix.public.t"][0][1]["key"] == '{"id":1}'
    finally:
        srv.shutdown()
        srv.server_close()


class _TlsNatsHandler(_NatsHandler):
    """INFO advertises tls_required, then the server wraps BEFORE the
    client's CONNECT — the upgrade-after-INFO shape of nats.go's
    secure mode."""

    def handle(self):
        self.nonce = uuid.uuid4().hex
        info = dict(self._info(), tls_required=True)
        self.request.sendall(
            b"INFO " + json.dumps(info).encode() + b"\r\n"
        )
        tls_sock = self.server.ssl_ctx.wrap_socket(
            self.request, server_side=True
        )
        self.connection = self.request = tls_sock
        self.rfile = tls_sock.makefile("rb")
        self.wfile = tls_sock.makefile("wb", buffering=0)
        self._serve_loop()


def test_nats_tls_upgrade_after_info(certpair):
    _key, cert = certpair
    srv = _QuietNats(("127.0.0.1", 0), _TlsNatsHandler)
    srv.ssl_ctx = _server_ctx(certpair)
    srv.logs, srv.connects = {}, []
    srv.fail_first = 0
    srv.lock = threading.Lock()
    srv.check_auth = lambda opts, nonce: True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        _host, port = srv.server_address
        with NatsJetStreamPublisher(
            ("localhost", port),
            tls=True,
            tls_opts={"cafile": cert},
        ) as pub:
            ack = pub.publish("prefix.public.t", '{"id":1}', b'{"op":"c"}')
        assert ack.get("seq") == 1
        with srv.lock:
            headers, payload = srv.logs["prefix.public.t"][0]
        assert payload == b'{"op":"c"}'
    finally:
        srv.shutdown()
        srv.server_close()


# -- config-driven assembly -------------------------------------------

def test_config_plumbs_sasl_and_tls(spark, sf_small, tmp_path, certpair):
    """A TOML config with sink.kafka.sasl.* + sink.kafka.tls.* drives
    the delivery loop through TLS + SASL end-to-end (the
    constants.go:68-74 property names)."""
    from tests.test_config import _assembly
    from timescaledb_event_streamer_spark.sources.tables import load

    _keyf, cert = certpair
    srv = _TlsBroker(("127.0.0.1", 0), _SaslBrokerHandler)
    srv.ssl_ctx = _server_ctx(certpair)
    srv.logs, srv.requests = {}, []
    srv.lock = threading.Lock()
    srv.user, srv.password = "cfg_user", "cfg_pass"
    srv.mechanisms = {"SCRAM-SHA-256"}
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        _host, port = srv.server_address
        asm = _assembly(tmp_path, sink="kafka")
        kafka_cfg = asm.config.raw.setdefault("sink", {}).setdefault(
            "kafka", {}
        )
        kafka_cfg["brokers"] = [f"localhost:{port}"]
        kafka_cfg["sasl"] = {
            "enabled": True,
            "user": "cfg_user",
            "password": "cfg_pass",
            "mechanism": "SCRAM-SHA-256",
        }
        kafka_cfg["tls"] = {"enabled": True, "cafile": cert}
        env = asm.build(load(spark, sf_small, "events")).limit(10)
        asm.deliver_batch(asm.shape(env))
        with srv.lock:
            n = sum(len(v) for v in srv.logs.values())
        assert n == 10
    finally:
        srv.shutdown()
        srv.server_close()
