"""Kafka produce wire protocol (H17) — the byte layer under the
reference's Kafka sink (`internal/eventing/sink/kafka/kafka.go`:
sarama SyncProducer, RequiredAcks=WaitForLocal, Retry.Max=10). The
reference delegates these bytes to sarama; here they are implemented
from the public Kafka protocol specification so the delivery loop
(kafka_delivery.py) can speak to a real broker socket with no client
library:

- RecordBatch, magic 2 (the on-wire record format every broker since
  0.11 requires): zigzag-varint record fields, CRC32C (Castagnoli)
  over attributes..end, producer fields -1 for a non-transactional,
  non-idempotent producer — exactly what the reference's default
  config (`Idempotent: false`) sends.
- ProduceRequest v3 / ProduceResponse v3 (header v1, non-flexible):
  the first version that carries magic-2 batches and the
  transactional_id field; acks/timeout + topic->partition->records.

Both directions are implemented (encode for the producer, decode for
the broker-shaped test server and for parity checks), so a pytest can
assert byte-for-byte roundtrips and CRC integrity without Kafka
itself.
"""

from __future__ import annotations

import struct

API_PRODUCE = 0
PRODUCE_VERSION = 3

#: broker error codes the producer retries on (the sarama retriable
#: set the reference inherits via Producer.Retry.Max=10)
RETRIABLE_ERRORS = frozenset(
    {
        5,  # LEADER_NOT_AVAILABLE
        6,  # NOT_LEADER_OR_FOLLOWER
        7,  # REQUEST_TIMED_OUT
        8,  # REPLICA_NOT_AVAILABLE
        19,  # NOT_ENOUGH_REPLICAS
        20,  # NOT_ENOUGH_REPLICAS_AFTER_APPEND
    }
)


# -- CRC32C (Castagnoli, reflected poly 0x82F63B78) -------------------

def _make_crc32c_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# -- zigzag varints (record-level integer encoding) -------------------

def encode_varint(value: int) -> bytes:
    """Signed zigzag varint, as used by every integer field inside a
    magic-2 record."""
    zz = (value << 1) ^ (value >> 63) if value < 0 else value << 1
    out = bytearray()
    while True:
        bits = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    """-> (value, next_pos); raises ValueError on a torn varint."""
    shift, zz = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("torn varint")
        b = data[pos]
        pos += 1
        zz |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow")
    return (zz >> 1) ^ -(zz & 1), pos


# -- primitive fields -------------------------------------------------

def _string(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    raw = s.encode()
    return struct.pack(">h", len(raw)) + raw


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _read_string(data: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", data, pos)
    pos += 2
    if n < 0:
        return None, pos
    return data[pos : pos + n].decode(), pos + n


def _read_bytes(data: bytes, pos: int) -> tuple[bytes | None, int]:
    (n,) = struct.unpack_from(">i", data, pos)
    pos += 4
    if n < 0:
        return None, pos
    return data[pos : pos + n], pos + n


# -- RecordBatch (magic 2) --------------------------------------------

def encode_record(
    offset_delta: int,
    timestamp_delta: int,
    key: bytes | None,
    value: bytes | None,
    headers: list[tuple[str, bytes]] | None = None,
) -> bytes:
    headers = headers or []
    body = bytearray()
    body += b"\x00"  # record attributes (unused)
    body += encode_varint(timestamp_delta)
    body += encode_varint(offset_delta)
    for blob in (key, value):
        if blob is None:
            body += encode_varint(-1)
        else:
            body += encode_varint(len(blob)) + blob
    body += encode_varint(len(headers))
    for hk, hv in headers:
        raw = hk.encode()
        body += encode_varint(len(raw)) + raw
        if hv is None:
            body += encode_varint(-1)
        else:
            body += encode_varint(len(hv)) + hv
    return encode_varint(len(body)) + bytes(body)


def encode_record_batch(
    messages: list[tuple[bytes | None, bytes | None, int]],
    *,
    base_offset: int = 0,
) -> bytes:
    """[(key, value, timestamp_ms)] -> one magic-2 RecordBatch.

    Producer identity fields are -1 (non-idempotent, the reference's
    default `sink.kafka.idempotent=false`); attributes 0 (no
    compression, CREATE_TIME)."""
    if not messages:
        raise ValueError("empty record batch")
    base_ts = min(ts for _, _, ts in messages)
    max_ts = max(ts for _, _, ts in messages)
    records = b"".join(
        encode_record(i, ts - base_ts, key, value)
        for i, (key, value, ts) in enumerate(messages)
    )
    # attributes..records — the CRC32C span
    crc_body = (
        struct.pack(">h", 0)  # attributes
        + struct.pack(">i", len(messages) - 1)  # lastOffsetDelta
        + struct.pack(">q", base_ts)
        + struct.pack(">q", max_ts)
        + struct.pack(">q", -1)  # producerId
        + struct.pack(">h", -1)  # producerEpoch
        + struct.pack(">i", -1)  # baseSequence
        + struct.pack(">i", len(messages))
        + records
    )
    crc = crc32c(crc_body)
    # partitionLeaderEpoch + magic + crc + crc_body
    tail = struct.pack(">ibI", -1, 2, crc) + crc_body
    return struct.pack(">qi", base_offset, len(tail)) + tail


def decode_record_batch(data: bytes) -> dict:
    """RecordBatch bytes -> {base_offset, base_timestamp, records:
    [(key, value, timestamp_ms, headers)]}; verifies magic and CRC32C
    (a corrupt batch raises, matching broker behavior)."""
    if len(data) < 61:
        raise ValueError("truncated record batch")
    base_offset, batch_len = struct.unpack_from(">qi", data, 0)
    if len(data) < 12 + batch_len:
        raise ValueError("truncated record batch body")
    _epoch, magic, crc = struct.unpack_from(">ibI", data, 12)
    if magic != 2:
        raise ValueError(f"unsupported record batch magic {magic}")
    crc_body = data[21 : 12 + batch_len]
    if crc32c(crc_body) != crc:
        raise ValueError("record batch CRC mismatch")
    (attributes, last_delta) = struct.unpack_from(">hi", crc_body, 0)
    if attributes & 0x07:
        raise ValueError("compressed batches unsupported")
    base_ts, _max_ts = struct.unpack_from(">qq", crc_body, 6)
    (n_records,) = struct.unpack_from(">i", crc_body, 36)
    pos, records = 40, []
    for _ in range(n_records):
        rec_len, pos = decode_varint(crc_body, pos)
        end = pos + rec_len
        _attr = crc_body[pos]
        pos += 1
        ts_delta, pos = decode_varint(crc_body, pos)
        _off_delta, pos = decode_varint(crc_body, pos)
        klen, pos = decode_varint(crc_body, pos)
        key = None if klen < 0 else crc_body[pos : pos + klen]
        pos += max(klen, 0)
        vlen, pos = decode_varint(crc_body, pos)
        value = None if vlen < 0 else crc_body[pos : pos + vlen]
        pos += max(vlen, 0)
        n_headers, pos = decode_varint(crc_body, pos)
        headers = []
        for _ in range(n_headers):
            hklen, pos = decode_varint(crc_body, pos)
            hk = crc_body[pos : pos + hklen].decode()
            pos += hklen
            hvlen, pos = decode_varint(crc_body, pos)
            hv = None if hvlen < 0 else crc_body[pos : pos + hvlen]
            pos += max(hvlen, 0)
            headers.append((hk, hv))
        if pos != end:
            raise ValueError("record length mismatch")
        records.append((key, value, base_ts + ts_delta, headers))
    return {
        "base_offset": base_offset,
        "base_timestamp": base_ts,
        "last_offset_delta": last_delta,
        "records": records,
    }


# -- ProduceRequest / ProduceResponse v3 ------------------------------

def encode_produce_request(
    correlation_id: int,
    client_id: str,
    topic_batches: dict[str, dict[int, bytes]],
    *,
    acks: int = 1,
    timeout_ms: int = 10_000,
    transactional_id: str | None = None,
) -> bytes:
    """{topic: {partition: record_batch_bytes}} -> one size-prefixed
    ProduceRequest v3 frame. acks=1 is the reference's WaitForLocal."""
    body = bytearray()
    body += struct.pack(">hhi", API_PRODUCE, PRODUCE_VERSION, correlation_id)
    body += _string(client_id)
    body += _string(transactional_id)
    body += struct.pack(">hi", acks, timeout_ms)
    body += struct.pack(">i", len(topic_batches))
    for topic, parts in topic_batches.items():
        body += _string(topic)
        body += struct.pack(">i", len(parts))
        for partition, batch in parts.items():
            body += struct.pack(">i", partition)
            body += _bytes(batch)
    return struct.pack(">i", len(body)) + bytes(body)


def decode_produce_request(frame: bytes) -> dict:
    """Size-prefixed request frame -> parsed structure (the
    broker-side decode the test server runs)."""
    (size,) = struct.unpack_from(">i", frame, 0)
    if len(frame) < 4 + size:
        raise ValueError("torn produce request")
    body = frame[4 : 4 + size]
    api_key, api_version, correlation_id = struct.unpack_from(">hhi", body, 0)
    if api_key != API_PRODUCE:
        raise ValueError(f"not a produce request (api_key={api_key})")
    pos = 8
    client_id, pos = _read_string(body, pos)
    transactional_id, pos = _read_string(body, pos)
    acks, timeout_ms = struct.unpack_from(">hi", body, pos)
    pos += 6
    (n_topics,) = struct.unpack_from(">i", body, pos)
    pos += 4
    topics = {}
    for _ in range(n_topics):
        topic, pos = _read_string(body, pos)
        (n_parts,) = struct.unpack_from(">i", body, pos)
        pos += 4
        parts = {}
        for _ in range(n_parts):
            (partition,) = struct.unpack_from(">i", body, pos)
            pos += 4
            batch, pos = _read_bytes(body, pos)
            parts[partition] = batch
        topics[topic] = parts
    return {
        "api_version": api_version,
        "correlation_id": correlation_id,
        "client_id": client_id,
        "transactional_id": transactional_id,
        "acks": acks,
        "timeout_ms": timeout_ms,
        "topics": topics,
    }


def encode_produce_response(
    correlation_id: int,
    results: dict[str, dict[int, tuple[int, int]]],
    *,
    throttle_ms: int = 0,
) -> bytes:
    """{topic: {partition: (error_code, base_offset)}} -> one
    size-prefixed ProduceResponse v3 frame (log_append_time -1 =
    CREATE_TIME, the non-LogAppendTime default)."""
    body = bytearray()
    body += struct.pack(">i", correlation_id)
    body += struct.pack(">i", len(results))
    for topic, parts in results.items():
        body += _string(topic)
        body += struct.pack(">i", len(parts))
        for partition, (error_code, base_offset) in parts.items():
            body += struct.pack(">ihqq", partition, error_code, base_offset, -1)
    body += struct.pack(">i", throttle_ms)
    return struct.pack(">i", len(body)) + bytes(body)


def decode_produce_response(frame: bytes) -> dict:
    """Size-prefixed response frame -> {correlation_id, results:
    {topic: {partition: (error_code, base_offset)}}, throttle_ms}."""
    (size,) = struct.unpack_from(">i", frame, 0)
    if len(frame) < 4 + size:
        raise ValueError("torn produce response")
    body = frame[4 : 4 + size]
    (correlation_id,) = struct.unpack_from(">i", body, 0)
    pos = 4
    (n_topics,) = struct.unpack_from(">i", body, pos)
    pos += 4
    results: dict[str, dict[int, tuple[int, int]]] = {}
    for _ in range(n_topics):
        topic, pos = _read_string(body, pos)
        (n_parts,) = struct.unpack_from(">i", body, pos)
        pos += 4
        parts = {}
        for _ in range(n_parts):
            partition, error_code, base_offset, _lat = struct.unpack_from(
                ">ihqq", body, pos
            )
            pos += 22
            parts[partition] = (error_code, base_offset)
        results[topic] = parts
    (throttle_ms,) = struct.unpack_from(">i", body, pos)
    return {
        "correlation_id": correlation_id,
        "results": results,
        "throttle_ms": throttle_ms,
    }


# -- SASL (handshake + authenticate) ----------------------------------
#
# The reference enables SASL on its sarama producer via
# sink.kafka.sasl.{enabled,user,password,mechanism}
# (kafka.go:54-66, constants.go:68-71). sarama performs:
# SaslHandshakeRequest v1 (api_key 17) announcing the mechanism, then
# one or more SaslAuthenticateRequest v0 (api_key 36) roundtrips
# carrying the opaque mechanism bytes — PLAIN is a single roundtrip,
# SCRAM-SHA-256 (RFC 5802/7677) is client-first/server-first/
# client-final/server-final over two. Both frames are plain
# (non-flexible) versions so they share this module's string/bytes
# primitives.

API_SASL_HANDSHAKE = 17
SASL_HANDSHAKE_VERSION = 1
API_SASL_AUTHENTICATE = 36
SASL_AUTHENTICATE_VERSION = 0

ERROR_UNSUPPORTED_SASL_MECHANISM = 33
ERROR_ILLEGAL_SASL_STATE = 34
ERROR_SASL_AUTHENTICATION_FAILED = 58


def plain_auth_bytes(username: str, password: str, authzid: str = "") -> bytes:
    """RFC 4616 PLAIN initial response: authzid NUL authcid NUL passwd."""
    return b"\x00".join(
        (authzid.encode(), username.encode(), password.encode())
    )


def encode_sasl_handshake_request(
    correlation_id: int, client_id: str, mechanism: str
) -> bytes:
    body = bytearray()
    body += struct.pack(
        ">hhi", API_SASL_HANDSHAKE, SASL_HANDSHAKE_VERSION, correlation_id
    )
    body += _string(client_id)
    body += _string(mechanism)
    return struct.pack(">i", len(body)) + bytes(body)


def decode_sasl_handshake_request(frame: bytes) -> dict:
    (size,) = struct.unpack_from(">i", frame, 0)
    if len(frame) < 4 + size:
        raise ValueError("torn sasl handshake request")
    body = frame[4 : 4 + size]
    api_key, api_version, correlation_id = struct.unpack_from(">hhi", body, 0)
    if api_key != API_SASL_HANDSHAKE:
        raise ValueError(f"not a sasl handshake request (api_key={api_key})")
    pos = 8
    client_id, pos = _read_string(body, pos)
    mechanism, pos = _read_string(body, pos)
    return {
        "api_version": api_version,
        "correlation_id": correlation_id,
        "client_id": client_id,
        "mechanism": mechanism,
    }


def encode_sasl_handshake_response(
    correlation_id: int, error_code: int, mechanisms: list[str]
) -> bytes:
    body = bytearray()
    body += struct.pack(">ih", correlation_id, error_code)
    body += struct.pack(">i", len(mechanisms))
    for m in mechanisms:
        body += _string(m)
    return struct.pack(">i", len(body)) + bytes(body)


def decode_sasl_handshake_response(frame: bytes) -> dict:
    (size,) = struct.unpack_from(">i", frame, 0)
    if len(frame) < 4 + size:
        raise ValueError("torn sasl handshake response")
    body = frame[4 : 4 + size]
    correlation_id, error_code = struct.unpack_from(">ih", body, 0)
    pos = 6
    (n,) = struct.unpack_from(">i", body, pos)
    pos += 4
    mechanisms = []
    for _ in range(n):
        m, pos = _read_string(body, pos)
        mechanisms.append(m)
    return {
        "correlation_id": correlation_id,
        "error_code": error_code,
        "mechanisms": mechanisms,
    }


def encode_sasl_authenticate_request(
    correlation_id: int, client_id: str, auth_bytes: bytes
) -> bytes:
    body = bytearray()
    body += struct.pack(
        ">hhi", API_SASL_AUTHENTICATE, SASL_AUTHENTICATE_VERSION, correlation_id
    )
    body += _string(client_id)
    body += _bytes(auth_bytes)
    return struct.pack(">i", len(body)) + bytes(body)


def decode_sasl_authenticate_request(frame: bytes) -> dict:
    (size,) = struct.unpack_from(">i", frame, 0)
    if len(frame) < 4 + size:
        raise ValueError("torn sasl authenticate request")
    body = frame[4 : 4 + size]
    api_key, api_version, correlation_id = struct.unpack_from(">hhi", body, 0)
    if api_key != API_SASL_AUTHENTICATE:
        raise ValueError(
            f"not a sasl authenticate request (api_key={api_key})"
        )
    pos = 8
    client_id, pos = _read_string(body, pos)
    auth_bytes, pos = _read_bytes(body, pos)
    return {
        "api_version": api_version,
        "correlation_id": correlation_id,
        "client_id": client_id,
        "auth_bytes": auth_bytes,
    }


def encode_sasl_authenticate_response(
    correlation_id: int,
    error_code: int,
    auth_bytes: bytes = b"",
    error_message: str | None = None,
) -> bytes:
    body = bytearray()
    body += struct.pack(">ih", correlation_id, error_code)
    body += _string(error_message)
    body += _bytes(auth_bytes)
    return struct.pack(">i", len(body)) + bytes(body)


def decode_sasl_authenticate_response(frame: bytes) -> dict:
    (size,) = struct.unpack_from(">i", frame, 0)
    if len(frame) < 4 + size:
        raise ValueError("torn sasl authenticate response")
    body = frame[4 : 4 + size]
    correlation_id, error_code = struct.unpack_from(">ih", body, 0)
    pos = 6
    error_message, pos = _read_string(body, pos)
    auth_bytes, pos = _read_bytes(body, pos)
    return {
        "correlation_id": correlation_id,
        "error_code": error_code,
        "error_message": error_message,
        "auth_bytes": auth_bytes,
    }


# -- Metadata (cluster-mode leader discovery) --------------------------
#
# sarama routes each partition's produce to that partition's leader
# broker, learned from a MetadataRequest against any bootstrap broker
# (the reference's broker-list config, kafka.go:44 `sarama.NewClient(
# brokers...)`). Version 1 is the last non-flexible metadata version
# that still returns rack + controller — it shares this module's
# plain string/array primitives, like the SASL frames above.

API_METADATA = 3
METADATA_VERSION = 1

ERROR_NOT_LEADER = 6
ERROR_UNKNOWN_TOPIC_OR_PARTITION = 3


def encode_metadata_request(
    correlation_id: int, client_id: str, topics: list[str] | None
) -> bytes:
    """topics=None asks for ALL topics (null array, v1 semantics)."""
    body = bytearray()
    body += struct.pack(">hhi", API_METADATA, METADATA_VERSION, correlation_id)
    body += _string(client_id)
    if topics is None:
        body += struct.pack(">i", -1)
    else:
        body += struct.pack(">i", len(topics))
        for t in topics:
            body += _string(t)
    return struct.pack(">i", len(body)) + bytes(body)


def decode_metadata_request(frame: bytes) -> dict:
    (size,) = struct.unpack_from(">i", frame, 0)
    body = frame[4 : 4 + size]
    api_key, api_version, correlation_id = struct.unpack_from(">hhi", body, 0)
    if api_key != API_METADATA:
        raise ValueError(f"not a metadata request (api_key={api_key})")
    pos = 8
    client_id, pos = _read_string(body, pos)
    (n,) = struct.unpack_from(">i", body, pos)
    pos += 4
    topics: list[str] | None
    if n < 0:
        topics = None
    else:
        topics = []
        for _ in range(n):
            t, pos = _read_string(body, pos)
            topics.append(t)
    return {
        "api_version": api_version,
        "correlation_id": correlation_id,
        "client_id": client_id,
        "topics": topics,
    }


def encode_metadata_response(
    correlation_id: int,
    brokers: list[tuple[int, str, int]],
    topics: dict[str, dict[int, int]],
    *,
    controller_id: int = 0,
    topic_errors: dict[str, int] | None = None,
) -> bytes:
    """brokers = [(node_id, host, port)]; topics = {name: {partition:
    leader_node_id}} -> one size-prefixed MetadataResponse v1 frame
    (rack null, replicas/isr = [leader])."""
    topic_errors = topic_errors or {}
    body = bytearray()
    body += struct.pack(">i", correlation_id)
    body += struct.pack(">i", len(brokers))
    for node_id, host, port in brokers:
        body += struct.pack(">i", node_id)
        body += _string(host)
        body += struct.pack(">i", port)
        body += _string(None)  # rack
    body += struct.pack(">i", controller_id)
    body += struct.pack(">i", len(topics))
    for name, parts in topics.items():
        body += struct.pack(">h", topic_errors.get(name, 0))
        body += _string(name)
        body += struct.pack(">?", False)  # is_internal
        body += struct.pack(">i", len(parts))
        for pid, leader in parts.items():
            body += struct.pack(">hii", 0, pid, leader)
            body += struct.pack(">ii", 1, leader)   # replicas=[leader]
            body += struct.pack(">ii", 1, leader)   # isr=[leader]
    return struct.pack(">i", len(body)) + bytes(body)


def decode_metadata_response(frame: bytes) -> dict:
    """-> {correlation_id, brokers: {node_id: (host, port)},
    controller_id, topics: {name: {"error_code", "partitions":
    {partition: leader_node_id}}}}."""
    (size,) = struct.unpack_from(">i", frame, 0)
    if len(frame) < 4 + size:
        raise ValueError("torn metadata response")
    body = frame[4 : 4 + size]
    (correlation_id,) = struct.unpack_from(">i", body, 0)
    pos = 4
    (n_brokers,) = struct.unpack_from(">i", body, pos)
    pos += 4
    brokers: dict[int, tuple[str, int]] = {}
    for _ in range(n_brokers):
        (node_id,) = struct.unpack_from(">i", body, pos)
        pos += 4
        host, pos = _read_string(body, pos)
        (port,) = struct.unpack_from(">i", body, pos)
        pos += 4
        _rack, pos = _read_string(body, pos)
        brokers[node_id] = (host, port)
    (controller_id,) = struct.unpack_from(">i", body, pos)
    pos += 4
    (n_topics,) = struct.unpack_from(">i", body, pos)
    pos += 4
    topics: dict[str, dict] = {}
    for _ in range(n_topics):
        (err,) = struct.unpack_from(">h", body, pos)
        pos += 2
        name, pos = _read_string(body, pos)
        pos += 1  # is_internal
        (n_parts,) = struct.unpack_from(">i", body, pos)
        pos += 4
        parts: dict[int, int] = {}
        for _ in range(n_parts):
            _perr, pid, leader = struct.unpack_from(">hii", body, pos)
            pos += 10
            (n_rep,) = struct.unpack_from(">i", body, pos)
            pos += 4 + 4 * n_rep
            (n_isr,) = struct.unpack_from(">i", body, pos)
            pos += 4 + 4 * n_isr
            parts[pid] = leader
        topics[name] = {"error_code": err, "partitions": parts}
    return {
        "correlation_id": correlation_id,
        "brokers": brokers,
        "controller_id": controller_id,
        "topics": topics,
    }
