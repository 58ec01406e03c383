"""Kafka sink delivery loop (H17): real produce wire bytes (magic-2
RecordBatch + ProduceRequest v3) driven end-to-end against a local
broker-shaped TCP server from executor-side foreachPartition, ack
parsing pinned, retriable-error retry semantics exactly the
reference's sarama config (WaitForLocal, Retry.Max=10), and the
at-least-once streaming path through a checkpoint."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sinks.kafka_delivery import (
    CLIENT_ID,
    KafkaDeliveryError,
    KafkaProducer,
    kafka_sink_batch,
    kafka_sink_stream,
)
from timescaledb_event_streamer_spark.sinks.kafka_wire import (
    crc32c,
    decode_produce_request,
    decode_produce_response,
    decode_record_batch,
    decode_varint,
    encode_produce_request,
    encode_produce_response,
    encode_record_batch,
    encode_varint,
)


# -- wire-layer unit coverage ----------------------------------------

def test_crc32c_known_vectors():
    """Public CRC32C check values (RFC 3720 §B.4)."""
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_varint_zigzag_roundtrip():
    for v in (0, 1, -1, 63, -64, 300, -301, 2**31, -(2**31), 2**62):
        data = encode_varint(v)
        got, pos = decode_varint(data, 0)
        assert got == v and pos == len(data)
    # Kafka's zigzag layout: small negatives stay 1 byte
    assert encode_varint(-1) == b"\x01"
    assert encode_varint(1) == b"\x02"


def test_record_batch_roundtrip_and_crc():
    msgs = [
        (b"k1", b"v1", 1_700_000_000_000),
        (None, b"tombstone-free", 1_700_000_000_500),
        (b"k3", None, 1_700_000_001_000),  # tombstone
    ]
    batch = encode_record_batch(msgs)
    out = decode_record_batch(batch)
    assert out["base_timestamp"] == 1_700_000_000_000
    assert out["last_offset_delta"] == 2
    assert [(k, v, ts) for k, v, ts, _ in out["records"]] == msgs
    # a single flipped payload bit must break the CRC
    corrupt = bytearray(batch)
    corrupt[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_record_batch(bytes(corrupt))


def test_produce_request_roundtrip():
    batch = encode_record_batch([(b"k", b"v", 123)])
    frame = encode_produce_request(
        7, CLIENT_ID, {"prefix.public.metrics": {0: batch}}, acks=1
    )
    req = decode_produce_request(frame)
    assert req["api_version"] == 3
    assert req["correlation_id"] == 7
    assert req["client_id"] == CLIENT_ID  # kafka.go:46
    assert req["transactional_id"] is None
    assert req["acks"] == 1  # WaitForLocal, kafka.go:50
    inner = decode_record_batch(req["topics"]["prefix.public.metrics"][0])
    assert inner["records"][0][:2] == (b"k", b"v")


def test_produce_response_roundtrip():
    frame = encode_produce_response(9, {"t": {0: (0, 42), 1: (7, -1)}})
    resp = decode_produce_response(frame)
    assert resp["correlation_id"] == 9
    assert resp["results"]["t"][0] == (0, 42)
    assert resp["results"]["t"][1] == (7, -1)


# -- broker-shaped local server --------------------------------------

class _BrokerHandler(socketserver.BaseRequestHandler):
    """Decodes real produce frames (CRC-verified), appends records to
    the per-(topic, partition) log, answers with correct base offsets.
    `fail_first` makes the first N produces answer a retriable error
    (REQUEST_TIMED_OUT) — the retry-path probe."""

    def handle(self):
        while True:
            head = b""
            while len(head) < 4:
                chunk = self.request.recv(4 - len(head))
                if not chunk:
                    return
                head += chunk
            (size,) = struct.unpack(">i", head)
            body = b""
            while len(body) < size:
                chunk = self.request.recv(size - len(body))
                if not chunk:
                    return
                body += chunk
            req = decode_produce_request(head + body)
            srv = self.server
            results = {}
            with srv.lock:
                for topic, parts in req["topics"].items():
                    results[topic] = {}
                    for partition, batch in parts.items():
                        if srv.fail_first > 0:
                            srv.fail_first -= 1
                            results[topic][partition] = (7, -1)
                            continue
                        decoded = decode_record_batch(batch)
                        log = srv.logs.setdefault((topic, partition), [])
                        base = len(log)
                        log.extend(decoded["records"])
                        results[topic][partition] = (0, base)
                srv.requests.append(req)
            if req["acks"] != 0:
                self.request.sendall(
                    encode_produce_response(req["correlation_id"], results)
                )


class _QuietBroker(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def handle_error(self, request, client_address):
        pass  # executor disconnects at partition end are expected


@pytest.fixture()
def broker():
    srv = _QuietBroker(("127.0.0.1", 0), _BrokerHandler)
    srv.logs, srv.requests = {}, []
    srv.fail_first = 0
    srv.lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


# -- producer semantics ----------------------------------------------

def test_producer_sync_send_acks_and_offsets(broker):
    with KafkaProducer(broker.server_address, n_partitions=4) as p:
        offs = p.send_batch(
            "t", [(b"a", b"1", 10), (b"b", b"2", 20), (b"a", b"3", 30)]
        )
    # same key -> same partition; offsets start at 0 per partition
    part_a = crc32c(b"a") % 4
    part_b = crc32c(b"b") % 4
    assert set(offs) == {part_a, part_b}
    assert all(off == 0 for off in offs.values())
    with broker.lock:
        log_a = list(broker.logs[("t", part_a)])
    assert [(k, v) for k, v, _, _ in log_a if k == b"a"] == [
        (b"a", b"1"),
        (b"a", b"3"),
    ]


def test_producer_retries_retriable_errors(broker):
    """First two produce attempts answer REQUEST_TIMED_OUT: sarama
    semantics retry (Retry.Max=10) and the third lands."""
    broker.fail_first = 2
    with KafkaProducer(
        broker.server_address, retry_backoff_s=0.001
    ) as p:
        offs = p.send_batch("t", [(b"k", b"v", 1)])
    assert offs == {0: 0}
    with broker.lock:
        assert len(broker.requests) == 3
        assert len(broker.logs[("t", 0)]) == 1


def test_producer_gives_up_after_max_retries(broker):
    broker.fail_first = 100
    with KafkaProducer(
        broker.server_address, max_retries=3, retry_backoff_s=0.001
    ) as p:
        with pytest.raises(KafkaDeliveryError, match="retries exhausted"):
            p.send_batch("t", [(b"k", b"v", 1)])
    with broker.lock:
        assert len(broker.requests) == 4  # 1 + 3 retries


def test_non_retriable_error_fails_immediately(broker):
    """A non-retriable code (e.g. 87 INVALID_RECORD-class) must fail
    the produce on the spot — no blind retry loop."""

    class _Rejecting(_BrokerHandler):
        def handle(self):
            head = self.request.recv(4)
            (size,) = struct.unpack(">i", head)
            body = b""
            while len(body) < size:
                body += self.request.recv(size - len(body))
            req = decode_produce_request(head + body)
            results = {
                t: {p: (87, -1) for p in parts}
                for t, parts in req["topics"].items()
            }
            self.request.sendall(
                encode_produce_response(req["correlation_id"], results)
            )

    srv = _QuietBroker(("127.0.0.1", 0), _Rejecting)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with KafkaProducer(srv.server_address) as p:
            with pytest.raises(KafkaDeliveryError, match="broker error 87"):
                p.send_batch("t", [(b"k", b"v", 1)])
    finally:
        srv.shutdown()
        srv.server_close()


# -- Spark end-to-end ------------------------------------------------

def _shaped(spark, n=25):
    """A kafka_shaped-contract frame: (key, value, topic, ts_ms)."""
    return spark.range(n).select(
        F.encode(F.concat(F.lit("k"), F.col("id").cast("string")), "utf-8").alias("key"),
        F.encode(
            F.to_json(F.struct(F.col("id"), (F.col("id") * 3).alias("v"))),
            "utf-8",
        ).alias("value"),
        F.concat(
            F.lit("prefix.public.t"), (F.col("id") % 2).cast("string")
        ).alias("topic"),
        (F.lit(1_700_000_000_000) + F.col("id")).alias("ts_ms"),
    )


def test_batch_delivery_from_executors(spark, broker):
    df = _shaped(spark, 25).repartition(4)
    kafka_sink_batch(df, broker.server_address, n_partitions=2)
    with broker.lock:
        logs = {k: list(v) for k, v in broker.logs.items()}
    all_records = [r for log in logs.values() for r in log]
    assert len(all_records) == 25
    # topic routing: id%2 decides the topic
    import json as _json

    for (topic, _part), log in logs.items():
        for _k, v, ts, _h in log:
            d = _json.loads(v)
            assert topic.endswith(str(d["id"] % 2))
            assert ts == 1_700_000_000_000 + d["id"]
            assert d["v"] == d["id"] * 3
    # every key landed on the partition the producer's rule names
    for (_topic, part), log in logs.items():
        for k, _v, _ts, _h in log:
            assert crc32c(k) % 2 == part


def test_streaming_delivery_with_checkpoint(spark, broker, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _shaped(spark, 10).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b0")
    )
    stream = (
        spark.readStream.schema("key BINARY, value BINARY, topic STRING, ts_ms LONG")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        kafka_sink_stream(
            stream,
            broker.server_address,
            n_partitions=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    with broker.lock:
        n = sum(len(v) for v in broker.logs.values())
    assert n == 10
    # restart on the same checkpoint: nothing new to deliver -> no
    # duplicate produce (the exactly-once-per-batch bookkeeping)
    q2 = (
        kafka_sink_stream(
            stream,
            broker.server_address,
            n_partitions=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    with broker.lock:
        assert sum(len(v) for v in broker.logs.values()) == 10
