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


# -- cluster-mode produce (metadata-driven leader routing) -------------

from timescaledb_event_streamer_spark.sinks.kafka_delivery import (  # noqa: E402
    KafkaClusterProducer,
)
from timescaledb_event_streamer_spark.sinks.kafka_wire import (  # noqa: E402
    API_METADATA,
    API_PRODUCE,
    decode_metadata_request,
    encode_metadata_response,
)


class _ClusterBrokerHandler(socketserver.BaseRequestHandler):
    """A broker that also answers MetadataRequest v1 from the shared
    cluster topology, and REFUSES produce for partitions it does not
    lead (NOT_LEADER, error 6) — the behavior that makes routing
    observable."""

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
            frame = head + body
            (api_key,) = struct.unpack_from(">h", body, 0)
            srv = self.server
            topo = srv.cluster
            if api_key == API_METADATA:
                req = decode_metadata_request(frame)
                with topo["lock"]:
                    brokers = [
                        (nid, "127.0.0.1", port)
                        for nid, port in sorted(topo["nodes"].items())
                    ]
                    topics = {
                        t: dict(parts)
                        for t, parts in topo["leaders"].items()
                        if req["topics"] is None or t in req["topics"]
                    }
                self.request.sendall(
                    encode_metadata_response(
                        req["correlation_id"], brokers, topics
                    )
                )
                continue
            assert api_key == API_PRODUCE, api_key
            req = decode_produce_request(frame)
            results = {}
            with topo["lock"]:
                for topic, parts in req["topics"].items():
                    results[topic] = {}
                    for partition, batch in parts.items():
                        leader = topo["leaders"][topic][partition]
                        if leader != srv.node_id:
                            results[topic][partition] = (6, -1)  # NOT_LEADER
                            continue
                        decoded = decode_record_batch(batch)
                        log = srv.logs.setdefault((topic, partition), [])
                        base = len(log)
                        log.extend(decoded["records"])
                        results[topic][partition] = (0, base)
            if req["acks"] != 0:
                self.request.sendall(
                    encode_produce_response(req["correlation_id"], results)
                )


@pytest.fixture()
def cluster():
    topo = {"nodes": {}, "leaders": {}, "lock": threading.Lock()}
    servers = []
    for node_id in (0, 1):
        srv = _QuietBroker(("127.0.0.1", 0), _ClusterBrokerHandler)
        srv.logs = {}
        srv.node_id = node_id
        srv.cluster = topo
        topo["nodes"][node_id] = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
    yield topo, servers
    for srv in servers:
        srv.shutdown()
        srv.server_close()


def _bootstrap(topo):
    return [("127.0.0.1", p) for p in sorted(topo["nodes"].values())]


def test_cluster_produce_routes_by_partition_leader(cluster):
    """Each partition's batch lands on ITS leader's socket: partition
    0 on node 0, partition 1 on node 1 — no broker sees a foreign
    partition (it would answer NOT_LEADER and fail the test)."""
    topo, servers = cluster
    topo["leaders"]["t"] = {0: 0, 1: 1}
    msgs = [(f"k{i}".encode(), f"v{i}".encode(), 1000 + i) for i in range(40)]
    with KafkaClusterProducer(_bootstrap(topo)) as p:
        offsets = p.send_batch("t", msgs)
    assert set(offsets) == {0, 1}  # both partitions were hit
    # routing: every record landed exactly once, on the leader only
    assert ("t", 1) not in servers[0].logs
    assert ("t", 0) not in servers[1].logs
    n0 = len(servers[0].logs[("t", 0)])
    n1 = len(servers[1].logs[("t", 1)])
    assert n0 + n1 == len(msgs) and n0 > 0 and n1 > 0
    # partition choice is the documented CRC32C rule over the LIVE
    # partition count from metadata
    for k, v, ts in msgs:
        want = crc32c(k) % 2
        log = servers[want].logs[("t", want)]
        assert any(rk == k for rk, _rv, _ts, _h in log)


def test_cluster_leader_move_refreshes_metadata(cluster):
    """After a leader move, the stale route draws NOT_LEADER; the
    producer re-learns the topology and delivers on the new leader
    instead of failing."""
    topo, servers = cluster
    topo["leaders"]["t"] = {0: 0}
    with KafkaClusterProducer(
        _bootstrap(topo), max_retries=0, retry_backoff_s=0.01
    ) as p:
        p.send_batch("t", [(b"a", b"1", 1)])
        assert len(servers[0].logs[("t", 0)]) == 1
        with topo["lock"]:
            topo["leaders"]["t"][0] = 1  # leadership moves to node 1
        p.send_batch("t", [(b"b", b"2", 2)])
    assert len(servers[0].logs[("t", 0)]) == 1  # no duplicate on old leader
    assert len(servers[1].logs[("t", 0)]) == 1  # delivered on new leader


def test_cluster_bootstrap_failover(cluster):
    """Metadata comes from the SECOND bootstrap broker when the first
    is unreachable — the point of configuring a broker list."""
    topo, servers = cluster
    topo["leaders"]["t"] = {0: 1}
    dead = ("127.0.0.1", 1)  # nothing listens on port 1
    bootstrap = [dead] + _bootstrap(topo)
    with KafkaClusterProducer(bootstrap, timeout_s=0.5) as p:
        p.send_batch("t", [(b"k", b"v", 1)])
    assert len(servers[1].logs[("t", 0)]) == 1


def test_cluster_config_dispatch(spark, sf_small, cluster, tmp_path):
    """A multi-broker sink.kafka.brokers config now selects cluster
    routing (r10's loud refusal replaced) — end-to-end through the
    config-driven dispatch."""
    from tests.test_config import _assembly
    from timescaledb_event_streamer_spark.sources.tables import load

    topo, servers = cluster
    ports = sorted(topo["nodes"].values())
    asm = _assembly(tmp_path, sink="kafka")
    asm.config.raw.setdefault("sink", {}).setdefault("kafka", {})[
        "brokers"
    ] = [f"127.0.0.1:{p}" for p in ports]
    env = asm.build(load(spark, sf_small, "events")).limit(20)
    shaped = asm.shape(env)
    topics = [r["topic"] for r in shaped.select("topic").distinct().collect()]
    with topo["lock"]:
        for t in topics:
            topo["leaders"][t] = {0: 0, 1: 1}
    asm.deliver_batch(shaped)
    total = sum(len(v) for srv in servers for v in srv.logs.values())
    assert total == 20
    # both partitions (hence both brokers) actually took records
    assert any(srv.logs for srv in servers)
    assert sum(1 for srv in servers if srv.logs) == 2
