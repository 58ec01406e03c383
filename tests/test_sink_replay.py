"""Checkpoint-replay at-least-once parity across the broker sinks
(r10, VERDICT r9 item 6): the H15 contract — a micro-batch whose
delivery TASK fails (broker errors mid-batch) fails the streaming
query; restarting on the same checkpoint REPLAYS the batch and every
row lands at least once. Duplicates are allowed (at-least-once) and
deduped downstream on envelope identity, exactly as the reference
documents for its sinks. One parametrized test drives the same
contract over the Kafka, NATS and Redis protocol-shaped local
servers."""

from __future__ import annotations

import json
import threading

import pytest

from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import StreamingQueryException

from tests.test_kafka_sink import _BrokerHandler, _QuietBroker
from tests.test_nats_sink import _NatsHandler, _QuietNats
from tests.test_redis_sink import _QuietRedis, _RedisHandler
from timescaledb_event_streamer_spark.sinks.kafka_delivery import (
    kafka_sink_stream,
)
from timescaledb_event_streamer_spark.sinks.nats_delivery import (
    nats_sink_stream,
)
from timescaledb_event_streamer_spark.sinks.redis_delivery import (
    redis_sink_stream,
)

N_ROWS = 8


def _start_kafka():
    srv = _QuietBroker(("127.0.0.1", 0), _BrokerHandler)
    srv.logs, srv.requests = {}, []
    srv.fail_first = 0
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def _start_nats():
    srv = _QuietNats(("127.0.0.1", 0), _NatsHandler)
    srv.logs, srv.connects = {}, []
    srv.fail_first = 0
    srv.lock = threading.Lock()
    srv.check_auth = lambda opts, nonce: True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def _start_redis():
    srv = _QuietRedis(("127.0.0.1", 0), _RedisHandler)
    srv.streams, srv.selects = {}, []
    srv.password = None
    srv.fail_first = 0
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def _kafka_input(spark):
    return spark.range(N_ROWS).select(
        F.col("id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct("id")).cast("binary").alias("value"),
        F.lit("t.public.x").alias("topic"),
        (F.col("id") + 1_700_000_000_000).alias("ts_ms"),
    )


def _nats_input(spark):
    return spark.range(N_ROWS).select(
        F.lit("t.public.x").alias("subject"),
        F.to_json(F.struct("id")).alias("key"),
        F.to_json(F.struct("id")).cast("binary").alias("data"),
    )


def _redis_input(spark):
    return spark.range(N_ROWS).select(
        F.lit("t.public.x").alias("stream"),
        F.to_json(F.struct("id")).alias("key"),
        F.to_json(F.struct("id")).alias("envelope"),
    )


def _kafka_ids(srv) -> list[int]:
    with srv.lock:
        return [
            json.loads(bytes(v).decode())["id"]
            for log in srv.logs.values()
            for _k, v, _ts, _h in log
        ]


def _nats_ids(srv) -> list[int]:
    with srv.lock:
        return [
            json.loads(payload.decode())["id"]
            for log in srv.logs.values()
            for _headers, payload in log
        ]


def _redis_ids(srv) -> list[int]:
    with srv.lock:
        return [
            json.loads(fields["envelope"])["id"]
            for log in srv.streams.values()
            for _id, fields in log
        ]


_SINKS = {
    "kafka": (
        _start_kafka,
        _kafka_input,
        "key BINARY, value BINARY, topic STRING, ts_ms LONG",
        lambda df, srv, ckpt: kafka_sink_stream(
            df, srv.server_address, checkpoint_dir=ckpt,
            max_retries=0, retry_backoff_s=0.001,
        ),
        _kafka_ids,
    ),
    "nats": (
        _start_nats,
        _nats_input,
        "subject STRING, key STRING, data BINARY",
        lambda df, srv, ckpt: nats_sink_stream(
            df, srv.server_address, checkpoint_dir=ckpt
        ),
        _nats_ids,
    ),
    "redis": (
        _start_redis,
        _redis_input,
        "stream STRING, key STRING, envelope STRING",
        lambda df, srv, ckpt: redis_sink_stream(
            df, srv.server_address, checkpoint_dir=ckpt
        ),
        _redis_ids,
    ),
}


@pytest.mark.parametrize("sink", sorted(_SINKS))
def test_failed_batch_replays_from_checkpoint(spark, tmp_path, sink):
    """Broker errors mid-batch -> the delivery task raises -> the
    availableNow query FAILS (no offset committed). Restart on the
    same checkpoint with a healthy broker: the batch replays and all
    N distinct identities land (duplicates from the aborted attempt
    are allowed — at-least-once)."""
    start, make_input, schema, start_stream, collect_ids = _SINKS[sink]
    srv = start()
    try:
        src = tmp_path / "in"
        src.mkdir()
        make_input(spark).coalesce(1).write.mode("overwrite").parquet(
            str(src / "b0")
        )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        ckpt = str(tmp_path / "ckpt")
        srv.fail_first = 1  # fail the first attempt mid-batch
        q = start_stream(stream, srv, ckpt).trigger(availableNow=True).start()
        with pytest.raises(StreamingQueryException):
            q.awaitTermination(120)

        # broker healthy again; same checkpoint -> the batch replays
        with srv.lock:
            srv.fail_first = 0
        q2 = start_stream(stream, srv, ckpt).trigger(availableNow=True).start()
        q2.awaitTermination(120)
        ids = collect_ids(srv)
        assert sorted(set(ids)) == list(range(N_ROWS))
        assert len(ids) >= N_ROWS  # duplicates allowed, loss is not

        # third restart, nothing new: no re-delivery (per-batch
        # exactly-once bookkeeping once the batch committed)
        n_before = len(ids)
        q3 = start_stream(stream, srv, ckpt).trigger(availableNow=True).start()
        q3.awaitTermination(120)
        assert len(collect_ids(srv)) == n_before
    finally:
        srv.shutdown()
        srv.server_close()
