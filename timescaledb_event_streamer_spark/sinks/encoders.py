"""Per-sink payload encodings (SURVEY.md §2.H) — the wire contracts
of the reference's sink zoo, as pure column transforms.

Each reference sink publishes the same Debezium envelope but differs
in how it derives the message identity/partitioning fields:

- Kinesis: partition key = topic name
  (internal/eventing/sink/awskinesis/awskinesis.go:133-143)
- SQS FIFO: message group = topic, dedup id = uppercase-hex
  SHA-256 over "<lsn>-<envelope json>" (awssqs.go:93-124; the txid
  variant applies when a transaction id is decoded)
- NATS: subject = topic (nats.go:133-153)
- Redis streams: XADD to stream = topic with {key, envelope} JSON
  fields (redis.go:112-125)
- HTTP: POST the envelope to one configured url (http.go:119-139)

In Spark these are DataFrame->DataFrame encoders: the actual
transport is whatever writeStream/foreachBatch target the deployment
wires up (Kafka connector, Kinesis connector, an HTTP foreachBatch),
so the *data contract* is what we implement and test. All encoders
work identically on batch and streaming frames and stay whole-stage
codegen (to_json/sha2 are JVM expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: envelope columns excluded from the value payload
_NON_PAYLOAD = ("topic",)


def _envelope_json(env: DataFrame) -> Column:
    payload_cols = [c for c in env.columns if c not in _NON_PAYLOAD]
    return F.to_json(F.struct(*[F.col(c) for c in payload_cols]))


def kinesis_shaped(env: DataFrame) -> DataFrame:
    """(stream, partition_key, data) — partition key is the topic
    name, so one topic's events land on one shard in order, exactly
    the reference's ordering guarantee."""
    return env.select(
        F.col("topic").alias("stream"),
        F.col("topic").alias("partition_key"),
        _envelope_json(env).cast("binary").alias("data"),
    )


def sqs_shaped(env: DataFrame) -> DataFrame:
    """(message_group_id, message_deduplication_id, message_body) for
    a FIFO queue. Dedup id = SHA-256 over lsn + body (uppercase hex,
    like Go's %X): re-emitted envelopes after an offset replay dedupe
    broker-side — at-least-once upstream, exactly-once queue."""
    body = _envelope_json(env)
    return env.select(
        F.col("topic").alias("message_group_id"),
        F.upper(
            F.sha2(F.concat(F.col("lsn").cast("string"), F.lit("-"), body), 256)
        ).alias("message_deduplication_id"),
        body.alias("message_body"),
    )


def nats_shaped(env: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """(subject, key, data) — subject-per-topic publish. The key is
    the JSON message key the reference always sets as the NATS `key`
    header (nats.go Emit), same derivation as kafka_shaped/
    redis_shaped."""
    key_cols = key_cols or ["key_user_id"]
    key_cols = [c for c in key_cols if c in env.columns]
    key = (
        F.to_json(F.struct(*[F.col(c) for c in key_cols]))
        if key_cols
        else F.lit("")
    )
    return env.select(
        F.col("topic").alias("subject"),
        key.alias("key"),
        _envelope_json(env).cast("binary").alias("data"),
    )


def redis_shaped(env: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """(stream, key, envelope) — the XADD field map of the Redis
    streams sink."""
    key_cols = key_cols or ["key_user_id"]
    return env.select(
        F.col("topic").alias("stream"),
        F.to_json(F.struct(*[F.col(c) for c in key_cols])).alias("key"),
        _envelope_json(env).alias("envelope"),
    )


def http_shaped(env: DataFrame, url: str) -> DataFrame:
    """(method, url, content_type, body) rows for an HTTP POST
    delivery loop (driven by foreachBatch in deployment)."""
    return env.select(
        F.lit("POST").alias("method"),
        F.lit(url).alias("url"),
        F.lit("application/json").alias("content_type"),
        _envelope_json(env).alias("body"),
    )
