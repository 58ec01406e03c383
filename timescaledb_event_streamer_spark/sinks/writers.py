"""Sinks (SURVEY.md §2.H): the Spark-side counterparts of the
reference's sink implementations (internal/eventing/sink/*).

A messaging sink in Spark terms is an encoding contract plus a
writeStream: we provide the kafka-shaped (key, value, topic) binary
encoding every broker sink shares, file/console/memory sinks for
durable and test paths, and an idempotent foreachBatch upsert that
plays the role of statestorage-backed at-least-once delivery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def kafka_shaped(env: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Encode an envelope DataFrame to the (key, value, topic, ts_ms)
    binary contract of the Kafka sink (sink/kafka/kafka.go: key =
    message key, value = JSON envelope, record timestamp = the
    envelope's event time — sarama sets ProducerMessage.Timestamp).
    Works for batch and streaming."""
    key_cols = key_cols or ["key_user_id"]
    payload_cols = [c for c in env.columns if c != "topic"]
    ts = (
        F.col("ts_ms").cast("long")
        if "ts_ms" in env.columns
        else F.lit(None).cast("long")
    )
    return env.select(
        F.to_json(F.struct(*[F.col(c) for c in key_cols])).cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).cast("binary").alias("value"),
        F.col("topic"),
        ts.alias("ts_ms"),
    )


def stdout_sink(env: DataFrame, **options) -> StreamingQuery:
    """Console sink (reference sink/stdout)."""
    return env.writeStream.format("console").outputMode("append").start(**options)


def memory_sink(env: DataFrame, name: str, output_mode: str = "append") -> StreamingQuery:
    return (
        env.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def parquet_sink(env: DataFrame, path: str, checkpoint: str) -> StreamingQuery:
    """Durable file sink with exactly-once file tracking via the
    checkpoint (the statestorage role)."""
    return (
        env.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_upsert(
    stream: DataFrame,
    state_dir: str,
    keys: list[str],
    order_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Idempotent keep-latest upsert sink: every micro-batch merges
    into a keyed state table, keeping the max `order_col` row per
    key. Re-delivered batches are absorbed (at-least-once source ->
    exactly-once state), mirroring the reference's offset-replay
    semantics after restart."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        from pyspark.sql import Window
        from pyspark.sql import functions as BF

        current = batch
        if os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(state_dir) for f in fs
        ):
            current = spark.read.parquet(state_dir).unionByName(batch)
        w = Window.partitionBy(*keys).orderBy(BF.col(order_col).desc())
        latest = (
            current.withColumn("__rn", BF.row_number().over(w))
            .filter(BF.col("__rn") == 1)
            .drop("__rn")
        )
        tmp = state_dir.rstrip("/") + ".tmp"
        latest.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(state_dir)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def decode_kafka_shaped(wire: DataFrame, value_schema: str) -> DataFrame:
    """Inverse of :func:`kafka_shaped`: decode the (key, value, topic)
    binary wire rows back into an envelope DataFrame. The key blob is
    the message key struct; `value_schema` is the DDL of the envelope
    payload. Closes the emit->consume loop: a downstream Spark job
    can consume exactly what this engine publishes (and what the
    reference's kafka sink publishes) with one from_json."""
    key = F.from_json(F.col("key").cast("string"), "key_user_id BIGINT")
    val = F.from_json(F.col("value").cast("string"), value_schema)
    return wire.select(
        F.col("topic"), key.alias("k"), val.alias("v")
    ).select("topic", "k.key_user_id", "v.*")
