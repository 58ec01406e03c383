"""Streaming sources: the Structured-Streaming stand-ins for the
reference's replication channel.

Reference parity: internal/replication/replicationchannel consumes
the PostgreSQL logical-replication stream; here the transaction log
arrives as (a) a file stream of event batches — the durable WAL-ish
path used by tests and any directory-based hand-off — or (b) a rate
source simulator for soak-style throughput tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def event_file_stream(spark: SparkSession, log_dir: str) -> DataFrame:
    """Stream event batches from a directory of parquet files (the
    transaction-log hand-off). maxFilesPerTrigger keeps batches
    bounded, the streaming analogue of the replication buffer."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(log_dir)
    )


def rate_event_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic CDC firehose from the rate source — deterministic
    event attributes derived from the monotonic counter."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(150)).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("signup"), F.lit("error")),
            (F.pmod(F.col("value"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * 7919, F.lit(5000)) / 100.0).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(F.col("value"), F.lit(100)), F.lit("}")).alias(
            "props"
        ),
    )
