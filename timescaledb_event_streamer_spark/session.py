"""Tuned SparkSession factory.

Scale posture: AQE on (runtime coalesce + skew-join splitting),
Arrow for any pandas exchange, UTC session timezone for
deterministic time-bucket semantics, shuffle partitions sized for
the local harness (the driver / a real cluster overrides via conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    # dim tables + chunk catalogs are small: broadcast aggressively
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.ui.enabled": "false",
    # keep stage-progress control characters off stderr so the bench
    # artifact's tail starts at the JSON line
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "timescaledb-event-streamer-spark") -> SparkSession:
    """Build (or fetch) the tuned local session used by tests/bench."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in DEFAULT_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
