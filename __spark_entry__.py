"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over timescaledb_event_streamer_spark.plans.registry —
the package is the source of truth for SURVEY.md §2 coverage.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescaledb_event_streamer_spark.plans.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC chunk->hypertable resolution on sf0.001."""
    return all_queries()["cdc_chunk_resolution"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
