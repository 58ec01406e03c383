"""Bucketed (pre-shuffled) table materialization for co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
event stream ⋈ per-key state) is the shuffle of both sides. Writing
both tables bucketed by the join key — Spark's `bucketBy`, the
analogue of the reference keeping per-table replication state keyed
by identity (`spi/statestorage/`) — makes every later equi-join on
that key exchange-free: each task reads matching bucket files from
both sides and merges them locally.

This module is the write-side contract; `tests/test_bucketing.py`
proves the read-side plan has NO Exchange on either join input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, database: str, location: str) -> None:
    """Create (idempotently) a catalog database rooted at ``location``.

    Keeps bucketed-table files out of the repo working tree — tests
    point this at a tmp dir; a cluster deployment points it at the
    warehouse path.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and bucket-sorted)
    by the join key.

    ``sort_cols`` defaults to the bucket key so a later sort-merge
    join can skip the per-bucket sort too. ``n_buckets`` should match
    across every table that will join on ``key`` — unequal bucket
    counts force a shuffle on the smaller side.
    """
    keys = [key] if isinstance(key, str) else list(key)
    sort_cols = sort_cols or keys
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(sort_cols[0], *sort_cols[1:])
        .saveAsTable(table)
    )


def is_exchange_free_join(spark: SparkSession, joined: DataFrame) -> bool:
    """True when the physical plan for ``joined`` contains no shuffle
    exchange — the property bucketing buys."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
