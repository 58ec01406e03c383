"""Batch parquet source for the driver testdata tables.

Plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning into the scan (verified in
tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Timestamp-bearing columns need normalization to plain TIMESTAMP
# (timestamp_ltz) regardless of how the driver wrote the parquet:
#   * nanosecond parquet timestamps (pandas datetime64[ns]) are read
#     as raw longs (legacy.parquet.nanosAsLong) and truncated ns->us
#     exactly like DuckDB does when it reads the same files;
#   * microsecond timestamps without a timezone flag (timestamp[us])
#     would infer as TIMESTAMP_NTZ, which functions like
#     unix_micros() reject — we disable NTZ inference so the scan
#     produces a native TIMESTAMP column (predicate pushdown on ts
#     stays intact; a cast would block it). The session timezone is
#     pinned to UTC (session.py), so the wall clock is interpreted
#     identically to DuckDB's naive reading and epoch arithmetic
#     agrees exactly. The NTZ cast branch below stays as a fallback
#     for sessions that override the inference conf.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _TS_COLS.get(name, ()):
        dtype = df.schema[col].dataType
        if isinstance(dtype, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif isinstance(dtype, TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before heavy per-row compute.

    Single row-group parquet (the local testdata) is unsplittable, so
    the whole map side of shingling/hashing/regex work runs in ONE
    task no matter how many cores exist. When the source delivers
    fewer partitions than the session's default parallelism,
    round-robin repartition so the expensive projection uses every
    core. On a real cluster the input splits of a 100 TB table far
    exceed defaultParallelism and this is a no-op — the guard keeps
    the extra exchange out of the at-scale plan.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
