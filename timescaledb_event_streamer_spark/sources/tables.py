"""Batch parquet source for the driver testdata tables.

Plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning into the scan (verified in
tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


# The driver testdata is written with nanosecond parquet timestamps
# (pandas datetime64[ns]); Spark has no TIMESTAMP(NANOS) type, so we
# read them as raw longs and truncate ns -> us exactly like DuckDB
# does when it reads the same files (verified: both floor-divide).
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
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
