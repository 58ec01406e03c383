"""Distributed global ranking — the two-pass range-partitioned
row_number that replaces single-partition global-order windows.

A `row_number().over(Window.orderBy(...))` with no partition spec
funnels EVERY row through one task (`WindowExec: No Partition
Defined`); at 100 TB that is billions of rows through a single
executor thread. The classic fix (the same shape Spark's own
RangePartitioner-based sort uses) is two passes:

1. `repartitionByRange` on the order columns — each partition holds
   one contiguous slice of the global order;
2. per-partition `row_number` (partitioned window, parallel) plus a
   broadcast cumulative-offset table computed from per-partition
   counts (metadata-grain: one row per shuffle partition).

global rank = partition offset + local row_number. The result is
deterministic regardless of where the sampled range bounds land as
long as the order is TOTAL (include a unique tie-break column),
because rank is a pure function of the total order, not of the
partitioning. Used by corpus_shard_planner (F52) and
corpus_curriculum_order (F45); text_vocab_concentration (F51) uses
the cheaper sort+limit shape (F35) because it only needs the top-k.

tools/plan_audit.py enforces the rule repo-wide: no unpartitioned
WindowExec may sit over unbounded (scan-grain) input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number"]


def global_row_number(
    df: DataFrame,
    order: list[Column],
    col_name: str = "rk",
    zero_based: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a global row_number over a TOTAL order, distributed.

    `order` must be a total order (break ties with a unique key) or
    the rank — and anything derived from it — is nondeterministic.
    Costs one range shuffle + one hash shuffle (the per-partition
    window) + a metadata-sized broadcast; never a single-partition
    window over the data.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    part = df.repartitionByRange(n, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    # one row per occupied partition — metadata-grain by construction
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order)
    base = F.row_number().over(w_local) + F.col("__off")
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(col_name, base - 1 if zero_based else base)
        .drop("__pid", "__off")
    )
