"""Round-11 components: distributed global rank, and the reworked
doc-grain queries that now use it (F45/F51/F52 — identical output
algebra, no single-partition window)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.ranking import global_row_number


def _frame(spark, n=5000, parts=16):
    # skewed values + unique tie-break id, scattered across partitions
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("k"),
            (F.pmod(F.col("id") * 2654435761, F.lit(97))).alias("v"),
        )
    )


def test_global_row_number_matches_single_partition_window(spark):
    df = _frame(spark)
    order = [F.col("v").desc(), F.col("k").asc()]
    got = global_row_number(df, order, col_name="rk").select("k", "rk")
    want = df.select(
        "k", F.row_number().over(Window.orderBy(*order)).alias("rk")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_row_number_zero_based_and_dense_range(spark):
    df = _frame(spark, n=1234, parts=7)
    out = global_row_number(
        df, [F.col("v").asc(), F.col("k").asc()], col_name="rk", zero_based=True
    )
    ranks = [r.rk for r in out.select("rk").collect()]
    assert sorted(ranks) == list(range(1234))


def test_global_row_number_no_single_partition_window(spark):
    df = _frame(spark)
    out = global_row_number(df, [F.col("v").desc(), F.col("k").asc()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only windows are the per-partition rank and the
    # metadata-grain offset cumsum (input = one row per partition)
    assert "Exchange rangepartitioning" in plan
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from plan_audit import unpartitioned_data_windows

    assert not unpartitioned_data_windows(
        out._jdf.queryExecution().executedPlan()
    )


def test_distributed_ntile_matches_builtin(spark):
    """The closed-form ntile in corpus_curriculum_order must equal
    Spark's ntile for remainder and no-remainder row counts."""
    for n_rows in (17, 16, 3):
        df = spark.range(n_rows).select(F.col("id").alias("k"))
        want = df.select(
            "k",
            F.ntile(4).over(Window.orderBy("k")).cast("long").alias("ph"),
        )
        ranked = global_row_number(
            df, [F.col("k").asc()], col_name="rk0", zero_based=True
        )
        tot = ranked.agg(F.count(F.lit(1)).alias("n_rows"))
        small = (F.col("n_rows") / F.lit(4)).cast("long")
        rem = F.col("n_rows") % F.lit(4)
        big = small + 1
        cut = rem * big
        got = ranked.crossJoin(F.broadcast(tot)).select(
            "k",
            F.when(
                F.col("rk0") < cut, (F.col("rk0") / big).cast("long") + 1
            )
            .otherwise(
                rem
                + ((F.col("rk0") - cut) / F.greatest(small, F.lit(1))).cast("long")
                + 1
            )
            .cast("long")
            .alias("ph"),
        )
        assert got.exceptAll(want).count() == 0, n_rows
        assert want.exceptAll(got).count() == 0, n_rows
