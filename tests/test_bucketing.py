"""Bucketed co-located join: write orders + lineitem bucketed by the
order key, then prove the join plan is exchange-free and returns the
same rows as the plain (shuffled) join.

This is the §6 scale posture made concrete: at 100 TB a repeated
fact-fact join key should be bucketed once at write time so every
downstream join reads co-located bucket files instead of shuffling
both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sources.bucketing import (
    ensure_database,
    is_exchange_free_join,
    write_bucketed,
)
from timescaledb_event_streamer_spark.sources.tables import load


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_small, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_warehouse")
    ensure_database(spark, "buckdb", str(loc))
    write_bucketed(
        load(spark, sf_small, "orders"), "buckdb.orders_b", "o_orderkey", 8
    )
    write_bucketed(
        load(spark, sf_small, "lineitem"), "buckdb.lineitem_b", "l_orderkey", 8
    )
    yield "buckdb"
    spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")


def test_bucketed_join_is_exchange_free_and_correct(spark, sf_small, bucketed_db):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("buckdb.orders_b")
        l = spark.table("buckdb.lineitem_b")
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
        )
        assert is_exchange_free_join(spark, joined), (
            "bucketed join should not shuffle either side:\n"
            + joined._jdf.queryExecution().executedPlan().toString()
        )

        plain = (
            load(spark, sf_small, "orders")
            .join(
                load(spark, sf_small, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        )
        got = sorted(joined.collect())
        want = sorted(plain.collect())
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_table_metadata(spark, bucketed_db):
    desc = {
        r.col_name: r.data_type
        for r in spark.sql("DESCRIBE EXTENDED buckdb.lineitem_b").collect()
    }
    assert desc.get("Num Buckets") == "8", desc
    assert "l_orderkey" in desc.get("Bucket Columns", ""), desc
