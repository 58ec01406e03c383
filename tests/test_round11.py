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


def test_streaming_incremental_dedup_matches_batch_d25(spark, sf_small, tmp_path):
    """I40: the D25 admission flow live. Index signatures seed the
    bucket state in micro-batch 0; the NEW docs arrive split across
    two later micro-batches, so both the bucket state and the
    admission algebra genuinely cross a batch boundary. Verdicts
    must equal batch dedup_incremental_minhash row-for-row."""
    import time as _t

    from timescaledb_event_streamer_spark.operators.dedup import (
        _MERSENNE,
        minhash_signatures,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_queries
    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        incremental_dedup_verdicts,
        streaming_incremental_dedup,
    )

    docs = load(spark, sf_small, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    md5_base = lambda s: (  # noqa: E731  — D25's portable base hash
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _MERSENNE
    )
    sigs = minhash_signatures(docs, base_hash=md5_base)
    index = sigs.filter(F.col("doc_id") % 3 != 0).withColumn(
        "is_new", F.lit(False)
    )
    new = sigs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "is_new", F.lit(True)
    )
    log_dir = tmp_path / "inc_dedup_log"
    log_dir.mkdir()
    index.coalesce(1).write.parquet(str(log_dir / "b0"))
    _t.sleep(1.1)
    new.filter(F.col("doc_id") % 6 == 0).coalesce(1).write.parquet(
        str(log_dir / "b1")
    )
    _t.sleep(1.1)
    new.filter(F.col("doc_id") % 6 == 3).coalesce(1).write.parquet(
        str(log_dir / "b2")
    )
    stream = (
        spark.readStream.schema(index.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_incremental_dedup(stream)
        .writeStream.format("memory")
        .queryName("inc_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    candidates = spark.sql("SELECT * FROM inc_dedup_stream")
    got = {
        r["doc_id"]: (
            r["n_candidates"], r["best_match_id"],
            round(r["best_est_jaccard"] * 1e6), r["admitted"],
        )
        for r in incremental_dedup_verdicts(
            candidates, docs.filter(F.col("doc_id") % 3 == 0)
        ).collect()
    }
    want = {
        r["doc_id"]: (
            r["n_candidates"], r["best_match_id"],
            round(r["best_est_jaccard"] * 1e6), r["admitted"],
        )
        for r in all_queries()["dedup_incremental_minhash"](
            spark, sf_small
        ).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want
    # the stream found real cross-batch candidates, not all sentinels
    assert any(v[0] > 0 for v in got.values())
