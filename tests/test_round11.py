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


# -- r11 registered queries: planted-value pins -----------------------

import datetime as _dt
import math

from timescaledb_event_streamer_spark.plans.registry import all_queries


def _plant_events(spark, tmp_path, rows):
    """rows: (event_id, day_offset, event_type, value, vol)"""
    base = _dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (i, base + _dt.timedelta(days=d, hours=1 + (i % 3)), 1, et, v,
             '{"k": %d}' % k)
            for (i, d, et, v, k) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _plant_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, source)"""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for (i, t, s) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_cmo_monotone_rise_is_plus_100(spark, tmp_path):
    """A strictly rising close has zero down-moves: CMO == +100."""
    rows = [(i, i, "m", 10.0 + i, 1) for i in range(20)]
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_chande_momentum"](spark, sf).collect()
    assert len(out) == 20 - 14
    for r in out:
        assert r["down_cents"] == 0
        assert r["cmo"] == 100.0


def test_awesome_oscillator_constant_price_is_zero_flat(spark, tmp_path):
    rows = [(i, i, "m", 50.0, 1) for i in range(25)]
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_awesome_oscillator"](spark, sf).collect()
    assert len(out) == 25 - 21 + 1
    assert all(r["ao"] == 0.0 for r in out)
    # first emitted row predates a full-window predecessor: color null
    colors = {r["day_s"]: r["color"] for r in out}
    assert sorted(colors.values(), key=str).count("flat") == len(out) - 1


def test_mass_index_constant_range_is_window_length(spark, tmp_path):
    """Constant daily range -> EMA9(range) == EMA9(EMA9(range)) ->
    every ratio is exactly 1 -> MI == 25."""
    rows = []
    for d in range(26):
        rows.append((2 * d, d, "m", 10.0, 1))      # low of the day
        rows.append((2 * d + 1, d, "m", 12.0, 1))  # high (close=12)
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_mass_index"](spark, sf).collect()
    assert len(out) == 2
    for r in out:
        assert abs(r["mass_index"] - 25.0) < 1e-9


def test_adl_hand_computed(spark, tmp_path):
    """3 days, hand math: mfm = (2C-H-L)/(H-L), mfv = mfm*vol."""
    rows = [
        (0, 0, "m", 10.0, 100), (1, 0, "m", 20.0, 100),  # H20 L10 C20
        (2, 1, "m", 30.0, 50), (3, 1, "m", 10.0, 50),    # H30 L10 C10
        (4, 2, "m", 15.0, 70),                           # H=L=C=15
    ]
    sf = _plant_events(spark, tmp_path, rows)
    out = {r["day_s"]: r for r in all_queries()[
        "ts_accumulation_distribution"](spark, sf).collect()}
    days = sorted(out)
    # day0: mfm=+1, vol=200 -> +200; day1: mfm=-1, vol=100 -> -100;
    # day2 flat -> 0
    assert out[days[0]]["adl"] == 200.0
    assert out[days[1]]["adl"] == 100.0
    assert out[days[2]]["adl"] == 100.0
    assert out[days[0]]["accumulating"] is True   # vs the 0 baseline
    assert out[days[1]]["accumulating"] is False
    assert out[days[2]]["accumulating"] is False  # flat: not rising


def test_msttr_hand_computed(spark, tmp_path):
    """Segment 1: one type repeated 25x -> 1 distinct. Segment 2: 25
    distinct. 7 leftover tokens ignored. MSTTR = 26/50."""
    text = " ".join(["same"] * 25 + [f"w{i}" for i in range(25)] + ["x"] * 7)
    sf = _plant_docs(spark, tmp_path, [(1, text, "s")])
    r = all_queries()["text_msttr"](spark, sf).collect()[0]
    assert r["n_segments"] == 2
    assert r["distinct_sum"] == 26
    assert r["msttr"] == round(26 / 50, 6)


def test_lexical_richness_hand_computed(spark, tmp_path):
    """tokens: a a b -> N=3 V=2 V1=1 V2=1 rep2=2."""
    sf = _plant_docs(spark, tmp_path, [(1, "a a", "s"), (2, "b", "s")])
    r = all_queries()["text_lexical_richness"](spark, sf).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["hapax"], r["dis"]) == (3, 2, 1, 1)
    assert r["simpson_d"] == round(2 / 6, 6)
    assert r["guiraud_r"] == round(2 / math.sqrt(3), 6)
    assert r["honore_h"] == round(100 * math.log(3) * 2 / (2 - 1), 6)
    assert r["sichel_s"] == 0.5


def test_url_canonical_rules_pinned(spark, tmp_path):
    """doc_id 16: uppercase scheme (16%2=0), utm param (16%3=1),
    fragment (16%5=1), trailing slash (16%4=0) — ALL must normalize
    away; params re-sorted; host stays lowercase (16%3=1)."""
    sf = _plant_docs(spark, tmp_path, [(16, "t", "S"), (15, "t", "S")])
    out = {r["doc_id"]: r for r in all_queries()[
        "dedup_url_canonical"](spark, sf).collect()}
    r16 = out[16]
    assert r16["canonical_url"] == "https://cdn1.example.com/docs/S/6?ref=1&v=0"
    assert r16["had_utm"] and r16["had_fragment"] and not r16["had_port"]
    # doc 15: port :443 (15%5=0), odd -> swapped param order, no utm
    r15 = out[15]
    assert r15["canonical_url"] == "https://cdn0.example.com/docs/S/5?ref=0&v=1"
    assert r15["had_port"] and not r15["had_utm"] and not r15["had_fragment"]
    assert r16["cluster_size"] == 1 and r16["is_canonical"]


def test_slot_retention_laggard_math(spark, tmp_path):
    """tableA acked through rank ceil(0.9*10)=9 (lsn 9), tableB
    through lsn 109; confirmed_flush = 9; B's WAL is retained by A."""
    rows = [(i, i % 25, "A", 1.0, 1) for i in range(1, 11)]
    rows += [(i, i % 25, "B", 1.0, 1) for i in range(101, 111)]
    sf = _plant_events(spark, tmp_path, rows)
    out = {r["source_table"]: r for r in all_queries()[
        "cdc_slot_retention_lag"](spark, sf).collect()}
    assert out["A"]["acked_lsn"] == 9 and out["A"]["pending"] == 1
    assert out["B"]["acked_lsn"] == 109 and out["B"]["pending"] == 1
    assert out["A"]["confirmed_flush"] == 9
    assert out["A"]["is_laggard"] and not out["B"]["is_laggard"]
    assert out["A"]["retained_by_slot"] == 1   # its own id 10
    assert out["B"]["retained_by_slot"] == 10  # ALL of B pinned by A


def test_embedding_duplicate_audit_planted(spark, tmp_path):
    rows = [
        (1, [1.0, 2.0], 0),
        (2, [1.0, 2.0], 0),      # exact duplicate of vec 1
        (3, [1.0, 2.000001], 0),  # differs at the 1e-6 quantum: distinct
        (4, [9.0, 9.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r for r in all_queries()[
        "embedding_duplicate_audit"](spark, str(tmp_path)).collect()}
    assert out[0]["n_vecs"] == 3 and out[0]["n_distinct"] == 2
    assert out[0]["n_dup_vecs"] == 2 and out[0]["max_group"] == 2
    assert out[1]["n_dup_vecs"] == 0


def test_streaming_url_admission_matches_batch_d28(spark, sf_small, tmp_path):
    """I41: the same messy URLs (derived exactly as D28 synthesizes
    them) arrive in two doc_id-ordered micro-batches; the admitted
    set must equal batch D28's is_canonical winners (first arrival
    == min doc_id under ordered feeding), and every duplicate
    variant must be dropped ACROSS the batch boundary."""
    import time as _t

    from timescaledb_event_streamer_spark.plans.registry import all_queries
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_url_admission,
    )

    batch = all_queries()["dedup_url_canonical"](spark, sf_small)
    want = {
        (r["doc_id"], r["canonical_url"])
        for r in batch.filter("is_canonical").collect()
    }
    n_docs = batch.count()

    # rebuild the messy URLs the same way D28's synthesis does, by
    # round-tripping through the registered query's own input: plant
    # the urls via the documents table per-doc derivation
    from timescaledb_event_streamer_spark.sources.tables import load

    docs = load(spark, sf_small, "documents")
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, "HTTPS").otherwise("https")
    host = F.concat(
        F.when(d % 3 == 0, "CDN").otherwise("cdn"),
        (d % 5).cast("string"),
        F.when(d % 3 == 0, ".Example.COM").otherwise(".example.com"),
    )
    port = F.when(d % 5 == 0, ":443").otherwise("")
    path = F.concat(
        F.lit("/docs/"), F.col("source"), F.lit("/"), (d % 10).cast("string"),
        F.when(d % 4 == 0, "/").otherwise(""),
    )
    p_ref = F.concat(F.lit("ref="), (d % 3).cast("string"))
    p_v = F.concat(F.lit("v="), (d % 2).cast("string"))
    p_utm = F.when(d % 3 == 1, F.lit("utm_source=feed"))
    params = F.when(d % 2 == 1, F.concat_ws("&", p_v, p_ref, p_utm)).otherwise(
        F.concat_ws("&", p_ref, p_utm, p_v)
    )
    frag = F.when(
        d % 5 == 1, F.concat(F.lit("#sec"), (d % 4).cast("string"))
    ).otherwise("")
    messy = docs.select(
        "doc_id",
        F.concat(
            scheme, F.lit("://"), host, port, path, F.lit("?"), params, frag
        ).alias("url"),
    )
    mid = messy.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    log_dir = tmp_path / "url_log"
    log_dir.mkdir()
    messy.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(
        str(log_dir / "b0")
    )
    _t.sleep(1.1)
    messy.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(
        str(log_dir / "b1")
    )
    stream = (
        spark.readStream.schema(messy.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_url_admission(stream)
        .writeStream.format("memory")
        .queryName("url_admission")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["canonical_url"])
        for r in spark.sql("SELECT * FROM url_admission").collect()
    }
    assert got == want
    assert 0 < len(got) < n_docs  # duplicates were genuinely dropped


def test_coppock_and_rvi_flat_series(spark, tmp_path):
    """Constant price: every ROC is 0 -> Coppock 0; close==open and
    zero range -> RVI den-sum 0 -> NULL."""
    rows = [(i, i, "m", 42.0, 1) for i in range(28)]
    sf = _plant_events(spark, tmp_path, rows)
    cop = all_queries()["ts_coppock_curve"](spark, sf).collect()
    assert len(cop) > 0 and all(r["coppock"] == 0.0 for r in cop)
    rvi = all_queries()["ts_rvi"](spark, sf).collect()
    assert len(rvi) > 0 and all(r["rvi"] is None for r in rvi)


def test_rvi_rising_within_constant_range(spark, tmp_path):
    """Every day opens at the low and closes at the high: num == den
    -> RVI == 1 and signal == 1 once both windows fill."""
    rows = []
    for d in range(28):
        rows.append((2 * d, d, "m", 10.0, 1))      # open (first event)
        rows.append((2 * d + 1, d, "m", 20.0, 1))  # close (last) = high
    sf = _plant_events(spark, tmp_path, rows)
    out = all_queries()["ts_rvi"](spark, sf).collect()
    assert len(out) > 0
    for r in out:
        assert r["rvi"] == 1.0 and r["signal"] == 1.0


def test_mutual_knn_two_tight_clusters(spark, tmp_path):
    """Six vectors in two tight, well-separated label clusters with
    k=5: the 2 same-cluster neighbors of each vector are mutual, the
    3 cross-cluster fills are mutual too (k exceeds cluster size, so
    everyone lists everyone) -> mutual_rate == 1."""
    rows = []
    for i in range(3):
        rows.append((i, [1.0 + 0.001 * i, 0.0], 0))
        rows.append((10 + i, [0.0, 1.0 + 0.001 * i], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r for r in all_queries()[
        "ann_mutual_knn_audit"](spark, str(tmp_path)).collect()}
    for lbl in (0, 1):
        assert out[lbl]["n_nodes"] == 3
        assert out[lbl]["n_edges"] == 15  # 3 nodes x k=5
        assert out[lbl]["mutual_rate"] == 1.0
        assert out[lbl]["max_in_degree"] == 5  # everyone lists everyone


def test_temperature_mix_books_balance(spark, tmp_path):
    """alpha=1 reproduces proportional sampling exactly; lower alpha
    strictly lifts the SMALL source's weight; weights sum to 1."""
    big = " ".join(f"b{i}" for i in range(90))
    small = " ".join(f"s{i}" for i in range(10))
    sf = _plant_docs(spark, tmp_path, [(1, big, "big"), (2, small, "small")])
    out = {(r["alpha"], r["source"]): r for r in all_queries()[
        "corpus_temperature_mix"](spark, sf).collect()}
    assert out[(1.0, "big")]["weight"] == 0.9
    assert out[(1.0, "small")]["weight"] == 0.1
    w = [out[(a, "small")]["weight"] for a in (1.0, 0.7, 0.5, 0.3)]
    assert w == sorted(w)  # cooling the temperature lifts the tail
    for a in (0.3, 0.5, 0.7, 1.0):
        assert abs(out[(a, "big")]["weight"] + out[(a, "small")]["weight"] - 1.0) < 2e-6
    # effective epochs: small source oversampled under low alpha
    assert (out[(0.3, "small")]["effective_epochs"]
            > out[(1.0, "small")]["effective_epochs"])


def test_streaming_slot_monitor_matches_batch_a34(spark, sf_small, tmp_path):
    """I42: stream the sf_small events in two micro-batches, then an
    ack wave at exactly batch A34's modeled acked LSNs; the final
    per-table posture (head, acked, pending) must equal the batch
    report, and the derived confirmed_flush (min over tables) must
    match too."""
    import time as _t

    from timescaledb_event_streamer_spark.sources.tables import load
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_slot_monitor,
    )

    want = {r["source_table"]: r for r in all_queries()[
        "cdc_slot_retention_lag"](spark, sf_small).collect()}

    events = load(spark, sf_small, "events").select(
        F.col("event_type").alias("source_table"),
        F.col("event_id").alias("lsn"),
        F.lit(False).alias("is_ack"),
    )
    acks = spark.createDataFrame(
        [(t, int(want[t]["acked_lsn"]), True) for t in want],
        "source_table string, lsn long, is_ack boolean",
    )
    mid = events.agg(F.expr("percentile_approx(lsn, 0.5)")).first()[0]
    log_dir = tmp_path / "slot_log"
    log_dir.mkdir()
    events.filter(F.col("lsn") <= mid).coalesce(1).write.parquet(
        str(log_dir / "b0")
    )
    _t.sleep(1.1)
    events.filter(F.col("lsn") > mid).coalesce(1).write.parquet(
        str(log_dir / "b1")
    )
    _t.sleep(1.1)
    acks.coalesce(1).write.parquet(str(log_dir / "b2"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_slot_monitor(stream)
        .writeStream.format("memory")
        .queryName("slot_monitor")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM slot_monitor a WHERE seq = (SELECT max(seq) "
        "FROM slot_monitor b WHERE b.source_table = a.source_table)"
    ).collect()
    got = {r["source_table"]: r for r in rows}
    assert set(got) == set(want)
    for t, w in want.items():
        assert got[t]["head_lsn"] == w["head_lsn"], t
        assert got[t]["acked_lsn"] == w["acked_lsn"], t
        assert got[t]["pending"] == w["pending"], t
    flush = min(r["acked_lsn"] for r in got.values())
    assert flush == next(iter(want.values()))["confirmed_flush"]


def test_streaming_fisher_matches_batch_b122(spark, sf_small, tmp_path):
    """I43: daily midprice partials in two time-ordered micro-batches
    so the channel buffer AND both recursion carries cross a batch
    boundary; result must equal batch ts_fisher_transform
    row-for-row (same 6-decimal rounding)."""
    import time as _t

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_fisher_transform,
    )

    daily = _daily_ohlcv(spark, sf_small).select(
        "series", "day_s", (F.col("hc") + F.col("lc")).alias("mid2")
    )
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)")
    ).first()[0]
    log_dir = tmp_path / "fisher_log"
    log_dir.mkdir()
    daily.filter(F.col("day_s") <= split_day).coalesce(1).write.parquet(
        str(log_dir / "b0")
    )
    _t.sleep(1.1)
    daily.filter(F.col("day_s") > split_day).coalesce(1).write.parquet(
        str(log_dir / "b1")
    )
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_fisher_transform(stream)
        .writeStream.format("memory")
        .queryName("fisher_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (
            round(r["value1"] * 1e6), round(r["fisher"] * 1e6), r["bullish"]
        )
        for r in spark.sql("SELECT * FROM fisher_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (
            round(r["value1"] * 1e6), round(r["fisher"] * 1e6), r["bullish"]
        )
        for r in all_queries()["ts_fisher_transform"](
            spark, sf_small
        ).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_cascade_ledger_books_balance(spark, sf_small):
    """The funnel chains: n_out(i) == n_in(i+1), removals subtract,
    and the stage-3 removals agree with running semdedup on the
    minhash survivors (not on the full corpus)."""
    rows = {r["stage"]: r for r in all_queries()[
        "dedup_cascade_ledger"](spark, sf_small).collect()}
    assert set(rows) == {"1_exact", "2_near_minhash", "3_semantic"}
    for st in rows.values():
        assert st["n_in"] - st["n_removed"] == st["n_out"], st
    assert rows["1_exact"]["n_out"] == rows["2_near_minhash"]["n_in"]
    assert rows["2_near_minhash"]["n_out"] == rows["3_semantic"]["n_in"]
    # the cascade did real work at this SF
    assert rows["2_near_minhash"]["n_removed"] > 0
    assert rows["3_semantic"]["n_removed"] > 0
    # semdedup on a REDUCED candidate set must remove no more than
    # the full-corpus D30 run drops
    full_drops = all_queries()["dedup_semdedup"](spark, sf_small).filter(
        "NOT kept"
    ).count()
    assert rows["3_semantic"]["n_removed"] <= full_drops + 5


def test_mp3_probe_golden_and_hostile(spark):
    """Golden struct-packed MP3 built independently of the
    synthesizer, plus sync/table hostile cases."""
    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        parse_mp3_headers,
    )

    def probe(payload: bytes):
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, payload binary"
        )
        return parse_mp3_headers(df).collect()[0]

    # golden: tag size 130 = syncsafe [0,0,1,2]; bitrate index 11 =
    # 192kbps per the public V1L3 table, 44100, padding 1
    tag = b"ID3\x03\x00\x00" + bytes([0, 0, 1, 2]) + b"\x00" * 130
    frame = bytes([0xFF, 0xFB, (11 << 4) | (0 << 2) | 2, 0x00])
    r = probe(tag + frame + b"\x00" * 8)
    assert r.is_mp3 and r.tag_bytes == 130
    assert (r.mpeg_version, r.layer) == (1, 3)
    assert (r.bitrate_kbps, r.sample_rate) == (192, 44100)
    assert r.frame_bytes == 144000 * 192 // 44100 + 1

    # hostile: broken sync -> version/layer/bitrate null
    bad = tag + bytes([0x12, 0x34, 0xA2, 0x00]) + b"\x00" * 8
    rb = probe(bad)
    assert rb.is_mp3 and rb.mpeg_version is None and rb.bitrate_kbps is None

    # hostile: reserved bitrate index 15 -> rate fields null, sync ok
    res = tag + bytes([0xFF, 0xFB, (15 << 4) | 2, 0x00]) + b"\x00" * 8
    rr = probe(res)
    assert rr.layer == 3 and rr.bitrate_kbps is None

    # not mp3 at all
    rn = probe(b"\x89PNG" + b"\x00" * 30)
    assert rn.is_mp3 is False and rn.tag_bytes is None


def test_webm_probe_golden_and_hostile(spark):
    """Golden EBML bytes built independently with a pure-Python vint
    encoder, plus hostile vint/truncation cases."""
    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        parse_ebml_headers,
    )

    def vint(n: int, length: int) -> bytes:
        return (n | (1 << (7 * length))).to_bytes(length, "big")

    def el(eid: bytes, body: bytes, slen: int = 1) -> bytes:
        return eid + vint(len(body), slen) + body

    def probe(payload: bytes):
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, payload binary"
        )
        return parse_ebml_headers(df).collect()[0]

    header = el(
        bytes.fromhex("1A45DFA3"),
        el(bytes.fromhex("4286"), b"\x01") + el(bytes.fromhex("4282"), b"webm"),
    )
    video = el(
        b"\xae",
        el(b"\x83", b"\x01")
        + el(b"\x86", b"V_VP9")
        + el(
            b"\xe0",
            el(b"\xb0", (1920).to_bytes(2, "big"))
            + el(b"\xba", (1080).to_bytes(2, "big")),
        ),
    )
    info = el(
        bytes.fromhex("1549A966"),
        el(bytes.fromhex("2AD7B1"), (1_000_000).to_bytes(3, "big")),
    )
    tracks = el(bytes.fromhex("1654AE6B"), video)
    # 3-byte Segment size vint: deeper than anything synthesized
    segment = el(bytes.fromhex("18538067"), info + tracks, slen=3)
    r = probe(header + segment)
    assert r.is_ebml and r.doc_type == "webm"
    assert r.timecode_scale == 1_000_000
    assert (r.n_tracks, r.video_codec) == (1, "V_VP9")
    assert (r.width, r.height) == (1920, 1080)

    # hostile: zero first byte = invalid vint -> clean stop
    r0 = probe(bytes.fromhex("1A45DFA3") + b"\x84" + b"\x00" * 8)
    assert r0.is_ebml is True and r0.doc_type is None

    # truncated mid-element
    full = header + segment
    rt = probe(full[:20])
    assert rt.is_ebml is True

    # not EBML at all
    rn = probe(b"RIFF" + b"\x00" * 20)
    assert rn.is_ebml is False and rn.n_elements is None


def test_ebml_seam_matches_catalyst_fold_and_synth_bytes(spark, sf_small):
    """The r11 Arrow walk + in-task synth must be byte- and
    row-identical to the Catalyst column expression / interpreted
    fold they replace (the mp4_probe fusion pattern)."""
    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        _ebml_synth_one,
        _parse_ebml_headers_catalyst,
        ebml_probe_roundtrip,
        parse_ebml_headers,
        synthesize_ebml_headers,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    events = load(spark, sf_small, "events").limit(96)
    jvm = {
        r["media_id"]: bytes(r["payload"])
        for r in synthesize_ebml_headers(events).collect()
    }
    for r in events.select("event_id", "user_id").collect():
        assert _ebml_synth_one(int(r["event_id"]), int(r["user_id"])) == jvm[
            r["event_id"]
        ]
    want = sorted(
        map(tuple, _parse_ebml_headers_catalyst(
            synthesize_ebml_headers(events)).collect())
    )
    assert sorted(map(tuple, ebml_probe_roundtrip(events).collect())) == want
    assert sorted(
        map(tuple, parse_ebml_headers(synthesize_ebml_headers(events)).collect())
    ) == want


def test_ebml_seam_differential_fuzz_vs_catalyst(spark):
    """Hostile payloads (truncations, byte mutations, random tails)
    must produce the same rows as the Catalyst fold — or fail the row
    in both implementations (strict ANSI decode / conv overflow)."""
    import random

    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        _ebml_synth_one,
        _parse_ebml_headers_catalyst,
        parse_ebml_headers,
    )

    rng = random.Random(97)
    base = _ebml_synth_one(7, 3)
    payloads = []
    for _ in range(24):
        b = bytearray(base)
        k = rng.randrange(4)
        if k == 0:
            b = b[: rng.randrange(1, len(b))]
        elif k == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif k == 2:
            b = bytearray(bytes.fromhex("1A45DFA3")) + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(0, 60))
            )
        else:
            b = bytearray(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        payloads.append(bytes(b))
    n_match = n_both_raise = 0
    for i, p in enumerate(payloads):
        df = spark.createDataFrame([(i, p)], "media_id long, payload binary")
        try:
            cat, cat_err = sorted(
                map(tuple, _parse_ebml_headers_catalyst(df).collect())
            ), False
        except Exception:
            cat, cat_err = None, True
        try:
            new, new_err = sorted(
                map(tuple, parse_ebml_headers(df).collect())
            ), False
        except Exception:
            new, new_err = None, True
        assert cat_err == new_err, f"payload {p.hex()}: raise parity"
        if cat_err:
            n_both_raise += 1
        else:
            assert cat == new, f"payload {p.hex()}"
            n_match += 1
    assert n_match > 0
