"""Streaming pipeline tests (SURVEY.md §2.H/I): file-stream source,
envelope routing, watermarked caggs, keyed state, idempotent upsert
sink — each checked against the equivalent batch computation."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from timescaledb_event_streamer_spark.catalog.tablefilter import TableFilter
from timescaledb_event_streamer_spark.sinks.writers import (
    foreach_batch_upsert,
    kafka_shaped,
    parquet_sink,
)
from timescaledb_event_streamer_spark.sources.streaming import (
    event_file_stream,
    rate_event_stream,
)
from timescaledb_event_streamer_spark.sources.tables import load
from timescaledb_event_streamer_spark.streaming.pipelines import (
    filtered_routed,
    latest_state_stream,
    streaming_cagg,
    streaming_envelope,
)


@pytest.fixture(scope="module")
def log_dir(spark, sf_small):
    """Transaction log: the events table split into 8 parquet batch
    files, in lsn order (the WAL hand-off directory)."""
    d = tempfile.mkdtemp(prefix="cdclog-")
    events = load(spark, sf_small, "events")
    events.withColumn("b", F.pmod(F.col("event_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name: str):
    q = df.writeStream.format("memory").queryName(name).outputMode(
        "update" if name.startswith("st_") else "append"
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    return q


def test_envelope_stream_matches_batch(spark, sf_small, log_dir):
    env = streaming_envelope(event_file_stream(spark, log_dir))
    _run_stream(env, "env_stream")
    got = spark.sql("SELECT count(*) n, count(DISTINCT topic) t FROM env_stream").first()
    events = load(spark, sf_small, "events")
    assert got["n"] == events.count()
    assert got["t"] == 5
    ops = {
        r["op"]
        for r in spark.sql("SELECT DISTINCT op FROM env_stream").collect()
    }
    assert ops == {"c", "u", "d"}


def test_filtered_routed_applies_table_filter(spark, log_dir):
    tf = TableFilter(includes=["public.click"], accepted_by_default=False)
    env = filtered_routed(event_file_stream(spark, log_dir), table_filter=tf)
    _run_stream(env, "env_filtered")
    tables = {
        r["source_table"]
        for r in spark.sql("SELECT DISTINCT source_table FROM env_filtered").collect()
    }
    assert tables == {"click"}


def test_streaming_cagg_matches_batch_agg(spark, sf_small, log_dir):
    cagg = streaming_cagg(event_file_stream(spark, log_dir), bucket="1 hour")
    q = cagg.writeStream.format("memory").queryName("cagg_stream").outputMode(
        "append"
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch aggregate exactly
    got = {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM cagg_stream").collect()
    }
    assert got, "watermark should have closed some windows"
    events = load(spark, sf_small, "events")
    batch = {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    for k, v in got.items():
        assert batch[k] == v, k


def test_latest_state_stream_matches_batch(spark, sf_small, log_dir):
    st = latest_state_stream(event_file_stream(spark, log_dir))
    _run_stream(st, "st_latest")
    # memory sink in update mode keeps all updates; last per key wins
    got = {
        (r["event_type"], r["user_id"]): r["last_lsn"]
        for r in spark.sql(
            """
            SELECT event_type, user_id, max(last_lsn) AS last_lsn
            FROM st_latest GROUP BY 1, 2
            """
        ).collect()
    }
    events = load(spark, sf_small, "events")
    batch = {
        (r["event_type"], r["user_id"]): r["last_lsn"]
        for r in events.groupBy("event_type", "user_id")
        .agg(F.max("event_id").alias("last_lsn"))
        .collect()
    }
    assert got == batch


def test_kafka_shaped_encoding(spark, sf_small):
    env = streaming_envelope(load(spark, sf_small, "events"))
    enc = kafka_shaped(env)
    assert set(enc.columns) == {"key", "value", "topic", "ts_ms"}
    row = enc.first()
    import json

    key = json.loads(bytes(row["key"]).decode())
    val = json.loads(bytes(row["value"]).decode())
    assert "key_user_id" in key
    assert val["op"] in ("c", "u", "d")
    assert row["topic"].startswith("timescaledb.public.")


def test_parquet_sink_is_exactly_once_per_checkpoint(spark, log_dir):
    out = tempfile.mkdtemp(prefix="sink-")
    ckpt = tempfile.mkdtemp(prefix="ckpt-")
    try:
        env = streaming_envelope(event_file_stream(spark, log_dir))
        q = parquet_sink(env, out, ckpt)
        q.awaitTermination(120)
        n1 = spark.read.parquet(out).count()
        # restart with same checkpoint: no new input -> no duplicates
        q2 = parquet_sink(streaming_envelope(event_file_stream(spark, log_dir)), out, ckpt)
        q2.awaitTermination(120)
        n2 = spark.read.parquet(out).count()
        assert n1 == n2 == 1000
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_foreach_batch_upsert_keeps_latest(spark, sf_small, log_dir):
    state = os.path.join(tempfile.mkdtemp(prefix="state-"), "latest")
    ckpt = tempfile.mkdtemp(prefix="ckpt-")
    try:
        env = streaming_envelope(event_file_stream(spark, log_dir))
        q = foreach_batch_upsert(
            env,
            state,
            keys=["source_table", "key_user_id"],
            order_col="lsn",
            checkpoint=ckpt,
        )
        q.awaitTermination(180)
        got = {
            (r["source_table"], r["key_user_id"]): r["lsn"]
            for r in spark.read.parquet(state).collect()
        }
        events = load(spark, sf_small, "events")
        batch = {
            (r["event_type"], r["user_id"]): r["m"]
            for r in events.groupBy("event_type", "user_id")
            .agg(F.max("event_id").alias("m"))
            .collect()
        }
        assert got == batch
    finally:
        shutil.rmtree(os.path.dirname(state), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_rate_source_produces_valid_events(spark):
    stream = rate_event_stream(spark, rows_per_second=500)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_events")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM rate_events").first()["c"]
            if n >= 100:
                break
            time.sleep(1)
        assert n >= 100, f"rate source produced only {n} rows"
        bad = spark.sql(
            """
            SELECT count(*) c FROM rate_events
            WHERE event_type NOT IN ('click','view','purchase','signup','error')
               OR user_id < 0 OR user_id >= 150 OR value < 0 OR value >= 50
            """
        ).first()["c"]
        assert bad == 0
    finally:
        q.stop()


def test_deduped_stream_absorbs_replayed_batches(spark, sf_small):
    """An at-least-once log (every batch delivered twice) must come
    out exactly-once after deduped_stream."""
    from timescaledb_event_streamer_spark.streaming.pipelines import deduped_stream

    d = tempfile.mkdtemp(prefix="cdclog-dup-")
    try:
        events = load(spark, sf_small, "events").limit(500)
        events.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "b1"))
        events.coalesce(1).write.mode("append").parquet(os.path.join(d, "b1"))  # replay
        stream = (
            spark.readStream.schema(load(spark, sf_small, "events").schema)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )
        env = streaming_envelope(stream)
        _run_stream(deduped_stream(env), "dedup_stream")
        got = spark.sql(
            "SELECT count(*) n, count(DISTINCT lsn) d FROM dedup_stream"
        ).first()
        assert got["n"] == got["d"] == 500
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_sessions_match_batch_sessionize(spark, sf_small, log_dir):
    """Native session_window on the stream must produce the same
    session count per user as the batch gap-based sessionization
    (strict-> gap comparator; sessions still open at end-of-stream
    are excluded — append mode only emits watermark-closed ones)."""
    from timescaledb_event_streamer_spark.streaming.pipelines import streaming_sessions

    stream = event_file_stream(spark, log_dir)
    _run_stream(streaming_sessions(stream), "sess_stream")
    got = {
        (r["user_id"], r["n"])
        for r in spark.sql(
            "SELECT user_id, count(*) n FROM sess_stream GROUP BY user_id"
        ).collect()
    }

    from pyspark.sql import Window

    events = load(spark, sf_small, "events")
    # sessions still OPEN at end-of-stream are not emitted in append
    # mode: a session closes once watermark (max ts - 1h) passes its
    # end + gap, so only sessions ending before this cutoff appear
    max_us = events.agg(F.max(F.unix_micros("ts"))).first()[0]
    cutoff_us = max_us - 3_600_000_000 - 1_800_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    batch = (
        events.withColumn("prev", F.lag(F.unix_micros("ts")).over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev").isNull()
                | (F.unix_micros("ts") - F.col("prev") > 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("is_new").over(ws))
        .groupBy("user_id", "sid")
        .agg(F.max(F.unix_micros("ts")).alias("end_us"))
        .filter(F.col("end_us") < cutoff_us)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["user_id"], r["n"]) for r in batch.collect()}
    assert got == want


def test_resolved_stream_matches_batch_resolution(spark, sf_small, log_dir):
    """Stream-static broadcast resolution must attach the same
    chunk/hypertable identity as the batch path."""
    from timescaledb_event_streamer_spark.catalog.chunks import chunk_catalog, resolve_chunks
    from timescaledb_event_streamer_spark.streaming.pipelines import resolved_stream

    events = load(spark, sf_small, "events")
    catalog = chunk_catalog(events).cache()
    stream = event_file_stream(spark, log_dir)
    _run_stream(resolved_stream(stream, catalog), "resolved")
    got = spark.sql(
        "SELECT chunk_name, count(*) n FROM resolved GROUP BY chunk_name"
    ).collect()
    want = {
        (r["chunk_name"], r["n"])
        for r in resolve_chunks(events, catalog)
        .groupBy("chunk_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r["chunk_name"], r["n"]) for r in got} == want


def test_stream_stream_attribution_matches_batch(spark, sf_small, log_dir):
    """I8: stream-stream event-time interval join (click->purchase
    attribution) over the replayed transaction log equals the batch
    interval join on the same data."""
    from timescaledb_event_streamer_spark.streaming.pipelines import attribution_stream

    q = _run_stream(
        attribution_stream(event_file_stream(spark, log_dir)), "attrib"
    )
    got = spark.table("attrib").toPandas()

    events = load(spark, sf_small, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_lsn"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_lsn"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want = (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("cu"))
            & (F.col("click_ts") < F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 30 minutes")
            ),
        )
        .select(
            "user_id",
            "purchase_lsn",
            "purchase_ts",
            "purchase_value",
            "click_lsn",
            "click_ts",
        )
        .toPandas()
    )
    assert len(got) == len(want) > 0
    key = ["purchase_lsn", "click_lsn"]
    got_s = got.sort_values(key, ignore_index=True)
    want_s = want.sort_values(key, ignore_index=True)
    assert got_s[key].equals(want_s[key])


def test_toast_backfill_stream_matches_batch(spark, sf_small):
    """Streaming TOAST reconstruction (keyed carried state) emits the
    same rebuilt after-images as the batch per-key LOCF window. The
    log is delivered in LSN-range order across micro-batches — the
    ordering WAL shipping guarantees."""
    from timescaledb_event_streamer_spark.plans.registry import all_queries
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        toast_backfill_stream,
    )

    events = load(spark, sf_small, "events")
    hi = events.agg(F.max("event_id")).first()[0] + 1
    d = tempfile.mkdtemp(prefix="toastlog-")
    try:
        # 4 sequential LSN-range files, written oldest-first so the
        # file source replays them in commit order
        for b in range(4):
            lo_b, hi_b = b * hi // 4, (b + 1) * hi // 4
            events.filter(
                (F.col("event_id") >= lo_b) & (F.col("event_id") < hi_b)
            ).coalesce(1).write.mode("append").parquet(d)

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q = (
            toast_backfill_stream(stream)
            .writeStream.format("memory")
            .queryName("toast_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        cols = ("source_table", "key_user_id", "lsn", "op",
                "after_value", "after_props", "was_toasted")
        streamed = {
            tuple(r[c] for c in cols)
            for r in spark.sql("SELECT * FROM toast_mem").collect()
        }
        batch = {
            tuple(r[c] for c in cols)
            for r in all_queries()["cdc_toast_backfill"](spark, sf_small).collect()
        }
        assert streamed == batch and len(batch) > 0
        # the toasted updates actually got values carried in
        assert any(r[6] and r[5] is not None for r in streamed)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_standby_status_stream_matches_batch(spark, sf_small):
    """The replication-posture fold (keepalive + XLogData ->
    per-slot standby status) is a plain streaming aggregation:
    complete-mode output over the same frame mix must equal the
    batch fold — the live form of the reference's 5-second status
    loop (replicationhandler.go:118-137)."""
    import tempfile
    import shutil

    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_standby_status,
        synthesize_copydata,
    )

    events = load(spark, sf_small, "events")
    frames = synthesize_copydata(events)
    d = tempfile.mkdtemp(prefix="copydata-")
    try:
        frames.write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(frames.schema).parquet(d)
        q = (
            parse_standby_status(stream)
            .writeStream.format("memory")
            .queryName("standby_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["slot"]: r
            for r in spark.sql("SELECT * FROM standby_stream").collect()
        }
        want = {r["slot"]: r for r in parse_standby_status(frames).collect()}
        assert set(got) == set(want)
        for slot in want:
            assert got[slot].asDict() == want[slot].asDict(), slot
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_downsample_minmax_stream_matches_batch(spark, sf_small, log_dir):
    """The min/max downsample is a pure associative aggregate, so it
    runs unchanged as a streaming (complete-mode) aggregation over
    the transaction-log stream and must equal the batch result."""
    from timescaledb_event_streamer_spark.functions.timeseries import (
        time_bucket_epoch,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    stream = spark.readStream.schema(load(spark, sf_small, "events").schema).parquet(
        log_dir
    )
    ts_ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    pt = F.struct(F.col("value"), ts_ms.alias("ts_ms"))
    agg = (
        stream.select(
            F.col("event_type").alias("series"),
            time_bucket_epoch(F.col("ts"), 6 * 3600).alias("bucket_s"),
            pt.alias("pt"),
        )
        .groupBy("series", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("pt").getField("value").alias("v_min"),
            F.min("pt").getField("ts_ms").alias("ts_min_ms"),
            F.max("pt").getField("value").alias("v_max"),
            F.max("pt").getField("ts_ms").alias("ts_max_ms"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mm_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["bucket_s"]): r
        for r in spark.sql("SELECT * FROM mm_stream").collect()
    }
    want = {
        (r["series"], r["bucket_s"]): r
        for r in all_queries()["ts_downsample_minmax"](spark, sf_small).collect()
    }
    assert set(got) == set(want) and len(want) > 0
    for k in want:
        assert got[k].asDict() == want[k].asDict(), k


def test_realtime_cagg_read_stream_matches_batch(spark, sf_small, log_dir):
    """I14: the real-time cagg read path (B50) in LIVE mode — the
    materialized partials are a static table, the raw tail runs as a
    complete-mode streaming aggregation over the transaction log, and
    the dashboard view is their union (disjoint bucket sets under the
    bucket-aligned watermark). Must equal the direct batch aggregate,
    and a late-arriving file past the watermark must surface on the
    next trigger WITHOUT touching the materialization."""
    import tempfile

    from timescaledb_event_streamer_spark.functions.cagg import cagg_partials

    HOUR = 3600
    events = load(spark, sf_small, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    # bucket-aligned mid-span watermark
    lo, hi = events.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    wm_s = (lo + (hi - lo) // 2) // HOUR * HOUR

    materialized = cagg_partials(
        events.filter(F.col("ts") < F.timestamp_seconds(F.lit(wm_s))),
        ["event_type"], HOUR, sum_col="cents",
    )

    stream = (
        spark.readStream.schema(load(spark, sf_small, "events").schema)
        .parquet(log_dir)
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .filter(F.col("ts") >= F.timestamp_seconds(F.lit(wm_s)))
    )
    tail_agg = cagg_partials(stream, ["event_type"], HOUR, sum_col="cents")
    q = (
        tail_agg.writeStream.format("memory")
        .queryName("rt_tail")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def read_view():
        tail = spark.sql("SELECT * FROM rt_tail")
        return {
            (r["event_type"], r["bucket_s"]): (r["n"], r["sum_value"])
            for r in materialized.unionByName(tail).collect()
        }

    direct = {
        (r["event_type"], r["bucket_s"]): (r["n"], r["sum_value"])
        for r in cagg_partials(events, ["event_type"], HOUR, sum_col="cents")
        .collect()
    }
    got = read_view()
    assert got == direct and len(direct) > 0

    # freshness: a late file lands in the log past the watermark —
    # the next trigger surfaces it, the materialization is untouched
    late_ts = hi + 7 * 24 * 3600
    spark.createDataFrame(
        [(10_000_000, "fresh_rt", 9.5)], "event_id long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(late_ts)).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        "value",
        F.lit("p").alias("props"),
    ).select(*load(spark, sf_small, "events").columns).write.mode("append").parquet(
        log_dir
    )
    q2 = (
        tail_agg.writeStream.format("memory")
        .queryName("rt_tail")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = read_view()
    fresh = [(k, v) for k, v in got2.items() if k[0] == "fresh_rt"]
    assert len(fresh) == 1 and fresh[0][1] == (1, 950)
    # everything else unchanged
    assert {k: v for k, v in got2.items() if k[0] != "fresh_rt"} == direct


def test_resolved_stream_matches_batch_resolution_2d(spark, sf_small, log_dir):
    """I15: the SPACE-partitioned (time x hash-slice) resolve on the
    live stream — stream-static broadcast join on all three chunk keys
    (A23's resolve_chunks_2d applied to the streaming hot path). Must
    attach the same 2-D chunk identity as the batch resolution."""
    from timescaledb_event_streamer_spark.catalog.chunks import (
        chunk_catalog_2d,
        resolve_chunks_2d,
    )

    events = load(spark, sf_small, "events")
    catalog = chunk_catalog_2d(events).cache()
    stream = event_file_stream(spark, log_dir)
    _run_stream(resolve_chunks_2d(stream, catalog), "resolved2d")
    got = {
        (r["chunk_name"], r["n"])
        for r in spark.sql(
            "SELECT chunk_name, count(*) n FROM resolved2d GROUP BY chunk_name"
        ).collect()
    }
    want = {
        (r["chunk_name"], r["n"])
        for r in resolve_chunks_2d(events, catalog)
        .groupBy("chunk_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and want


def test_bloom_probe_stream_matches_batch(spark, sf_small):
    """I16: benchmark decontamination as an ingest-time gate — the
    64 Kbit Bloom bitmap (F22) is a static broadcast side, documents
    arrive as a stream, and the per-doc contamination fold runs
    complete-mode. Must equal the batch probe exactly (the filter is
    deterministic, so even the false positives agree)."""
    import shutil
    import tempfile

    from timescaledb_event_streamer_spark.plans.queries_llm3 import (
        bloom_bitmap,
        bloom_probe,
    )

    docs = load(spark, sf_small, "documents")
    bloom = bloom_bitmap(docs.filter(F.col("doc_id") % 100 == 0))
    corpus = docs.filter(F.col("doc_id") % 100 != 0)
    d = tempfile.mkdtemp(prefix="docstream-")
    try:
        corpus.withColumn("b", F.pmod(F.col("doc_id"), F.lit(4))).repartition(
            4, "b"
        ).drop("b").write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(docs.schema).parquet(d)
        q = (
            bloom_probe(stream, bloom)
            .writeStream.format("memory")
            .queryName("bloom_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r
            for r in spark.sql("SELECT * FROM bloom_stream").collect()
        }
        want = {r["doc_id"]: r for r in bloom_probe(corpus, bloom).collect()}
        assert set(got) == set(want) and len(want) > 0
        for k in want:
            assert got[k].asDict() == want[k].asDict(), k
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hist2d_stream_matches_batch(spark, sf_small):
    """I17: the 2-D heatmap (B57) is a pure associative aggregate, so
    it runs unchanged as a complete-mode streaming aggregation over
    the transaction-log stream and must equal the batch cells — the
    live-dashboard heatmap path. Uses its OWN log copy: the shared
    log_dir fixture accumulates the late files other tests inject."""
    import shutil
    import tempfile

    from timescaledb_event_streamer_spark.functions.timeseries import (
        time_bucket_epoch,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    events = load(spark, sf_small, "events")
    own_log = tempfile.mkdtemp(prefix="histlog-")
    events.withColumn("b", F.pmod(F.col("event_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(own_log)
    stream = spark.readStream.schema(events.schema).parquet(own_log)
    agg = (
        stream.select(
            F.col("event_type").alias("series"),
            time_bucket_epoch(F.col("ts"), 86400).alias("bucket_s"),
            F.floor(F.col("value") / 10).cast("long").alias("v_bin"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("series", "bucket_s", "v_bin")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hist2d_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["bucket_s"], r["v_bin"]): r
        for r in spark.sql("SELECT * FROM hist2d_stream").collect()
    }
    try:
        want = {
            (r["series"], r["bucket_s"], r["v_bin"]): r
            for r in all_queries()["ts_hist2d"](spark, sf_small).collect()
        }
        assert set(got) == set(want) and len(want) > 0
        for k in want:
            assert got[k].asDict() == want[k].asDict(), k
    finally:
        shutil.rmtree(own_log, ignore_errors=True)


def test_sketch_partials_stream_match_batch(spark, sf_small):
    """I19/I20: both round-5 sketch partial tables — HDR percentile
    bucket counts (B59) and HLL registers (B60) — are associative
    aggregates (count-sum / max), so they run unchanged as
    complete-mode streaming aggregations over the transaction-log
    stream and must equal the batch partials cell-for-cell. That is
    the live path: a streaming job maintains the sketch, dashboards
    read percentile/cardinality estimates from sketch-grain state
    without rescanning history."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        hdr_buckets,
        hll_registers,
    )

    events = load(spark, sf_small, "events")
    own_log = tempfile.mkdtemp(prefix="sketchlog-")
    events.withColumn("b", F.pmod(F.col("event_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(own_log)
    stream = spark.readStream.schema(events.schema).parquet(own_log)
    try:
        for name, builder, key in [
            ("hdr_stream", hdr_buckets, ("event_type", "bucket_id")),
            ("hll_stream", hll_registers, ("event_type", "idx")),
        ]:
            q = (
                builder(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            got = {
                tuple(r[k] for k in key): r.asDict()
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
            want = {
                tuple(r[k] for k in key): r.asDict()
                for r in builder(events).collect()
            }
            assert got == want and len(want) > 0, name
    finally:
        shutil.rmtree(own_log, ignore_errors=True)


def test_streaming_incremental_snapshot_window_state(spark, sf_small):
    """I21: the DBLog merge's window-hit state (latest CDC event per
    key inside its chunk's watermark window) is an associative
    max/max_by aggregate, so it runs unchanged as a complete-mode
    streaming aggregation over the transaction-log stream and must
    equal the batch state cell-for-cell; joining that live state
    against the static snapshot reproduces the registered batch
    operator exactly — the live path of cdc_incremental_snapshot."""
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        _SNAP_KEYS_PER_CHUNK,
        _SNAP_WINDOW_LSNS,
        cdc_incremental_snapshot,
        latest_per_key,
    )

    events = load(spark, sf_small, "events")
    snap_lsn = events.agg(F.max("event_id")).collect()[0][0] // 2
    chunk = (F.col("user_id") / _SNAP_KEYS_PER_CHUNK).cast("long")
    low = F.lit(snap_lsn) + chunk * _SNAP_WINDOW_LSNS
    high = F.lit(snap_lsn) + (chunk + 1) * _SNAP_WINDOW_LSNS

    def in_window(df):
        return df.filter((F.col("event_id") > low) & (F.col("event_id") <= high))

    own_log = tempfile.mkdtemp(prefix="dbloglog-")
    events.withColumn("b", F.pmod(F.col("event_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(own_log)
    stream = spark.readStream.schema(events.schema).parquet(own_log)
    try:
        q = (
            latest_per_key(in_window(stream))
            .writeStream.format("memory")
            .queryName("dblog_window_state")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        live = spark.sql("SELECT * FROM dblog_window_state")
        got = {r["user_id"]: r.asDict() for r in live.collect()}
        want = {
            r["user_id"]: r.asDict()
            for r in latest_per_key(in_window(events)).collect()
        }
        assert got == want and len(want) > 0

        # composed read: static snapshot LEFT JOIN live state == the
        # registered batch operator, row for row
        snap = latest_per_key(
            events.filter(F.col("event_id") <= snap_lsn)
            .withColumn("chunk_idx", chunk)
            .withColumn("low_lsn", low)
            .withColumn("high_lsn", high),
            extra_keys=("chunk_idx", "low_lsn", "high_lsn"),
        ).withColumnsRenamed(
            {"state_event_id": "snap_event_id", "state_value": "snap_value"}
        )
        cdc = live.withColumnsRenamed(
            {"state_event_id": "cdc_event_id", "state_value": "cdc_value"}
        )
        merged = snap.join(cdc, "user_id", "left").select(
            "user_id",
            "chunk_idx",
            "low_lsn",
            "high_lsn",
            F.when(F.col("cdc_event_id").isNull(), F.lit("snapshot"))
            .otherwise(F.lit("cdc"))
            .alias("source"),
            F.coalesce("cdc_event_id", "snap_event_id").alias("state_event_id"),
            F.round(F.coalesce("cdc_value", "snap_value"), 2).alias("state_value"),
        )
        got_m = {r["user_id"]: r.asDict() for r in merged.collect()}
        want_m = {
            r["user_id"]: r.asDict()
            for r in cdc_incremental_snapshot(spark, sf_small).collect()
        }
        assert got_m == want_m and len(want_m) > 0
    finally:
        shutil.rmtree(own_log, ignore_errors=True)


def test_streaming_asof_join_parity_and_state_carry(spark, sf_small, tmp_path):
    """I22: the stateful streaming as-of (merge_asof per key-batch +
    carried right-side state) equals the batch tolerance as-of
    row-for-row in a single batch, and a purchase seen in batch 1
    matches clicks arriving in batch 2 purely out of STATE."""
    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        _ASOF_TOL_S,
        ts_asof_tolerance,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        asof_join_stream,
    )

    events = load(spark, sf_small, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "value", F.col("user_id"), F.lit(0).alias("side")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select(F.lit(-1).alias("event_id"), "ts", "value", "user_id",
                F.lit(1).alias("side"))
    )
    tagged = clicks.unionByName(purchases)
    log1 = tempfile.mkdtemp(prefix="asoflog-")
    tagged.repartition(4).write.mode("overwrite").parquet(log1)
    stream = spark.readStream.schema(tagged.schema).parquet(log1)
    q = (
        asof_join_stream(stream, _ASOF_TOL_S)
        .writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["match_age_s"], r["purchase_value_fresh"], r["match_status"])
        for r in spark.sql("SELECT * FROM asof_stream").collect()
    }
    want = {
        r["event_id"]: (r["match_age_s"], r["purchase_value_fresh"], r["match_status"])
        for r in ts_asof_tolerance(spark, sf_small).collect()
    }
    assert got == want and len(want) > 0
    shutil.rmtree(log1, ignore_errors=True)

    # cross-batch carry: purchase in file 0, clicks in file 1
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1)
    log2 = tempfile.mkdtemp(prefix="asofcarry-")
    f1 = spark.createDataFrame(
        [(-1, t0, 10.0, 7, 1)],
        "event_id long, ts timestamp, value double, user_id long, side int",
    )
    f2 = spark.createDataFrame(
        [
            (100, t0 + dt.timedelta(minutes=5), 1.0, 7, 0),
            (101, t0 + dt.timedelta(seconds=_ASOF_TOL_S + 60), 2.0, 7, 0),
        ],
        "event_id long, ts timestamp, value double, user_id long, side int",
    )
    f1.coalesce(1).write.parquet(f"{log2}/batch=0")
    f2.coalesce(1).write.parquet(f"{log2}/batch=1")
    stream2 = (
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{log2}/batch=*")
    )
    q2 = (
        asof_join_stream(stream2, _ASOF_TOL_S)
        .writeStream.format("memory")
        .queryName("asof_carry")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    out = {
        r["event_id"]: r for r in spark.sql("SELECT * FROM asof_carry").collect()
    }
    assert out[100]["match_status"] == "fresh"
    assert out[100]["purchase_value_fresh"] == 10.0
    assert out[100]["match_age_s"] == 300
    assert out[101]["match_status"] == "stale"  # carried state, too old
    assert out[101]["match_age_s"] == _ASOF_TOL_S + 60
    shutil.rmtree(log2, ignore_errors=True)


def test_streaming_asof_random_series_three_batches(spark, tmp_path):
    """Randomized contract check: 300 seeded-random events over 12
    users, cut into three event-time-ordered batch files; the
    streaming as-of must equal the batch tolerance as-of row-for-row
    regardless of where the batch cuts land."""
    import datetime as dt
    import random

    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        _ASOF_TOL_S,
        ts_asof_tolerance,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        asof_join_stream,
    )

    rng = random.Random(42)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for eid in range(300):
        rows.append(
            (
                eid,
                t0 + dt.timedelta(seconds=rng.randint(0, 6 * _ASOF_TOL_S)),
                rng.randint(0, 11),
                rng.choice(["click", "purchase", "view"]),
                round(rng.uniform(0.5, 150.0), 2),
                "p",
            )
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = f"{tmp_path}/sf"
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    want = {
        r["event_id"]: (r["match_age_s"], r["purchase_value_fresh"], r["match_status"])
        for r in ts_asof_tolerance(spark, sf).collect()
    }

    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "value", "user_id", F.lit(0).alias("side")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select(F.lit(-1).alias("event_id"), "ts", "value", "user_id",
                F.lit(1).alias("side"))
    )
    tagged = clicks.unionByName(purchases).orderBy("ts").collect()
    cuts = [len(tagged) // 3, 2 * len(tagged) // 3, len(tagged)]
    log = f"{tmp_path}/log"
    start = 0
    for bi, end in enumerate(cuts):
        spark.createDataFrame(
            tagged[start:end],
            "event_id long, ts timestamp, value double, user_id long, side int",
        ).coalesce(1).write.parquet(f"{log}/batch={bi}")
        start = end
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, value double, user_id long, side int"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{log}/batch=*")
    )
    q = (
        asof_join_stream(stream, _ASOF_TOL_S)
        .writeStream.format("memory")
        .queryName("asof_rand")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["match_age_s"], r["purchase_value_fresh"], r["match_status"])
        for r in spark.sql("SELECT * FROM asof_rand").collect()
    }
    assert got == want and len(want) > 0


def test_streaming_asof_subsecond_tolerance_and_duplicate_ts(spark, tmp_path):
    """Two streaming==batch parity edges invisible to whole-second
    fixtures: (1) a match aged in (tol, tol+1s) must be STALE — the
    stream must compare the raw timedelta, not the floored whole-second
    age; (2) duplicate-ts purchases arriving unaggregated inside one
    micro-batch must collapse to max(value), the batch tie contract,
    not whichever row sorted last."""
    import datetime as dt

    from timescaledb_event_streamer_spark.plans.queries_timeseries4 import (
        ts_asof_tolerance,
    )
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        asof_join_stream,
    )

    tol_s = 60
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        # user 1: purchase at t0, duplicate-ts purchase with lower value
        (200, t0, 1, "purchase", 10.0, "p"),
        (201, t0, 1, "purchase", 3.0, "p"),
        # click aged tol + 0.4s -> floored age == tol but STALE
        (202, t0 + dt.timedelta(seconds=tol_s, microseconds=400_000),
         1, "click", 1.0, "p"),
        # click aged exactly tol -> fresh, value must be max(10.0, 3.0)
        (203, t0 + dt.timedelta(seconds=tol_s), 1, "click", 2.0, "p"),
        # user 2: sub-second fresh match
        (210, t0, 2, "purchase", 7.0, "p"),
        (211, t0 + dt.timedelta(microseconds=250_000), 2, "click", 4.0, "p"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = f"{tmp_path}/sf"
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    import timescaledb_event_streamer_spark.plans.queries_timeseries4 as qt4

    saved = qt4._ASOF_TOL_S
    qt4._ASOF_TOL_S = tol_s
    try:
        want = {
            r["event_id"]: (
                r["match_age_s"], r["purchase_value_fresh"], r["match_status"]
            )
            for r in ts_asof_tolerance(spark, sf).collect()
        }
    finally:
        qt4._ASOF_TOL_S = saved
    assert want[202] == (tol_s, None, "stale")
    assert want[203] == (tol_s, 10.0, "fresh")
    assert want[211] == (0, 7.0, "fresh")

    # stream the RAW rows (purchases NOT pre-aggregated) in one batch
    tagged = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "value", "user_id", F.lit(0).alias("side")
    ).unionByName(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "ts", "value", "user_id", F.lit(1).alias("side")
        )
    )
    log = f"{tmp_path}/log"
    tagged.coalesce(1).write.parquet(log)
    stream = spark.readStream.schema(tagged.schema).parquet(log)
    q = (
        asof_join_stream(stream, tol_s)
        .writeStream.format("memory")
        .queryName("asof_subsec")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (
            r["match_age_s"], r["purchase_value_fresh"], r["match_status"]
        )
        for r in spark.sql("SELECT * FROM asof_subsec").collect()
    }
    assert got == want


def test_streaming_covariance_matches_batch(spark, sf_small):
    """I23: the covariance partial-sum table (E18) is all associative
    count/sum aggregates over integer-quantized values, so it runs
    unchanged as a complete-mode streaming aggregation over a vector
    stream and must equal the batch partials cell-for-cell — the live
    form: a streaming job maintains the matrix as embeddings arrive,
    and whitening/PCA reads it without rescanning the corpus."""
    from timescaledb_event_streamer_spark.plans.queries_round6 import (
        covariance_from_sums,
        covariance_sums,
    )

    emb = load(spark, sf_small, "embeddings")
    own_log = tempfile.mkdtemp(prefix="covlog-")
    emb.withColumn("b", F.pmod(F.col("vec_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(own_log)
    stream = spark.readStream.schema(emb.schema).parquet(own_log)
    try:
        q = (
            covariance_sums(stream)
            .writeStream.format("memory")
            .queryName("cov_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["i"], r["j"]): r.asDict()
            for r in spark.sql("SELECT * FROM cov_stream").collect()
        }
        want = {
            (r["i"], r["j"]): r.asDict() for r in covariance_sums(emb).collect()
        }
        # 2080 upper-triangle product cells + 64 (i, -1) plain-sum rows
        assert got == want and len(want) == 64 * 65 // 2 + 64
        # and the projection over the streamed sums equals the batch query
        proj = {
            (r["dim_i"], r["dim_j"]): r.asDict()
            for r in covariance_from_sums(
                spark.sql("SELECT * FROM cov_stream")
            ).collect()
        }
        batch = {
            (r["dim_i"], r["dim_j"]): r.asDict()
            for r in covariance_from_sums(covariance_sums(emb)).collect()
        }
        assert proj == batch
    finally:
        shutil.rmtree(own_log, ignore_errors=True)


def test_streaming_empty_txn_ack_state(spark, sf_small):
    """I24: the per-transaction ack state (A29 — counts, commit LSN,
    last emitted LSN) is all-associative, so it runs unchanged as a
    complete-mode streaming aggregation over the transaction log;
    the live form is exactly how the handler keeps acknowledging
    filtered-out transactions so confirmed_flush never stalls."""
    from timescaledb_event_streamer_spark.plans.queries_cdc3 import (
        ack_txn_table,
    )

    events = load(spark, sf_small, "events")
    own_log = tempfile.mkdtemp(prefix="acklog-")
    events.withColumn("b", F.pmod(F.col("event_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(own_log)
    stream = spark.readStream.schema(events.schema).parquet(own_log)
    try:
        q = (
            ack_txn_table(stream)
            .writeStream.format("memory")
            .queryName("ack_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["xid"]: r.asDict()
            for r in spark.sql("SELECT * FROM ack_stream").collect()
        }
        want = {r["xid"]: r.asDict() for r in ack_txn_table(events).collect()}
        assert got == want and len(want) > 0
        # the live state really contains fully-filtered transactions
        assert any(r["n_emitted"] == 0 for r in want.values())
    finally:
        shutil.rmtree(own_log, ignore_errors=True)


def test_streaming_cms_registers_match_batch(spark, sf_small):
    """I25: the count-min register table (B78) is one associative
    COUNT aggregate over md5-derived register addresses, so the SAME
    expression maintains live frequency registers as a complete-mode
    streaming aggregation — register-for-register equal to the batch
    table, which is the property that lets a streaming job serve
    approx_count point queries while events arrive."""
    from timescaledb_event_streamer_spark.plans.queries_round7 import (
        cms_registers,
    )

    events = load(spark, sf_small, "events")
    own_log = tempfile.mkdtemp(prefix="cmslog-")
    events.withColumn("b", F.pmod(F.col("event_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(own_log)
    stream = spark.readStream.schema(events.schema).parquet(own_log)
    q = (
        cms_registers(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["j"], r["idx"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    want = {
        (r["event_type"], r["j"], r["idx"]): r["cnt"]
        for r in cms_registers(events).collect()
    }
    assert got == want and len(want) > 0
    # register mass conserves: every event lands in exactly d rows
    n_events = events.count()
    from timescaledb_event_streamer_spark.plans.queries_round7 import _CMS_D

    assert sum(got.values()) == n_events * _CMS_D


def test_streaming_candlestick_partials_match_batch(spark, sf_small):
    """I27: B79's daily candle partials are all associative
    (min_by/max_by on LSN keys, max/min/sum), so the identical
    grouping maintains live daily candles as a complete-mode
    streaming aggregation — partial-for-partial equal to batch,
    which is what lets the weekly rollup read a continuously-
    maintained table instead of rescanning trades."""
    events = load(spark, sf_small, "events")
    own_log = tempfile.mkdtemp(prefix="candlelog-")
    events.withColumn("b", F.pmod(F.col("event_id"), F.lit(8))).repartition(
        8, "b"
    ).drop("b").write.mode("overwrite").parquet(own_log)
    stream = spark.readStream.schema(events.schema).parquet(own_log)

    def daily(df):
        es = F.expr("unix_micros(ts) div 1000000")
        vol = F.get_json_object("props", "$.k").cast("long")
        cents = F.round(F.col("value") * 100, 0).cast("long")
        return (
            df.withColumn("_es", es)
            .groupBy(
                F.col("event_type").alias("series"),
                (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias(
                    "day_s"
                ),
            )
            .agg(
                F.min("event_id").alias("open_key"),
                F.min_by("value", "event_id").alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max("event_id").alias("close_key"),
                F.max_by("value", "event_id").alias("close"),
                F.count(F.lit(1)).alias("n_trades"),
                F.sum(vol).alias("volume"),
                F.sum(cents * vol).alias("turnover_cents"),
            )
        )

    q = (
        daily(stream)
        .writeStream.format("memory")
        .queryName("candle_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): r.asDict()
        for r in spark.sql("SELECT * FROM candle_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): r.asDict() for r in daily(events).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_heikin_ashi_matches_batch(spark, sf_small, tmp_path):
    """I28: Heikin-Ashi is sequential per key (day d needs day d-1's
    OUTPUT), so it streams as keyed applyInPandasWithState, not as an
    aggregation. Day partials are fed in TWO time-ordered micro-
    batches (maxFilesPerTrigger=1) so the recursion state must
    genuinely cross a batch boundary; the result must equal the
    batch ts_heikin_ashi query row-for-row."""
    from timescaledb_event_streamer_spark.plans.registry import all_queries
    from timescaledb_event_streamer_spark.streaming.pipelines import (
        streaming_heikin_ashi,
    )

    events = load(spark, sf_small, "events")
    daily = (
        events.withColumn("_es", F.expr("unix_micros(ts) div 1000000"))
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias("day_s"),
        )
        .agg(
            F.min_by("value", "event_id").alias("o"),
            F.max("value").alias("h"),
            F.min("value").alias("l"),
            F.max_by("value", "event_id").alias("c"),
        )
    )
    split_day = daily.agg(
        F.expr("percentile_approx(day_s, 0.5)").alias("m")
    ).first()["m"]
    log_dir = tmp_path / "ha_log"
    log_dir.mkdir()
    # file order = modification order = batch order under
    # maxFilesPerTrigger=1; early days land first
    daily.filter(F.col("day_s") <= split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b0"))
    import time as _t

    _t.sleep(1.1)  # distinct mtimes so file order is deterministic
    daily.filter(F.col("day_s") > split_day).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(log_dir / "b1"))
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(log_dir))
    )
    q = (
        streaming_heikin_ashi(stream)
        .writeStream.format("memory")
        .queryName("ha_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["day_s"]): (
            r["ha_open"], r["ha_close"], r["ha_high"], r["ha_low"],
            r["bullish"],
        )
        for r in spark.sql("SELECT * FROM ha_stream").collect()
    }
    want = {
        (r["series"], r["day_s"]): (
            r["ha_open"], r["ha_close"], r["ha_high"], r["ha_low"],
            r["bullish"],
        )
        for r in all_queries()["ts_heikin_ashi"](spark, sf_small).collect()
    }
    assert len(got) == len(want) > 0
    for k, g in got.items():
        w = want[k]
        assert g[4] == w[4], k
        # the query output is scale-0-rounded; the raw streamed floats
        # may sit a half-ulp across a rounding tie (Python banker's vs
        # Spark HALF_UP), so compare at the rounding grain
        for gv, wv in zip(g[:4], w[:4]):
            assert abs(gv - wv) <= 1e-6, (k, g, w)


def test_heikin_ashi_state_fn_sorts_across_chunks():
    """Regression (r7 advice): when one key's micro-batch spans
    multiple Arrow chunks, an EARLIER day arriving in a LATER chunk
    must not be dropped by the replay guard — the fold has to
    concatenate all chunks and sort once before recursing."""
    import pandas as pd

    from timescaledb_event_streamer_spark.streaming.pipelines import (
        _heikin_ashi_state_fn,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    def day(d, o, h, l, c):  # noqa: E741
        return {"series": "s", "day_s": d, "o": o, "h": h, "l": l, "c": c}

    # chunk 1 carries days {2}, chunk 2 carries day {1}: per-chunk
    # sorting would emit day 2 first and then drop day 1 entirely
    chunks = iter(
        [
            pd.DataFrame([day(2, 2.0, 3.0, 1.0, 2.5)]),
            pd.DataFrame([day(1, 1.0, 2.0, 0.5, 1.5)]),
        ]
    )
    state = FakeState()
    (out,) = list(_heikin_ashi_state_fn(("s",), chunks, state))
    assert list(out["day_s"]) == [1, 2]
    # day 1 seeds the recursion: ha_open = (o+c)/2 of day 1
    assert out.iloc[0]["ha_open"] == (1.0 + 1.5) / 2
    # day 2 chains off day 1's OUTPUT, not its raw candle
    ho1, hc1 = out.iloc[0]["ha_open"], out.iloc[0]["ha_close"]
    assert out.iloc[1]["ha_open"] == (ho1 + hc1) / 2
    assert state.value[0] == 2
