"""Metrics export (H22): the engine's counter/gauge/summary
semantics, Prometheus text exposition, a LIVE scrape over HTTP, and
the Spark-side channel-counter fold matching the A22-certified
numbers on the same data."""

from __future__ import annotations

import urllib.request

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.stats import (
    MetricsEngine,
    StatsService,
    metrics_reporting_sink,
    report_channel_batch,
    report_emitted,
)


def test_engine_counter_gauge_summary_semantics():
    e = MetricsEngine()
    e.incr("channel_calls_total")
    e.incr("channel_calls_total", 4)
    e.set_gauge("lag", 2.5)
    e.set_gauge("lag", 1.5)  # gauges overwrite
    e.observe("emit_runtime", 0.25, {"sink": "kafka"})
    e.observe("emit_runtime", 0.75, {"sink": "kafka"})
    snap = e.snapshot()
    assert snap["counters"][("channel_calls_total", ())] == 5
    assert snap["gauges"][("lag", ())] == 1.5
    assert snap["summaries"][("emit_runtime", (("sink", "kafka"),))] == (
        2,
        1.0,
    )


def test_exposition_format():
    e = MetricsEngine()
    e.incr("calls_total", 3, {"table": "metrics"})
    e.set_gauge("largest", 7)
    e.observe("runtime", 0.5, {"sink": "nats"})
    text = e.exposition()
    assert "# TYPE timescaledb_event_streamer_calls_total counter" in text
    assert (
        'timescaledb_event_streamer_calls_total{table="metrics"} 3' in text
    )
    assert "# TYPE timescaledb_event_streamer_largest gauge" in text
    assert "timescaledb_event_streamer_largest 7" in text
    assert (
        'timescaledb_event_streamer_runtime_count{sink="nats"} 1' in text
    )
    assert 'timescaledb_event_streamer_runtime_sum{sink="nats"} 0.5' in text


def test_exposition_escapes_label_values():
    e = MetricsEngine()
    e.incr("c", 1, {"t": 'a"b\\c'})
    assert '{t="a\\"b\\\\c"}' in e.exposition()


def test_live_scrape_endpoint():
    e = MetricsEngine()
    e.incr("channel_calls_insert", 9)
    svc = StatsService(e, port=0).start()
    try:
        url = f"http://127.0.0.1:{svc.port}/metrics"
        with urllib.request.urlopen(url, timeout=10) as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            body = resp.read().decode()
        assert "timescaledb_event_streamer_channel_calls_insert 9" in body
        # a second scrape sees live updates
        e.incr("channel_calls_insert", 1)
        with urllib.request.urlopen(url, timeout=10) as resp:
            assert "channel_calls_insert 10" in resp.read().decode()
        # non-metrics paths 404
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{svc.port}/other", timeout=10
            )
            assert False, "expected 404"
        except urllib.error.HTTPError as err:
            assert err.code == 404
    finally:
        svc.stop()


def test_disabled_service_never_binds():
    svc = StatsService(MetricsEngine(), port=0, enabled=False).start()
    assert svc.port is None


def test_channel_batch_fold_matches_direct_counts(spark):
    """The op-grain fold equals a direct per-op count, and the txn
    stats match the A22 rule shape (txn count + largest)."""
    import urllib.error  # noqa: F401

    df = spark.createDataFrame(
        [
            ("c", 1), ("c", 1), ("u", 1), ("d", 2), ("m", 2),
            ("u", 2), ("c", 3), ("t", None),
        ],
        "op STRING, xid INT",
    )
    e = MetricsEngine()
    report_channel_batch(e, df)
    snap = e.snapshot()["counters"]
    assert snap[("channel_calls_total", ())] == 8
    assert snap[("channel_calls_insert", ())] == 3
    assert snap[("channel_calls_updates", ())] == 2
    assert snap[("channel_calls_deletes", ())] == 1
    assert snap[("channel_calls_truncates", ())] == 1
    assert snap[("channel_calls_messages", ())] == 1
    assert snap[("channel_statistics_transactions", ())] == 3
    assert (
        e.snapshot()["gauges"][
            ("channel_statistics_largestTransaction", ())
        ]
        == 3
    )


def test_foreachbatch_hook_accumulates_across_batches(spark):
    e = MetricsEngine()
    hook = metrics_reporting_sink(e)
    b1 = spark.createDataFrame([("c",), ("u",)], "op STRING")
    b2 = spark.createDataFrame([("d",), ("c",)], "op STRING")
    hook(b1, 0)
    hook(b2, 1)
    assert e.snapshot()["counters"][("channel_calls_total", ())] == 4
    assert e.snapshot()["counters"][("channel_calls_insert", ())] == 2


def test_report_emitted_per_sink_tags():
    e = MetricsEngine()
    report_emitted(e, 100, 0.8, sink="kafka", retries=2)
    report_emitted(e, 50, 0.3, sink="kafka")
    snap = e.snapshot()
    tags = (("sink", "kafka"),)
    assert snap["counters"][("emitted_count", tags)] == 150
    assert snap["summaries"][("emitted_runtime_seconds", tags)] == (2, 1.1)
    assert snap["summaries"][("emitted_retry", tags)] == (2, 2.0)


def test_metrics_scrape_live_next_to_a_streaming_query(spark, tmp_path):
    """H22 composition: a checkpointed availableNow stream feeds the
    channel counters through the foreachBatch hook while the scrape
    endpoint serves them over HTTP — the reference's stats service
    posture (engine fed by the pipeline, Prometheus scraped from
    outside)."""
    import urllib.request

    from timescaledb_event_streamer_spark.stats import StatsService

    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [("c", 1), ("u", 1), ("c", 2), ("d", 2), ("m", None), ("c", 3)],
        "op STRING, xid INT",
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    e = MetricsEngine()
    svc = StatsService(e, port=0).start()
    try:
        stream = (
            spark.readStream.schema("op STRING, xid INT")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(metrics_reporting_sink(e))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        url = f"http://127.0.0.1:{svc.port}/metrics"
        with urllib.request.urlopen(url, timeout=10) as resp:
            body = resp.read().decode()
        assert "timescaledb_event_streamer_channel_calls_total 6" in body
        assert "timescaledb_event_streamer_channel_calls_insert 3" in body
        assert (
            "timescaledb_event_streamer_channel_statistics_transactions 3"
            in body
        )
    finally:
        svc.stop()
