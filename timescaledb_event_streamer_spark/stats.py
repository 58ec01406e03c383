"""Metrics export (H22) — the reference's stats service
(`internal/stats/stats.go`: segmentio/stats engine + Prometheus
scrape handler on a configurable port, enabled by default) as a
stdlib-only engine + Prometheus text exposition + HTTP scrape
endpoint.

The metric inventory mirrors the reference's tagged structs:

- `replicationchannel` calls: total / insert / updates / deletes /
  truncates / skipped / messages counters + statistics
  (transactions counter, largestTransaction gauge) —
  replicationhandler.go:40-53
- `eventemitter` emitted: count counter, runtime + retry summaries
  — eventemitter.go:49-55
- `snapshotter` scheduler/snapshots/records gauges —
  snapshotter.go:39-53

Spark wiring: `report_channel_batch` folds one (micro-)batch of
envelopes into the channel counters with a single tiny aggregate
(op-grain, never a per-row driver loop), so a foreachBatch hook
keeps the scrape endpoint live next to a streaming query. The
counters themselves are also available as certified QUERIES (A15
delivery stats, A22 channel stats) — this module is the push/scrape
side of the same numbers."""

from __future__ import annotations

import http.server
import threading

#: reference version.BinName — the engine prefix the Prometheus
#: handler trims; kept as the metric namespace here
PREFIX = "timescaledb_event_streamer"


class MetricsEngine:
    """Thread-safe counters / gauges / summaries keyed by
    (name, sorted tag tuple)."""

    def __init__(self, prefix: str = PREFIX) -> None:
        self.prefix = prefix
        self._lock = threading.Lock()
        self._counters: dict = {}
        self._gauges: dict = {}
        self._summaries: dict = {}

    @staticmethod
    def _key(name: str, tags: dict | None):
        return (name, tuple(sorted((tags or {}).items())))

    def incr(self, name: str, n: float = 1, tags: dict | None = None) -> None:
        k = self._key(name, tags)
        with self._lock:
            self._counters[k] = self._counters.get(k, 0) + n

    def set_gauge(self, name: str, value: float, tags: dict | None = None) -> None:
        with self._lock:
            self._gauges[self._key(name, tags)] = value

    def observe(self, name: str, value: float, tags: dict | None = None) -> None:
        """Summary: exposes _count and _sum (the useful core of the
        reference's histogram metrics without bucket config)."""
        k = self._key(name, tags)
        with self._lock:
            cnt, total = self._summaries.get(k, (0, 0.0))
            self._summaries[k] = (cnt + 1, total + value)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self._counters),
                "gauges": dict(self._gauges),
                "summaries": dict(self._summaries),
            }

    # -- Prometheus text exposition (v0.0.4) -------------------------
    @staticmethod
    def _fmt_tags(tags: tuple) -> str:
        if not tags:
            return ""
        inner = ",".join(
            f'{k}="{str(v).replace(chr(92), chr(92)*2).replace(chr(34), chr(92) + chr(34)).replace(chr(10), chr(92) + "n")}"'
            for k, v in tags
        )
        return "{" + inner + "}"

    def exposition(self) -> str:
        snap = self.snapshot()
        out: list[str] = []
        seen_types: set[str] = set()

        def emit(full: str, kind: str, tags: tuple, value) -> None:
            if full not in seen_types:
                out.append(f"# TYPE {full} {kind}")
                seen_types.add(full)
            out.append(f"{full}{self._fmt_tags(tags)} {value}")

        for (name, tags), v in sorted(snap["counters"].items()):
            emit(f"{self.prefix}_{name}", "counter", tags, v)
        for (name, tags), v in sorted(snap["gauges"].items()):
            emit(f"{self.prefix}_{name}", "gauge", tags, v)
        for (name, tags), (cnt, total) in sorted(snap["summaries"].items()):
            full = f"{self.prefix}_{name}"
            if full not in seen_types:
                out.append(f"# TYPE {full} summary")
                seen_types.add(full)
            out.append(f"{full}_count{self._fmt_tags(tags)} {cnt}")
            out.append(f"{full}_sum{self._fmt_tags(tags)} {total}")
        return "\n".join(out) + "\n"


class StatsService:
    """The scrape endpoint (stats.go: enabled by default, port
    configurable; port 0 binds ephemeral for tests). GET /metrics
    serves the engine's exposition; anything else is 404."""

    def __init__(
        self,
        engine: MetricsEngine,
        *,
        port: int = 8081,
        enabled: bool = True,
    ) -> None:
        self.engine = engine
        self.enabled = enabled
        self._port = port
        self._server: http.server.ThreadingHTTPServer | None = None

    @property
    def port(self) -> int | None:
        return self._server.server_address[1] if self._server else None

    def start(self) -> "StatsService":
        if not self.enabled or self._server is not None:
            return self
        engine = self.engine

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = engine.exposition().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self._server = http.server.ThreadingHTTPServer(
            ("127.0.0.1", self._port), Handler
        )
        threading.Thread(
            target=self._server.serve_forever, daemon=True
        ).start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


# -- the reference's channel-counter fold ----------------------------

#: envelope op -> the reference's counter name
#: (replicationhandler.go: insert/updates/deletes/truncates/messages)
_OP_COUNTER = {
    "c": "channel_calls_insert",
    "r": "channel_calls_insert",  # snapshot reads count as inserts
    "u": "channel_calls_updates",
    "d": "channel_calls_deletes",
    "t": "channel_calls_truncates",
    "m": "channel_calls_messages",
}


def report_channel_batch(engine: MetricsEngine, batch_df) -> None:
    """Fold one (micro-)batch of envelopes into the channel counters:
    ONE op-grain aggregate (at most 7 rows collected), never a
    per-row driver loop. Expects an `op` column; a `xid` column, if
    present, feeds the transactions counter and the
    largestTransaction gauge."""
    from pyspark.sql import functions as F

    cols = batch_df.columns
    for row in batch_df.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect():
        counter = _OP_COUNTER.get(row["op"])
        if counter:
            engine.incr(counter, row["n"])
        engine.incr("channel_calls_total", row["n"])
    if "xid" in cols:
        stats = (
            batch_df.filter(F.col("xid").isNotNull())
            .groupBy("xid")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).alias("txns"),
                F.max("n").alias("largest"),
            )
            .collect()[0]
        )
        if stats["txns"]:
            engine.incr("channel_statistics_transactions", stats["txns"])
            engine.set_gauge(
                "channel_statistics_largestTransaction", stats["largest"]
            )


def report_emitted(
    engine: MetricsEngine,
    n: int,
    runtime_s: float,
    *,
    sink: str,
    retries: int = 0,
) -> None:
    """The event-emitter side (eventemitter.go:49-55): per-sink
    emitted count + runtime/retry summaries — called by a delivery
    loop after each partition/batch lands."""
    tags = {"sink": sink}
    engine.incr("emitted_count", n, tags)
    engine.observe("emitted_runtime_seconds", runtime_s, tags)
    engine.observe("emitted_retry", retries, tags)


def metrics_reporting_sink(engine: MetricsEngine):
    """foreachBatch hook: keeps the scrape endpoint live next to a
    streaming query (`.foreachBatch(metrics_reporting_sink(engine))`)."""

    def hook(batch_df, _batch_id: int) -> None:
        report_channel_batch(engine, batch_df)

    return hook
