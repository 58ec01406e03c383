"""HTTP sink delivery loop (H15): end-to-end POSTs against a real
local HTTP server from executor-side foreachPartition, auth header
parity with the reference sink (http.go), and the non-2xx delivery
failure contract."""

from __future__ import annotations

import base64
import http.server
import json
import threading

import pytest

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sinks.http_delivery import (
    HttpDeliveryError,
    http_sink_batch,
    http_sink_headers,
    http_sink_stream,
    post_rows,
)


class _Recorder(http.server.BaseHTTPRequestHandler):
    status = 200

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        body = self.rfile.read(n)
        with self.server.lock:
            self.server.received.append(
                (self.path, dict(self.headers), body)
            )
        self.send_response(type(self).status)
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    srv.received, srv.lock = [], threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()
    _Recorder.status = 200


def test_headers_match_reference_assembly():
    h = http_sink_headers("basic", username="u", password="p")
    assert h["Authorization"] == "Basic " + base64.b64encode(b"u:p").decode()
    h2 = http_sink_headers("header", header_name="X-Token", header_value="t")
    assert h2["X-Token"] == "t"
    assert http_sink_headers("none") == {"Content-Type": "application/json"}
    with pytest.raises(ValueError, match="doesn't exist"):
        http_sink_headers("oauth2")


def test_batch_delivery_posts_every_envelope(spark, http_server):
    host, port = http_server.server_address
    url = f"http://{host}:{port}/hook"
    df = spark.range(20).select(
        F.col("id"),
        F.to_json(F.struct(F.col("id"), (F.col("id") * 2).alias("v"))).alias(
            "envelope"
        ),
    )
    http_sink_batch(
        df, url, http_sink_headers("basic", username="u", password="s3")
    )
    got = http_server.received
    assert len(got) == 20
    ids = sorted(json.loads(body)["id"] for _, _, body in got)
    assert ids == list(range(20))
    for path, headers, _ in got:
        assert path == "/hook"
        assert headers["Authorization"].startswith("Basic ")
        assert headers["Content-Type"] == "application/json"


def test_non_2xx_fails_the_delivery(spark, http_server):
    host, port = http_server.server_address
    url = f"http://{host}:{port}/hook"
    _Recorder.status = 503

    class Row:
        def __init__(self, d):
            self._d = d

        def asDict(self, recursive=False):
            return self._d

    with pytest.raises(HttpDeliveryError, match="503"):
        post_rows([Row({"envelope": "{}"})], url, http_sink_headers())


def test_streaming_delivery_replays_through_checkpoint(
    spark, http_server, tmp_path
):
    """availableNow streaming: every input row arrives at the webhook
    exactly once in the happy path (one batch, no retries)."""
    host, port = http_server.server_address
    url = f"http://{host}:{port}/s"
    src = tmp_path / "in"
    src.mkdir()
    spark.range(7).select(
        F.col("id"), F.to_json(F.struct("id")).alias("envelope")
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema("id LONG, envelope STRING")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        http_sink_stream(
            stream,
            url,
            headers=http_sink_headers("header", header_name="X-K", header_value="v"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = http_server.received
    assert len(got) == 7
    assert all(h["X-K"] == "v" for _, h, _ in got)
    ids = sorted(json.loads(b)["id"] for _, _, b in got)
    assert ids == list(range(7))
