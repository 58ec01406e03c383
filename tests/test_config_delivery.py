"""Config-driven sink DELIVERY (r9): `PipelineAssembly.deliver_batch`
reads the reference's exact property names (spi/config/constants.go)
and drives the matching real delivery loop — proven end-to-end from
a TOML config through build -> filter -> shape -> deliver against
local protocol-shaped servers."""

from __future__ import annotations

import http.server
import json
import threading

from tests.test_config import _assembly
from tests.test_kafka_sink import _BrokerHandler, _QuietBroker
from timescaledb_event_streamer_spark.sources.tables import load


def test_kafka_config_delivery_end_to_end(spark, sf_small, tmp_path):
    srv = _QuietBroker(("127.0.0.1", 0), _BrokerHandler)
    srv.logs, srv.requests = {}, []
    srv.fail_first = 0
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        asm = _assembly(tmp_path, sink="kafka")
        asm.config.raw.setdefault("sink", {}).setdefault("kafka", {})[
            "brokers"
        ] = [f"{host}:{port}"]
        env = asm.build(load(spark, sf_small, "events")).limit(40)
        shaped = asm.shape(env)
        asm.deliver_batch(shaped)
        with srv.lock:
            n = sum(len(v) for v in srv.logs.values())
            topics = {t for (t, _p) in srv.logs}
        assert n == 40
        assert all(t.startswith("timescaledb.") for t in topics)
    finally:
        srv.shutdown()
        srv.server_close()


class _Hook(http.server.BaseHTTPRequestHandler):
    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with self.server.lock:
            self.server.received.append((dict(self.headers), body))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


def test_http_config_delivery_with_basic_auth(spark, sf_small, tmp_path):
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Hook)
    srv.received, srv.lock = [], threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        asm = _assembly(tmp_path, sink="http")
        asm.config.raw.setdefault("sink", {})["http"] = {
            "url": f"http://{host}:{port}/hook",
            "authentication": {
                "type": "basic",
                "basic": {"username": "u", "password": "s3"},
            },
        }
        env = asm.build(load(spark, sf_small, "events")).limit(15)
        asm.deliver_batch(asm.shape(env))
        with srv.lock:
            got = list(srv.received)
        assert len(got) == 15
        for headers, body in got:
            assert headers["Authorization"].startswith("Basic ")
            payload = json.loads(body)
            assert "op" in payload and "lsn" in payload
    finally:
        srv.shutdown()
        srv.server_close()
