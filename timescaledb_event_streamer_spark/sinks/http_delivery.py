"""HTTP sink delivery loop (H15) — the webhook path of the reference's
`internal/eventing/sink/http/http.go`: one JSON envelope per event
POSTed to a configured URL with basic / header / no authentication,
any non-2xx status treated as a delivery failure (http.go:134-137).

Spark-first shape: delivery runs INSIDE foreachPartition on the
executors — each partition opens its own connections and streams its
rows, so a 1000-executor cluster delivers in parallel with no
driver-side fan-in; a failed POST raises, failing the task, and
Spark's task retry + the idempotent-receiver contract (the H4/H6
checkpoint story) provide at-least-once delivery exactly the way the
reference's sink-manager error propagation does.

stdlib-only (urllib); TLS URLs ride the stdlib ssl defaults — pass a
pre-built opener for custom contexts.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request

from pyspark.sql import DataFrame

#: reference config.AuthenticationType values (spi/config)
AUTH_TYPES = ("none", "basic", "header")


class HttpDeliveryError(RuntimeError):
    """Non-2xx response — fails the Spark task (at-least-once retry)."""


def http_sink_headers(
    auth_type: str = "none",
    *,
    username: str = "",
    password: str = "",
    header_name: str = "",
    header_value: str = "",
) -> dict:
    """The reference's header assembly (http.go:70-99): Content-Type
    json always; basic auth = base64 user:password; header auth =
    one literal header; anything else is a LOUD config error."""
    headers = {"Content-Type": "application/json"}
    if auth_type == "basic":
        token = base64.b64encode(f"{username}:{password}".encode()).decode()
        headers["Authorization"] = f"Basic {token}"
    elif auth_type == "header":
        headers[header_name] = header_value
    elif auth_type != "none":
        raise ValueError(f"http AuthenticationType {auth_type!r} doesn't exist")
    return headers


def post_rows(rows, url: str, headers: dict, timeout_s: float = 10.0) -> int:
    """POST each row's envelope JSON; returns the delivered count.
    Runs on an executor inside foreachPartition — import-light,
    stdlib-only. Rows need an `envelope` field (already-serialized
    JSON string) or are serialized whole."""
    delivered = 0
    for row in rows:
        d = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(row)
        payload = (
            d["envelope"]
            if "envelope" in d and isinstance(d["envelope"], str)
            else json.dumps(d, sort_keys=True, default=str)
        ).encode()
        req = urllib.request.Request(
            url, data=payload, headers=headers, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                status = resp.status
        except urllib.error.HTTPError as e:  # non-2xx raises here
            status = e.code
        if status < 200 or status >= 300:
            raise HttpDeliveryError(
                f"http: non-2xx response status code: {status}"
            )
        delivered += 1
    return delivered


def http_sink_batch(df: DataFrame, url: str, headers: dict) -> None:
    """Deliver one (micro-)batch: executor-parallel foreachPartition."""
    df.foreachPartition(lambda rows: post_rows(rows, url, headers))


def http_sink_stream(
    df: DataFrame,
    url: str,
    *,
    headers: dict | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "http_sink",
):
    """writeStream wiring: foreachBatch -> executor-parallel POSTs.
    With a checkpoint dir, a crashed batch replays — the receiver
    dedupes on envelope identity (the reference's at-least-once
    contract)."""
    headers = headers or http_sink_headers()
    writer = (
        df.writeStream.queryName(query_name)
        .foreachBatch(lambda b, _id: http_sink_batch(b, url, headers))
        .outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
