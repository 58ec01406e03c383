"""Redis Streams sink delivery loop (H19) — the transport behind the
reference's Redis sink (`internal/eventing/sink/redis/redis.go`),
re-expressed the H15/H17/H18 way: executor-side foreachPartition
opens its own connection and XADDs each row synchronously; failures
fail the Spark task (at-least-once via task retry + checkpoint
replay).

Reference semantics carried over exactly:

- XADD to stream = topic with the two-field value map
  {key: <json key>, envelope: <json envelope>} and an auto ID
  (redis.go Emit, :112-125 — go-redis XAddArgs with no ID = '*')
- optional AUTH password and SELECT database from the options block
  (redis.go:50-56)
- MaxRetries with bounded backoff (redis.go:56-64; the reference
  default is 0 retries — same here), reconnect on broken transport

The RESP2 protocol (public Redis serialization spec) is implemented
directly — commands as arrays of bulk strings, replies parsed for
simple strings / errors / integers / bulk / arrays — so tests drive
real bytes against a Redis-shaped local TCP server.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import DataFrame


class RedisDeliveryError(RuntimeError):
    """-ERR reply or retry exhaustion — fails the Spark task."""


# -- RESP2 codec -----------------------------------------------------

def encode_command(*args: bytes | str) -> bytes:
    """Command -> RESP array of bulk strings."""
    out = bytearray(f"*{len(args)}\r\n".encode())
    for a in args:
        raw = a.encode() if isinstance(a, str) else a
        out += f"${len(raw)}\r\n".encode() + raw + b"\r\n"
    return bytes(out)


class RespReader:
    """Incremental RESP2 reply reader over a socket-like object."""

    def __init__(self, sock) -> None:
        self._sock = sock
        self._buf = b""

    def _fill(self) -> None:
        chunk = self._sock.recv(65536)
        if not chunk:
            raise ConnectionError("redis: server closed the connection")
        self._buf += chunk

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            self._fill()
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def next_reply(self):
        """-> ('+', str) | ('-', str) | (':', int) | ('$', bytes|None)
        | ('*', list)."""
        line = self._read_line()
        kind, rest = chr(line[0]), line[1:]
        if kind == "+":
            return ("+", rest.decode())
        if kind == "-":
            return ("-", rest.decode())
        if kind == ":":
            return (":", int(rest))
        if kind == "$":
            n = int(rest)
            if n < 0:
                return ("$", None)
            blob = self._read_exact(n)
            self._read_exact(2)
            return ("$", blob)
        if kind == "*":
            n = int(rest)
            if n < 0:
                return ("*", None)
            return ("*", [self.next_reply() for _ in range(n)])
        raise ValueError(f"unexpected RESP type {kind!r}")


# -- publisher -------------------------------------------------------

class RedisStreamsPublisher:
    """One connection; synchronous XADD with the reference's value
    map. Lives executor-side inside foreachPartition."""

    def __init__(
        self,
        server: tuple[str, int],
        *,
        password: str = "",
        db: int = 0,
        timeout_s: float = 5.0,
        max_retries: int = 0,
        retry_backoff_s: float = 0.000512,
        tls: bool = False,
        tls_opts: dict | None = None,
    ) -> None:
        self.server = server
        self.password = password
        self.db = db
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.retry_backoff_s = retry_backoff_s
        self.tls = tls
        self.tls_opts = tls_opts or {}
        self._sock: socket.socket | None = None
        self._reader: RespReader | None = None

    def _connect(self) -> None:
        if self._sock is not None:
            return
        sock = socket.create_connection(self.server, timeout=self.timeout_s)
        if self.tls:
            # redis.go:86-95: TLSConfig on the go-redis client — TLS
            # from byte 0, before AUTH/SELECT
            from timescaledb_event_streamer_spark.sinks.tls import (
                wrap_sink_tls,
            )

            sock = wrap_sink_tls(sock, self.server[0], **self.tls_opts)
        reader = RespReader(sock)
        if self.password:
            sock.sendall(encode_command("AUTH", self.password))
            kind, val = reader.next_reply()
            if kind == "-":
                sock.close()
                raise RedisDeliveryError(f"redis: AUTH failed: {val}")
        if self.db:
            sock.sendall(encode_command("SELECT", str(self.db)))
            kind, val = reader.next_reply()
            if kind == "-":
                sock.close()
                raise RedisDeliveryError(f"redis: SELECT failed: {val}")
        self._sock, self._reader = sock, reader

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = self._reader = None

    def __enter__(self) -> "RedisStreamsPublisher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def xadd(self, stream: str, key_json: str, envelope_json: str) -> bytes:
        """XADD <stream> * key <k> envelope <e>; returns the
        server-generated entry ID. -ERR raises immediately (the
        reference surfaces XAdd().Err() the same way); transport
        failures reconnect and retry up to max_retries."""
        cmd = encode_command(
            "XADD", stream, "*", "key", key_json, "envelope", envelope_json
        )
        last = "no attempt"
        for attempt in range(self.max_retries + 1):
            try:
                self._connect()
                self._sock.sendall(cmd)
                kind, val = self._reader.next_reply()
            except (ConnectionError, OSError) as e:
                self.close()
                last = f"transport: {e}"
                time.sleep(self.retry_backoff_s * (attempt + 1))
                continue
            if kind == "-":
                raise RedisDeliveryError(f"redis: {val}")
            if kind != "$" or val is None:
                raise RedisDeliveryError(
                    f"redis: unexpected XADD reply {kind}{val!r}"
                )
            return val
        raise RedisDeliveryError(f"redis: retries exhausted (last {last})")


def xadd_rows(rows, server: tuple[str, int], **opts) -> int:
    """Executor-side partition body for redis_shaped frames
    (stream, key, envelope)."""
    delivered = 0
    with RedisStreamsPublisher(server, **opts) as pub:
        for row in rows:
            d = row.asDict() if hasattr(row, "asDict") else dict(row)
            pub.xadd(d["stream"], d.get("key") or "", d["envelope"])
            delivered += 1
    return delivered


def redis_sink_batch(df: DataFrame, server: tuple[str, int], **opts) -> None:
    """Deliver one (micro-)batch: executor-parallel foreachPartition."""
    df.foreachPartition(lambda rows: xadd_rows(rows, server, **opts))


def redis_sink_stream(
    df: DataFrame,
    server: tuple[str, int],
    *,
    checkpoint_dir: str | None = None,
    query_name: str = "redis_sink",
    **opts,
):
    """writeStream wiring: foreachBatch -> executor-parallel XADDs;
    checkpointed replay gives at-least-once, deduped downstream on
    envelope identity."""
    writer = (
        df.writeStream.queryName(query_name)
        .foreachBatch(lambda b, _id: redis_sink_batch(b, server, **opts))
        .outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
