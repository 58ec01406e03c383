"""NATS JetStream sink delivery loop (H18) — the transport behind the
reference's NATS sink (`internal/eventing/sink/nats/nats.go`),
re-expressed the H15/H17 way: executor-side foreachPartition opens
its own connection, publishes each row synchronously and fails the
Spark task on error, so task retry + checkpoint replay give the
at-least-once contract.

Reference semantics carried over exactly:

- message = HPUB to subject = topic, header ``key`` = the JSON key,
  payload = the JSON envelope (nats.go Emit, :137-158)
- synchronous JetStream publish: each message carries a reply inbox
  and the loop WAITS for the PubAck (``{"stream": ..., "seq": ...}``)
  or surfaces the JetStream error — PublishMsg with a context
  timeout (nats.go:150-157)
- client name 'event-stream-prototype' (nats.go:95)
- the three authorization modes of nats.go:46-64 (userinfo /
  jwt+seed / credentials file), assembled by nats_wire.connect_options
- reconnect-with-retry on broken transport (RetryOnFailedConnect /
  ReconnectWait, nats.go:96-99 — bounded here instead of infinite so
  a dead broker fails the task rather than hanging it)
"""

from __future__ import annotations

import json
import socket
import time
import uuid

from pyspark.sql import DataFrame

from timescaledb_event_streamer_spark.sinks.nats_wire import (
    NatsReader,
    connect_options,
    encode_connect,
    encode_hpub,
    encode_sub,
)


class NatsDeliveryError(RuntimeError):
    """JetStream error ack, -ERR, or retry exhaustion — fails the
    Spark task (at-least-once retry)."""


class NatsJetStreamPublisher:
    """One connection to one server; synchronous JetStream publish
    with ack. Lives executor-side inside foreachPartition."""

    def __init__(
        self,
        server: tuple[str, int],
        *,
        authorization: str = "userinfo",
        username: str = "",
        password: str = "",
        jwt: str = "",
        seed: str = "",
        creds_text: str = "",
        timeout_s: float = 5.0,
        max_reconnects: int = 3,
        reconnect_wait_s: float = 0.1,
        tls: bool = False,
        tls_opts: dict | None = None,
    ) -> None:
        self.tls = tls
        self.tls_opts = tls_opts or {}
        self.server = server
        self.auth = dict(
            authorization=authorization,
            username=username,
            password=password,
            jwt=jwt,
            seed=seed,
            creds_text=creds_text,
        )
        self.timeout_s = timeout_s
        self.max_reconnects = max_reconnects
        self.reconnect_wait_s = reconnect_wait_s
        self._sock: socket.socket | None = None
        self._reader: NatsReader | None = None
        self._inbox = f"_INBOX.{uuid.uuid4().hex}"

    # -- connection ---------------------------------------------------
    def _connect(self) -> None:
        if self._sock is not None:
            return
        sock = socket.create_connection(self.server, timeout=self.timeout_s)
        reader = NatsReader(sock)
        op, info, _, _ = reader.next_op()
        if op != "INFO":
            raise NatsDeliveryError(f"nats: expected INFO, got {op}")
        if self.tls or info.get("tls_required"):
            # the NATS handshake starts cleartext; the client
            # upgrades AFTER INFO and BEFORE CONNECT (the nats.go
            # `secure` path; INFO advertises tls_required)
            from timescaledb_event_streamer_spark.sinks.tls import (
                wrap_sink_tls,
            )

            sock = wrap_sink_tls(sock, self.server[0], **self.tls_opts)
            reader = NatsReader(sock)
        nonce = (info.get("nonce") or "").encode()
        opts = connect_options(nonce=nonce, **self.auth)
        sock.sendall(encode_connect(opts))
        sock.sendall(encode_sub(self._inbox, "1"))
        self._sock, self._reader = sock, reader

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = self._reader = None

    def __enter__(self) -> "NatsJetStreamPublisher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- publish ------------------------------------------------------
    def publish(self, subject: str, key_json: str, envelope: bytes) -> dict:
        """One synchronous JetStream publish; returns the PubAck
        {'stream':..., 'seq':...}. Transport failures reconnect and
        retry (the message may be re-sent — at-least-once); a
        JetStream error ack or -ERR raises immediately."""
        frame = encode_hpub(
            subject, {"key": key_json}, envelope, reply_to=self._inbox
        )
        last = "no attempt"
        for attempt in range(self.max_reconnects + 1):
            try:
                self._connect()
                self._sock.sendall(frame)
                ack = self._await_ack()
            except (ConnectionError, OSError) as e:
                self.close()
                last = f"transport: {e}"
                time.sleep(self.reconnect_wait_s * (attempt + 1))
                continue
            if "error" in ack:
                raise NatsDeliveryError(f"nats: jetstream error {ack['error']}")
            return ack
        raise NatsDeliveryError(
            f"nats: reconnects exhausted (last {last})"
        )

    def _await_ack(self) -> dict:
        deadline = time.time() + self.timeout_s
        while True:
            if time.time() > deadline:
                raise NatsDeliveryError("nats: PubAck timeout")
            op, fields, _hdr, payload = self._reader.next_op()
            if op == "PING":
                self._sock.sendall(b"PONG\r\n")
                continue
            if op in ("+OK", "PONG"):
                continue
            if op == "-ERR":
                raise NatsDeliveryError(f"nats: server error {fields}")
            if op in ("MSG", "HMSG") and fields[0] == self._inbox:
                return json.loads(payload)
            # unrelated traffic on a publisher connection is a
            # protocol violation worth surfacing
            raise NatsDeliveryError(f"nats: unexpected {op} {fields}")


def publish_rows(rows, server: tuple[str, int], **auth) -> int:
    """Executor-side partition body: rows in the nats_shaped contract
    (subject, key, envelope) -> synchronous JetStream publishes.
    Returns the delivered count; any failure raises (task retry)."""
    delivered = 0
    with NatsJetStreamPublisher(server, **auth) as pub:
        for row in rows:
            d = row.asDict() if hasattr(row, "asDict") else dict(row)
            # nats_shaped (H7) emits (subject, data); richer frames
            # may carry an explicit envelope/key pair
            envelope = d.get("envelope", d.get("data"))
            if isinstance(envelope, str):
                envelope = envelope.encode()
            elif envelope is not None:
                envelope = bytes(envelope)
            pub.publish(d["subject"], d.get("key") or "", envelope)
            delivered += 1
    return delivered


def nats_sink_batch(df: DataFrame, server: tuple[str, int], **auth) -> None:
    """Deliver one (micro-)batch: executor-parallel foreachPartition."""
    df.foreachPartition(lambda rows: publish_rows(rows, server, **auth))


def nats_sink_stream(
    df: DataFrame,
    server: tuple[str, int],
    *,
    checkpoint_dir: str | None = None,
    query_name: str = "nats_sink",
    **auth,
):
    """writeStream wiring: foreachBatch -> executor-parallel
    publishes; a crashed batch replays from the checkpoint
    (at-least-once, deduped downstream on envelope identity)."""
    writer = (
        df.writeStream.queryName(query_name)
        .foreachBatch(lambda b, _id: nats_sink_batch(b, server, **auth))
        .outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
