"""Kafka sink delivery loop (H17) — the transport behind the
reference's `internal/eventing/sink/kafka/kafka.go`, re-expressed the
H15 way: delivery happens INSIDE foreachPartition on the executors,
each partition opens its own broker connection and produces its rows,
a failed/refused produce raises and fails the Spark task, and task
retry + checkpoint replay give the reference's at-least-once contract
(sarama SyncProducer with Producer.Return.Successes=true).

Reference semantics carried over exactly:

- acks=1 (`RequiredAcks = sarama.WaitForLocal`, kafka.go:50)
- up to 10 retries on retriable broker error codes
  (`Producer.Retry.Max = 10`, kafka.go:51)
- message = (key, envelope, event timestamp) per topic
  (kafka.go Emit: ByteEncoder(keyData/envelopeData) + Timestamp)
- non-retriable error or retry exhaustion propagates (SendMessage's
  returned err fails the sink)

The wire bytes come from kafka_wire.py (magic-2 RecordBatch +
ProduceRequest v3); rows arrive in the (key, value, topic) shape
`writers.kafka_shaped` produces. Partitioning: murmur-free modulo of
the key's CRC32C over n_partitions — deterministic and documented
(a deployment fronted by real Kafka uses the broker's partitioner via
the Spark Kafka connector; this loop is the connector-free path the
reference embeds)."""

from __future__ import annotations

import socket
import ssl
import struct
import time

from pyspark.sql import DataFrame

from timescaledb_event_streamer_spark.sinks.kafka_wire import (
    RETRIABLE_ERRORS,
    crc32c,
    decode_produce_response,
    encode_produce_request,
    encode_record_batch,
)

#: reference kafka.go:46 — sarama config ClientID
CLIENT_ID = "event-stream-prototype"
MAX_RETRIES = 10


class KafkaDeliveryError(RuntimeError):
    """Non-retriable broker error or retry exhaustion — fails the
    Spark task (at-least-once retry, like sarama's returned err)."""


def _recv_frame(sock: socket.socket) -> bytes:
    head = b""
    while len(head) < 4:
        chunk = sock.recv(4 - len(head))
        if not chunk:
            raise ConnectionError("broker closed mid-frame")
        head += chunk
    (size,) = struct.unpack(">i", head)
    body = b""
    while len(body) < size:
        chunk = sock.recv(size - len(body))
        if not chunk:
            raise ConnectionError("broker closed mid-frame")
        body += chunk
    return head + body


class KafkaProducer:
    """One connection to one broker; synchronous produce with the
    reference's ack + retry semantics. Lives executor-side inside
    foreachPartition — import-light, stdlib-only."""

    def __init__(
        self,
        broker: tuple[str, int],
        *,
        acks: int = 1,
        timeout_s: float = 10.0,
        n_partitions: int = 1,
        max_retries: int = MAX_RETRIES,
        retry_backoff_s: float = 0.05,
        tls: bool = False,
        tls_opts: dict | None = None,
        sasl_mechanism: str | None = None,
        sasl_username: str = "",
        sasl_password: str = "",
    ) -> None:
        self.broker = broker
        self.acks = acks
        self.timeout_s = timeout_s
        self.n_partitions = n_partitions
        self.max_retries = max_retries
        self.retry_backoff_s = retry_backoff_s
        self.tls = tls
        self.tls_opts = tls_opts or {}
        if sasl_mechanism and sasl_mechanism not in (
            "PLAIN",
            "SCRAM-SHA-256",
        ):
            raise ValueError(
                f"unsupported SASL mechanism {sasl_mechanism!r}"
            )
        self.sasl_mechanism = sasl_mechanism
        self.sasl_username = sasl_username
        self.sasl_password = sasl_password
        self._sock: socket.socket | None = None
        self._correlation = 0

    # -- connection management ---------------------------------------
    def _connect(self) -> socket.socket:
        if self._sock is None:
            sock = socket.create_connection(
                self.broker, timeout=self.timeout_s
            )
            if self.tls:
                # broker TLS is from byte 0 (kafka.go:67-78), unlike
                # the PG source's STARTTLS
                from timescaledb_event_streamer_spark.sinks.tls import (
                    wrap_sink_tls,
                )

                sock = wrap_sink_tls(sock, self.broker[0], **self.tls_opts)
            if self.sasl_mechanism:
                try:
                    self._sasl_authenticate(sock)
                except Exception:
                    sock.close()
                    raise
            self._sock = sock
        return self._sock

    # -- SASL ----------------------------------------------------------
    def _sasl_roundtrip(self, sock: socket.socket, frame: bytes) -> bytes:
        sock.sendall(frame)
        return _recv_frame(sock)

    def _sasl_authenticate(self, sock: socket.socket) -> None:
        """SaslHandshake v1 announcing the mechanism, then the
        mechanism bytes over SaslAuthenticate v0 — PLAIN is one
        roundtrip, SCRAM-SHA-256 two (RFC 5802 client-first/
        client-final, reusing the PG source's SCRAM core).
        Authentication failures are NON-retriable and raise."""
        from timescaledb_event_streamer_spark.sinks.kafka_wire import (
            ERROR_SASL_AUTHENTICATION_FAILED,
            decode_sasl_authenticate_response,
            decode_sasl_handshake_response,
            encode_sasl_authenticate_request,
            encode_sasl_handshake_request,
            plain_auth_bytes,
        )

        self._correlation += 1
        hs = decode_sasl_handshake_response(
            self._sasl_roundtrip(
                sock,
                encode_sasl_handshake_request(
                    self._correlation, CLIENT_ID, self.sasl_mechanism
                ),
            )
        )
        if hs["error_code"] != 0:
            raise KafkaDeliveryError(
                f"kafka: broker rejected SASL mechanism "
                f"{self.sasl_mechanism!r} (error {hs['error_code']}, "
                f"enabled: {hs['mechanisms']})"
            )

        def authenticate(auth_bytes: bytes) -> dict:
            self._correlation += 1
            resp = decode_sasl_authenticate_response(
                self._sasl_roundtrip(
                    sock,
                    encode_sasl_authenticate_request(
                        self._correlation, CLIENT_ID, auth_bytes
                    ),
                )
            )
            if resp["error_code"] != 0:
                detail = resp.get("error_message") or ""
                kind = (
                    "authentication failed"
                    if resp["error_code"]
                    == ERROR_SASL_AUTHENTICATION_FAILED
                    else f"error {resp['error_code']}"
                )
                raise KafkaDeliveryError(f"kafka: SASL {kind}: {detail}")
            return resp

        if self.sasl_mechanism == "PLAIN":
            authenticate(
                plain_auth_bytes(self.sasl_username, self.sasl_password)
            )
            return
        # SCRAM-SHA-256: the RFC 5802 exchange from the PG source,
        # framed in SaslAuthenticate bytes instead of pg wire messages
        from timescaledb_event_streamer_spark.sources.pg_auth import (
            ScramClient,
        )

        scram = ScramClient(self.sasl_password, username=self.sasl_username)
        server_first = authenticate(scram.client_first().encode())[
            "auth_bytes"
        ].decode()
        client_final = scram.handle_server_first(server_first)
        server_final = authenticate(client_final.encode())[
            "auth_bytes"
        ].decode()
        scram.verify_server_final(server_final)

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def __enter__(self) -> "KafkaProducer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- partitioning -------------------------------------------------
    def partition_for(self, key: bytes | None) -> int:
        if key is None or self.n_partitions == 1:
            return 0
        return crc32c(key) % self.n_partitions

    # -- produce ------------------------------------------------------
    def send_batch(
        self, topic: str, messages: list[tuple[bytes | None, bytes | None, int]]
    ) -> dict[int, int]:
        """Produce [(key, value, timestamp_ms)] to `topic`, grouped by
        partition; waits for the ack (acks=1) and retries retriable
        error codes with backoff. Returns {partition: base_offset}."""
        if not messages:
            return {}
        by_partition: dict[int, list] = {}
        for key, value, ts in messages:
            by_partition.setdefault(self.partition_for(key), []).append(
                (key, value, ts)
            )
        offsets: dict[int, int] = {}
        for partition, msgs in by_partition.items():
            offsets[partition] = self._produce_one(topic, partition, msgs)
        return offsets

    def _produce_one(self, topic: str, partition: int, msgs: list) -> int:
        batch = encode_record_batch(msgs)
        last_error: int | str = "no attempt"
        for attempt in range(self.max_retries + 1):
            try:
                # connect FIRST: TLS + SASL consume correlation ids
                sock = self._connect()
            except ssl.SSLCertVerificationError:
                # a certificate-trust failure is deterministic: 10
                # backoff retries would only delay the real error on
                # every executor task — non-retriable, like SASL
                # auth failures
                self.close()
                raise
            except (ConnectionError, OSError) as e:
                self.close()
                last_error = f"transport: {e}"
                time.sleep(self.retry_backoff_s * (attempt + 1))
                continue
            self._correlation += 1
            frame = encode_produce_request(
                self._correlation,
                CLIENT_ID,
                {topic: {partition: batch}},
                acks=self.acks,
                timeout_ms=int(self.timeout_s * 1000),
            )
            try:
                sock.sendall(frame)
                if self.acks == 0:  # fire-and-forget: no response frame
                    return -1
                resp = decode_produce_response(_recv_frame(sock))
            except (ConnectionError, OSError) as e:
                # broken broker connection is retriable: reconnect
                self.close()
                last_error = f"transport: {e}"
                time.sleep(self.retry_backoff_s * (attempt + 1))
                continue
            if resp["correlation_id"] != self._correlation:
                raise KafkaDeliveryError(
                    f"correlation mismatch {resp['correlation_id']}"
                    f" != {self._correlation}"
                )
            error_code, base_offset = resp["results"][topic][partition]
            if error_code == 0:
                return base_offset
            if error_code not in RETRIABLE_ERRORS:
                raise KafkaDeliveryError(
                    f"kafka: broker error {error_code} on"
                    f" {topic}/{partition}"
                )
            last_error = error_code
            time.sleep(self.retry_backoff_s * (attempt + 1))
        raise KafkaDeliveryError(
            f"kafka: retries exhausted on {topic}/{partition}"
            f" (last error {last_error})"
        )


def produce_rows(
    rows,
    broker: tuple[str, int],
    *,
    n_partitions: int = 1,
    acks: int = 1,
    batch_size: int = 500,
    **producer_opts,
) -> int:
    """Executor-side partition body: rows in the kafka_shaped
    (key, value, topic[, ts_ms]) contract -> produce frames, batched
    per topic. Returns the delivered count. Any delivery error raises
    and fails the task.

    `broker` is either ONE (host, port) — single-broker loop, static
    n_partitions — or a LIST of (host, port) bootstrap brokers, which
    selects metadata-driven cluster routing (KafkaClusterProducer;
    partition count and leaders come from the cluster, n_partitions
    is ignored)."""
    is_cluster = (
        isinstance(broker, (list, tuple))
        and len(broker) > 0
        and isinstance(broker[0], (list, tuple))
    )
    if is_cluster:
        producer_cm = KafkaClusterProducer(
            list(broker), acks=acks, **producer_opts
        )
    else:
        producer_cm = KafkaProducer(
            broker, acks=acks, n_partitions=n_partitions, **producer_opts
        )
    delivered = 0
    with producer_cm as producer:
        pending: dict[str, list] = {}
        for row in rows:
            d = row.asDict() if hasattr(row, "asDict") else dict(row)
            key = bytes(d["key"]) if d.get("key") is not None else None
            value = bytes(d["value"]) if d.get("value") is not None else None
            # event time when the frame carries one; emit time
            # otherwise (sarama's producer default) — never epoch 0
            ts = int(d.get("ts_ms") or (time.time() * 1000))
            pending.setdefault(d["topic"], []).append((key, value, ts))
            if len(pending[d["topic"]]) >= batch_size:
                producer.send_batch(d["topic"], pending.pop(d["topic"]))
                delivered += batch_size
        for topic, msgs in pending.items():
            producer.send_batch(topic, msgs)
            delivered += len(msgs)
    return delivered


def kafka_sink_batch(
    df: DataFrame,
    broker: tuple[str, int],
    *,
    n_partitions: int = 1,
    acks: int = 1,
    **producer_opts,
) -> None:
    """Deliver one (micro-)batch: executor-parallel foreachPartition,
    one broker connection per partition (the H15 shape). Extra
    kwargs (tls/tls_opts/sasl_*) reach every executor's producer."""
    df.foreachPartition(
        lambda rows: produce_rows(
            rows, broker, n_partitions=n_partitions, acks=acks,
            **producer_opts,
        )
    )


def kafka_sink_stream(
    df: DataFrame,
    broker: tuple[str, int],
    *,
    n_partitions: int = 1,
    checkpoint_dir: str | None = None,
    query_name: str = "kafka_sink",
    **producer_opts,
):
    """writeStream wiring: foreachBatch -> executor-parallel produce.
    With a checkpoint dir a crashed batch replays on restart —
    at-least-once, deduped downstream on (topic, key, lsn) identity
    exactly as the reference documents for its sinks."""
    writer = (
        df.writeStream.queryName(query_name)
        .foreachBatch(
            lambda b, _id: kafka_sink_batch(
                b, broker, n_partitions=n_partitions, **producer_opts
            )
        )
        .outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


class KafkaClusterProducer:
    """Metadata-driven cluster produce — the posture of the
    reference's sarama client (`sarama.NewClient(brokers...)`,
    kafka.go:44): bootstrap from ANY broker in the configured list,
    learn per-partition leaders from a MetadataRequest, keep one
    KafkaProducer connection per leader node, and route each
    partition's batch to its leader. A produce failure (leader moved,
    broker lost) refreshes metadata once and retries on the new
    leader; per-broker transport/retriable-code retries stay inside
    KafkaProducer, so the reference's Retry.Max=10 semantics apply at
    both layers. Partitioning: CRC32C of the key over the LIVE
    partition count from metadata (single-broker KafkaProducer takes
    a static n_partitions instead)."""

    def __init__(
        self,
        brokers: list[tuple[str, int]],
        *,
        acks: int = 1,
        timeout_s: float = 10.0,
        max_retries: int = MAX_RETRIES,
        retry_backoff_s: float = 0.05,
        **conn_opts,
    ) -> None:
        if not brokers:
            raise ValueError("at least one bootstrap broker required")
        self.brokers = [tuple(b) for b in brokers]
        self.acks = acks
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.retry_backoff_s = retry_backoff_s
        self.conn_opts = conn_opts
        self._nodes: dict[int, tuple[str, int]] = {}
        self._leaders: dict[str, dict[int, int]] = {}
        self._producers: dict[int, KafkaProducer] = {}

    def _new_producer(self, hostport: tuple[str, int]) -> KafkaProducer:
        return KafkaProducer(
            hostport,
            acks=self.acks,
            timeout_s=self.timeout_s,
            max_retries=self.max_retries,
            retry_backoff_s=self.retry_backoff_s,
            **self.conn_opts,
        )

    # -- metadata ------------------------------------------------------
    def refresh_metadata(self, topic: str) -> None:
        from timescaledb_event_streamer_spark.sinks.kafka_wire import (
            decode_metadata_response,
            encode_metadata_request,
        )

        last: Exception | None = None
        for hostport in self.brokers:
            boot = self._new_producer(hostport)
            try:
                sock = boot._connect()
                boot._correlation += 1
                sock.sendall(
                    encode_metadata_request(
                        boot._correlation, CLIENT_ID, [topic]
                    )
                )
                resp = decode_metadata_response(_recv_frame(sock))
                meta = resp["topics"].get(topic)
                if meta is None or meta["error_code"] != 0:
                    raise KafkaDeliveryError(
                        f"kafka: metadata error for {topic!r}: "
                        f"{meta and meta['error_code']}"
                    )
                if not meta["partitions"]:
                    raise KafkaDeliveryError(
                        f"kafka: topic {topic!r} has no partitions"
                    )
                self._nodes = dict(resp["brokers"])
                self._leaders[topic] = dict(meta["partitions"])
                return
            except ssl.SSLCertVerificationError:
                raise  # deterministic trust failure: never try the next broker
            except (ConnectionError, OSError, KafkaDeliveryError) as e:
                last = e
            finally:
                boot.close()
        raise KafkaDeliveryError(
            f"kafka: metadata unavailable from every bootstrap broker"
            f" (last: {last})"
        )

    def _producer_for(self, node_id: int) -> KafkaProducer:
        if node_id not in self._producers:
            if node_id not in self._nodes:
                raise KafkaDeliveryError(
                    f"kafka: leader node {node_id} missing from metadata"
                )
            self._producers[node_id] = self._new_producer(
                self._nodes[node_id]
            )
        return self._producers[node_id]

    # -- partitioning ---------------------------------------------------
    def partition_for(self, topic: str, key: bytes | None) -> int:
        parts = sorted(self._leaders[topic])
        if key is None or len(parts) == 1:
            return parts[0]
        return parts[crc32c(key) % len(parts)]

    # -- produce ---------------------------------------------------------
    def send_batch(
        self, topic: str, messages: list[tuple[bytes | None, bytes | None, int]]
    ) -> dict[int, int]:
        """Same contract as KafkaProducer.send_batch, but each
        partition's frame goes to that partition's leader broker."""
        if not messages:
            return {}
        if topic not in self._leaders:
            self.refresh_metadata(topic)
        by_partition: dict[int, list] = {}
        for key, value, ts in messages:
            by_partition.setdefault(
                self.partition_for(topic, key), []
            ).append((key, value, ts))
        offsets: dict[int, int] = {}
        for partition, msgs in by_partition.items():
            offsets[partition] = self._produce_routed(topic, partition, msgs)
        return offsets

    def _produce_routed(self, topic: str, partition: int, msgs: list) -> int:
        for attempt in (0, 1):
            node = self._leaders[topic][partition]
            producer = self._producer_for(node)
            try:
                return producer._produce_one(topic, partition, msgs)
            except KafkaDeliveryError:
                if attempt:
                    raise
                # leader may have moved: drop this connection,
                # re-learn the topology, retry once on the new leader
                producer.close()
                self._producers.pop(node, None)
                self.refresh_metadata(topic)
        raise AssertionError("unreachable")

    def close(self) -> None:
        for p in self._producers.values():
            p.close()
        self._producers.clear()

    def __enter__(self) -> "KafkaClusterProducer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
