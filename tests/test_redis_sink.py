"""Redis Streams sink delivery loop (H19): real RESP2 bytes driven
end-to-end against a Redis-shaped local TCP server from executor-side
foreachPartition — the reference's XADD {key, envelope} value-map
contract (redis.go Emit), AUTH/SELECT handling, -ERR propagation,
and the streaming path through a checkpoint."""

from __future__ import annotations

import json
import socketserver
import threading

import pytest

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sinks.redis_delivery import (
    RedisDeliveryError,
    RedisStreamsPublisher,
    RespReader,
    encode_command,
    redis_sink_batch,
    redis_sink_stream,
)


# -- RESP codec unit coverage ----------------------------------------

def test_encode_command_resp2():
    assert (
        encode_command("XADD", "s", "*")
        == b"*3\r\n$4\r\nXADD\r\n$1\r\ns\r\n$1\r\n*\r\n"
    )


def test_resp_reader_all_types():
    class Feed:
        def __init__(self, data):
            self.data = data

        def recv(self, n):
            out, self.data = self.data[:n], self.data[n:]
            return out

    r = RespReader(
        Feed(b"+OK\r\n-ERR boom\r\n:42\r\n$5\r\nhello\r\n$-1\r\n*2\r\n:1\r\n+a\r\n")
    )
    assert r.next_reply() == ("+", "OK")
    assert r.next_reply() == ("-", "ERR boom")
    assert r.next_reply() == (":", 42)
    assert r.next_reply() == ("$", b"hello")
    assert r.next_reply() == ("$", None)
    assert r.next_reply() == ("*", [(":", 1), ("+", "a")])


# -- Redis-shaped local server ---------------------------------------

class _RedisHandler(socketserver.StreamRequestHandler):
    """Parses RESP command arrays; supports AUTH, SELECT and XADD
    with auto IDs. Entries land in server.streams[name]."""

    def _read_command(self):
        line = self.rfile.readline()
        if not line:
            return None
        assert line[:1] == b"*", line
        n = int(line[1:].rstrip())
        args = []
        for _ in range(n):
            head = self.rfile.readline()
            assert head[:1] == b"$"
            ln = int(head[1:].rstrip())
            args.append(self.rfile.read(ln + 2)[:ln])
        return args

    def handle(self):
        srv = self.server
        authed = not srv.password
        while True:
            cmd = self._read_command()
            if cmd is None:
                return
            name = cmd[0].decode().upper()
            if name == "AUTH":
                if cmd[1].decode() == (srv.password or cmd[1].decode()):
                    authed = True
                    self.wfile.write(b"+OK\r\n")
                else:
                    self.wfile.write(b"-ERR invalid password\r\n")
            elif not authed:
                self.wfile.write(b"-NOAUTH Authentication required.\r\n")
            elif name == "SELECT":
                with srv.lock:
                    srv.selects.append(int(cmd[1]))
                self.wfile.write(b"+OK\r\n")
            elif name == "XADD":
                stream = cmd[1].decode()
                assert cmd[2] == b"*"  # auto ID, the XAddArgs default
                fields = {
                    cmd[i].decode(): cmd[i + 1].decode()
                    for i in range(3, len(cmd), 2)
                }
                with srv.lock:
                    if srv.fail_first > 0:
                        srv.fail_first -= 1
                        self.wfile.write(b"-ERR stream unavailable\r\n")
                        continue
                    log = srv.streams.setdefault(stream, [])
                    entry_id = f"{1700000000000 + len(log)}-0"
                    log.append((entry_id, fields))
                self.wfile.write(
                    f"${len(entry_id)}\r\n{entry_id}\r\n".encode()
                )
            else:
                self.wfile.write(b"-ERR unknown command\r\n")


class _QuietRedis(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def handle_error(self, request, client_address):
        pass


@pytest.fixture()
def redis_server():
    srv = _QuietRedis(("127.0.0.1", 0), _RedisHandler)
    srv.streams, srv.selects = {}, []
    srv.password = None
    srv.fail_first = 0
    srv.lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


# -- publisher semantics ---------------------------------------------

def test_xadd_value_map_and_generated_ids(redis_server):
    with RedisStreamsPublisher(redis_server.server_address) as pub:
        id1 = pub.xadd("prefix.public.t", '{"id":1}', '{"op":"c"}')
        id2 = pub.xadd("prefix.public.t", '{"id":2}', '{"op":"u"}')
    assert id1.endswith(b"-0") and id1 != id2
    with redis_server.lock:
        log = redis_server.streams["prefix.public.t"]
    # the reference's Emit contract: exactly the two-field value map
    assert log[0][1] == {"key": '{"id":1}', "envelope": '{"op":"c"}'}
    assert log[1][1]["envelope"] == '{"op":"u"}'


def test_auth_and_select_handshake(redis_server):
    redis_server.password = "s3cret"
    with RedisStreamsPublisher(
        redis_server.server_address, password="s3cret", db=3
    ) as pub:
        pub.xadd("t", "", "{}")
    assert redis_server.selects == [3]


def test_wrong_password_fails(redis_server):
    redis_server.password = "s3cret"
    with RedisStreamsPublisher(
        redis_server.server_address, password="nope"
    ) as pub:
        with pytest.raises(RedisDeliveryError, match="AUTH failed"):
            pub.xadd("t", "", "{}")


def test_err_reply_propagates_without_retry(redis_server):
    """The reference default is MaxRetries=0 and XAdd().Err() surfaces
    server errors directly — same contract here."""
    redis_server.fail_first = 1
    with RedisStreamsPublisher(redis_server.server_address) as pub:
        with pytest.raises(RedisDeliveryError, match="stream unavailable"):
            pub.xadd("t", "", "{}")


# -- Spark end-to-end ------------------------------------------------

def _shaped(spark, n=18):
    """redis_shaped contract: (stream, key, envelope)."""
    return spark.range(n).select(
        F.concat(
            F.lit("prefix.public.r"), (F.col("id") % 3).cast("string")
        ).alias("stream"),
        F.to_json(F.struct(F.col("id"))).alias("key"),
        F.to_json(
            F.struct(F.col("id"), (F.col("id") * 11).alias("v"))
        ).alias("envelope"),
    )


def test_batch_delivery_from_executors(spark, redis_server):
    df = _shaped(spark, 18).repartition(3)
    redis_sink_batch(df, redis_server.server_address)
    with redis_server.lock:
        streams = {k: list(v) for k, v in redis_server.streams.items()}
    entries = [
        (s, fields) for s, log in streams.items() for _id, fields in log
    ]
    assert len(entries) == 18
    for stream, fields in entries:
        env = json.loads(fields["envelope"])
        assert stream.endswith(str(env["id"] % 3))
        assert json.loads(fields["key"]) == {"id": env["id"]}
        assert env["v"] == env["id"] * 11


def test_streaming_delivery_with_checkpoint(spark, redis_server, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _shaped(spark, 9).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b0")
    )
    stream = (
        spark.readStream.schema("stream STRING, key STRING, envelope STRING")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    for _ in range(2):  # second run on the same checkpoint: no replay
        q = (
            redis_sink_stream(
                stream,
                redis_server.server_address,
                checkpoint_dir=str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    with redis_server.lock:
        assert sum(len(v) for v in redis_server.streams.values()) == 9
