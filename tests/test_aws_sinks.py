"""Kinesis + SQS sink delivery loops (H20/H21): AWS SigV4 pinned to
the documented public example vector, then real signed HTTP driven
end-to-end against local AWS-shaped servers that VERIFY the
signature server-side with the shared secret — the reference's
PutRecord / FIFO SendMessage contracts (awskinesis.go, awssqs.go),
throttling retry, and the streaming path through a checkpoint."""

from __future__ import annotations

import base64
import hashlib
import http.server
import json
import threading
import urllib.parse

import pytest

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sinks.aws_delivery import (
    AwsDeliveryError,
    KinesisPublisher,
    SqsPublisher,
    kinesis_sink_batch,
    kinesis_sink_stream,
    sigv4_headers,
    sigv4_signature,
    sqs_dedup_id,
    sqs_sink_batch,
)

_AK = "AKIDEXAMPLE"
_SK = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"


# -- SigV4 against the AWS documentation example ----------------------

def test_sigv4_documented_example_vector():
    """The worked IAM ListUsers example from the public AWS Signature
    Version 4 documentation: exact Authorization header."""
    headers = sigv4_headers(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        region="us-east-1",
        service="iam",
        access_key=_AK,
        secret_key=_SK,
        body=b"",
        headers={
            "Content-Type": "application/x-www-form-urlencoded; charset=utf-8"
        },
        amzdate="20150830T123600Z",
    )
    assert headers["Authorization"] == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b"
        "5924a6f2b5d7"
    )


def test_sqs_dedup_id_matches_reference_and_encoder():
    """awssqs.go:100-116 (%X sha256) and the H7 sqs_shaped column
    produce the same id."""
    want = hashlib.sha256(b"42-{}").hexdigest().upper()
    assert sqs_dedup_id("42", "{}") == want
    assert sqs_dedup_id("42", "{}", txid=7) == hashlib.sha256(
        b"42-7-{}"
    ).hexdigest().upper()


# -- AWS-shaped local servers (signature-verifying) -------------------

def _verify_sigv4(handler, body: bytes, service: str) -> bool:
    """Server-side re-derivation of the client's signature with the
    shared secret; True iff it matches the Authorization header."""
    auth = handler.headers["Authorization"]
    amzdate = handler.headers["X-Amz-Date"]
    # parse scope + signed headers out of the Authorization header
    cred = auth.split("Credential=")[1].split(",")[0]
    _ak, datestamp, region, svc, _ = cred.split("/")
    signed = auth.split("SignedHeaders=")[1].split(",")[0]
    sig = auth.split("Signature=")[1]
    if svc != service:
        return False
    parsed = urllib.parse.urlsplit(handler.path)
    lower = {}
    for h in signed.split(";"):
        v = handler.headers["Host"] if h == "host" else handler.headers[h]
        lower[h] = " ".join((v or "").split())
    canonical_headers = "".join(f"{k}:{lower[k]}\n" for k in sorted(lower))
    q = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
    canonical_qs = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(q)
    )
    creq = "\n".join(
        ["POST", parsed.path or "/", canonical_qs, canonical_headers,
         signed, hashlib.sha256(body).hexdigest()]
    )
    sts = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amzdate,
            f"{datestamp}/{region}/{svc}/aws4_request",
            hashlib.sha256(creq.encode()).hexdigest(),
        ]
    )
    want = sigv4_signature(_SK, datestamp, region, svc, sts)
    return want == sig


class _KinesisHandler(http.server.BaseHTTPRequestHandler):
    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        srv = self.server
        with srv.lock:
            if not _verify_sigv4(self, body, "kinesis"):
                self.send_response(403)
                self.end_headers()
                self.wfile.write(b'{"__type":"AccessDeniedException"}')
                return
            if srv.fail_first > 0:
                srv.fail_first -= 1
                self.send_response(400)
                self.end_headers()
                self.wfile.write(
                    b'{"__type":"ProvisionedThroughputExceededException"}'
                )
                return
            req = json.loads(body)
            assert self.headers["X-Amz-Target"] == "Kinesis_20131202.PutRecord"
            srv.records.append(
                (
                    req["StreamName"],
                    req["PartitionKey"],
                    base64.b64decode(req["Data"]),
                )
            )
            seq = str(1000 + len(srv.records))
        self.send_response(200)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.end_headers()
        self.wfile.write(
            json.dumps(
                {"SequenceNumber": seq, "ShardId": "shardId-000000000000"}
            ).encode()
        )

    def log_message(self, *a):
        pass


class _SqsHandler(http.server.BaseHTTPRequestHandler):
    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        srv = self.server
        with srv.lock:
            if not _verify_sigv4(self, body, "sqs"):
                self.send_response(403)
                self.end_headers()
                return
            form = dict(urllib.parse.parse_qsl(body.decode()))
            assert form["Action"] == "SendMessage"
            assert form["DelaySeconds"] == "0"
            # FIFO dedup: drop duplicates silently, like the queue does
            dedup = form["MessageDeduplicationId"]
            if dedup not in srv.seen:
                srv.seen.add(dedup)
                srv.messages.append(
                    (form["MessageGroupId"], dedup, form["MessageBody"])
                )
            mid = f"msg-{len(srv.messages)}"
            md5 = hashlib.md5(form["MessageBody"].encode()).hexdigest()
        self.send_response(200)
        self.end_headers()
        self.wfile.write(
            (
                "<SendMessageResponse><SendMessageResult>"
                f"<MessageId>{mid}</MessageId>"
                f"<MD5OfMessageBody>{md5}</MD5OfMessageBody>"
                "</SendMessageResult></SendMessageResponse>"
            ).encode()
        )

    def log_message(self, *a):
        pass


def _server(handler):
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    srv.lock = threading.Lock()
    srv.fail_first = 0
    srv.records, srv.messages = [], []
    srv.seen = set()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


@pytest.fixture()
def kinesis_server():
    srv = _server(_KinesisHandler)
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture()
def sqs_server():
    srv = _server(_SqsHandler)
    yield srv
    srv.shutdown()
    srv.server_close()


def _kin(srv, **kw):
    host, port = srv.server_address
    return KinesisPublisher(
        f"http://{host}:{port}",
        "events",
        access_key=_AK,
        secret_key=_SK,
        **kw,
    )


# -- Kinesis semantics ------------------------------------------------

def test_kinesis_put_record_signed_and_acked(kinesis_server):
    pub = _kin(kinesis_server)
    ack = pub.put_record("prefix.public.metrics", b'{"op":"c"}')
    assert ack["SequenceNumber"] == "1001"
    with kinesis_server.lock:
        assert kinesis_server.records == [
            ("events", "prefix.public.metrics", b'{"op":"c"}')
        ]


def test_kinesis_bad_secret_rejected_by_server(kinesis_server):
    host, port = kinesis_server.server_address
    pub = KinesisPublisher(
        f"http://{host}:{port}", "events",
        access_key=_AK, secret_key="wrong", max_retries=0,
    )
    with pytest.raises(AwsDeliveryError, match="AccessDenied"):
        pub.put_record("t", b"x")


def test_kinesis_retries_throttling(kinesis_server):
    kinesis_server.fail_first = 2
    pub = _kin(kinesis_server)
    ack = pub.put_record("t", b"x")
    assert ack["ShardId"].startswith("shardId-")
    with kinesis_server.lock:
        assert len(kinesis_server.records) == 1


def test_kinesis_retry_exhaustion(kinesis_server):
    kinesis_server.fail_first = 10
    pub = _kin(kinesis_server, max_retries=2)
    with pytest.raises(AwsDeliveryError, match="retries exhausted"):
        pub.put_record("t", b"x")


# -- SQS semantics ----------------------------------------------------

def test_sqs_send_message_fifo_contract(sqs_server):
    host, port = sqs_server.server_address
    pub = SqsPublisher(
        f"http://{host}:{port}/123456789/events.fifo",
        access_key=_AK,
        secret_key=_SK,
    )
    body = '{"op":"c","id":1}'
    mid = pub.send_message(body, "prefix.public.t", sqs_dedup_id("7", body))
    assert mid == "msg-1"
    # replaying the SAME (lsn, body) dedupes broker-side
    pub.send_message(body, "prefix.public.t", sqs_dedup_id("7", body))
    with sqs_server.lock:
        assert len(sqs_server.messages) == 1
        group, dedup, got = sqs_server.messages[0]
    assert group == "prefix.public.t" and got == body
    assert dedup == hashlib.sha256(f"7-{body}".encode()).hexdigest().upper()


# -- Spark end-to-end -------------------------------------------------

def test_kinesis_batch_delivery_from_executors(spark, kinesis_server):
    from timescaledb_event_streamer_spark.sinks.encoders import kinesis_shaped

    env = spark.range(12).select(
        F.concat(F.lit("prefix.public.k"), (F.col("id") % 2).cast("string")).alias(
            "topic"
        ),
        F.col("id").alias("lsn"),
        (F.col("id") * 5).alias("v"),
    )
    host, port = kinesis_server.server_address
    kinesis_sink_batch(
        kinesis_shaped(env).repartition(3),
        f"http://{host}:{port}",
        "events",
        access_key=_AK,
        secret_key=_SK,
    )
    with kinesis_server.lock:
        records = list(kinesis_server.records)
    assert len(records) == 12
    for stream, pkey, data in records:
        # one CONFIGURED stream; partition key = topic (awskinesis.go)
        assert stream == "events"
        d = json.loads(data)
        assert pkey.endswith(str(d["lsn"] % 2))
        assert d["v"] == d["lsn"] * 5


def test_sqs_batch_delivery_and_replay_dedupe(spark, sqs_server):
    from timescaledb_event_streamer_spark.sinks.encoders import sqs_shaped

    env = spark.range(9).select(
        F.lit("prefix.public.q").alias("topic"),
        F.col("id").alias("lsn"),
        (F.col("id") + 100).alias("v"),
    )
    host, port = sqs_server.server_address
    url = f"http://{host}:{port}/1234/q.fifo"
    for _ in range(2):  # second delivery = an offset replay: FIFO dedupes
        sqs_sink_batch(
            sqs_shaped(env).repartition(2),
            url,
            access_key=_AK,
            secret_key=_SK,
        )
    with sqs_server.lock:
        msgs = list(sqs_server.messages)
    assert len(msgs) == 9  # not 18: dedup ids match across the replay
    for group, dedup, body in msgs:
        assert group == "prefix.public.q"
        assert dedup == hashlib.sha256(
            f"{json.loads(body)['lsn']}-{body}".encode()
        ).hexdigest().upper()


def test_kinesis_streaming_with_checkpoint(spark, kinesis_server, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    spark.range(6).select(
        F.lit("s").alias("stream"),
        F.lit("pk").alias("partition_key"),
        F.encode(F.to_json(F.struct("id")), "utf-8").alias("data"),
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(
            "stream STRING, partition_key STRING, data BINARY"
        )
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    host, port = kinesis_server.server_address
    for _ in range(2):
        q = (
            kinesis_sink_stream(
                stream,
                f"http://{host}:{port}",
                "events",
                checkpoint_dir=str(tmp_path / "ckpt"),
                access_key=_AK,
                secret_key=_SK,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    with kinesis_server.lock:
        assert len(kinesis_server.records) == 6  # no replay
