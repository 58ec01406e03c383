"""AWS Kinesis + SQS sink delivery loops (H20/H21) — the transports
behind the reference's last two sinks (`internal/eventing/sink/
awskinesis/awskinesis.go`, `awssqs/awssqs.go`), re-expressed the
H15/H17/H18/H19 way: executor-side foreachPartition, synchronous
call per row, failures fail the Spark task (at-least-once via task
retry + checkpoint replay).

Reference semantics carried over exactly:

- Kinesis: PutRecord(StreamName, PartitionKey = topic, Data =
  envelope JSON) — awskinesis.go:141-145; the JSON wire protocol
  (``X-Amz-Target: Kinesis_20131202.PutRecord``, base64 Data,
  ``application/x-amz-json-1.1``).
- SQS FIFO: SendMessage(DelaySeconds=0, MessageBody = envelope,
  MessageGroupId = topic, MessageDeduplicationId = uppercase-hex
  SHA-256 of "<lsn>-<envelope>" or "<lsn>-<txid>-<envelope>") —
  awssqs.go:93-124; the query wire protocol the Go SDK v1 uses
  (form-encoded Action=SendMessage, XML reply).
- Both signed with AWS Signature Version 4, implemented from the
  public specification on stdlib hmac/hashlib and pinned in pytest
  to the documented AWS example vector.
- Retries on 5xx / throttling errors (the SDK default posture),
  immediate failure on other errors.
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import hmac
import json
import time
import urllib.error
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame


class AwsDeliveryError(RuntimeError):
    """Non-retriable AWS error or retry exhaustion — fails the task."""


# -- Signature Version 4 (public spec) --------------------------------

def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sigv4_signature(
    secret_key: str,
    datestamp: str,
    region: str,
    service: str,
    string_to_sign: str,
) -> str:
    k = _hmac(f"AWS4{secret_key}".encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    return hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()


def sigv4_headers(
    method: str,
    url: str,
    *,
    region: str,
    service: str,
    access_key: str,
    secret_key: str,
    body: bytes = b"",
    headers: dict | None = None,
    amzdate: str | None = None,
) -> dict:
    """Sign a request; returns the full header dict including
    Authorization. `amzdate` (YYYYMMDDTHHMMSSZ) is injectable for
    deterministic tests."""
    parsed = urllib.parse.urlsplit(url)
    host = parsed.netloc
    path = parsed.path or "/"
    if amzdate is None:
        amzdate = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ"
        )
    datestamp = amzdate[:8]
    out = dict(headers or {})
    out["Host"] = host
    out["X-Amz-Date"] = amzdate
    # canonical query: sorted, URL-encoded pairs
    q = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
    canonical_qs = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(q)
    )
    lower = {k.lower(): " ".join(v.split()) for k, v in out.items()}
    signed_headers = ";".join(sorted(lower))
    canonical_headers = "".join(
        f"{k}:{lower[k]}\n" for k in sorted(lower)
    )
    payload_hash = hashlib.sha256(body).hexdigest()
    canonical_request = "\n".join(
        [method, path, canonical_qs, canonical_headers, signed_headers,
         payload_hash]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amzdate,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )
    signature = sigv4_signature(
        secret_key, datestamp, region, service, string_to_sign
    )
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    return out


#: error types the SDKs retry (plus any HTTP 5xx)
RETRIABLE_AWS_ERRORS = (
    "ProvisionedThroughputExceededException",
    "ThrottlingException",
    "RequestThrottled",
    "ServiceUnavailable",
    "InternalFailure",
)


def _post_with_retry(
    url: str,
    body: bytes,
    headers: dict,
    *,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    timeout_s: float = 10.0,
) -> bytes:
    last = "no attempt"
    for attempt in range(max_retries + 1):
        req = urllib.request.Request(
            url, data=body, headers=headers, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")
            if e.code >= 500 or any(
                t in detail for t in RETRIABLE_AWS_ERRORS
            ):
                last = f"{e.code}: {detail[:200]}"
                time.sleep(backoff_s * (attempt + 1))
                continue
            raise AwsDeliveryError(f"aws: {e.code}: {detail[:500]}")
        except urllib.error.URLError as e:
            last = f"transport: {e}"
            time.sleep(backoff_s * (attempt + 1))
            continue
    raise AwsDeliveryError(f"aws: retries exhausted (last {last})")


# -- Kinesis -----------------------------------------------------------

class KinesisPublisher:
    """PutRecord per row over the Kinesis JSON protocol."""

    def __init__(
        self,
        endpoint: str,
        stream_name: str,
        *,
        region: str = "us-east-1",
        access_key: str = "",
        secret_key: str = "",
        max_retries: int = 3,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.stream_name = stream_name
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.max_retries = max_retries

    def put_record(self, partition_key: str, data: bytes) -> dict:
        """-> {'SequenceNumber': ..., 'ShardId': ...}."""
        body = json.dumps(
            {
                "StreamName": self.stream_name,
                "PartitionKey": partition_key,
                "Data": base64.b64encode(data).decode(),
            }
        ).encode()
        headers = sigv4_headers(
            "POST",
            self.endpoint + "/",
            region=self.region,
            service="kinesis",
            access_key=self.access_key,
            secret_key=self.secret_key,
            body=body,
            headers={
                "Content-Type": "application/x-amz-json-1.1",
                "X-Amz-Target": "Kinesis_20131202.PutRecord",
            },
        )
        reply = _post_with_retry(
            self.endpoint + "/", body, headers, max_retries=self.max_retries
        )
        return json.loads(reply)


def kinesis_put_rows(rows, endpoint: str, stream_name: str, **opts) -> int:
    """Executor-side partition body for kinesis_shaped frames
    (partition_key, data)."""
    pub = KinesisPublisher(endpoint, stream_name, **opts)
    delivered = 0
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        data = d["data"]
        if isinstance(data, str):
            data = data.encode()
        pub.put_record(d["partition_key"], bytes(data))
        delivered += 1
    return delivered


def kinesis_sink_batch(
    df: DataFrame, endpoint: str, stream_name: str, **opts
) -> None:
    df.foreachPartition(
        lambda rows: kinesis_put_rows(rows, endpoint, stream_name, **opts)
    )


def kinesis_sink_stream(
    df: DataFrame,
    endpoint: str,
    stream_name: str,
    *,
    checkpoint_dir: str | None = None,
    query_name: str = "kinesis_sink",
    **opts,
):
    writer = (
        df.writeStream.queryName(query_name)
        .foreachBatch(
            lambda b, _id: kinesis_sink_batch(b, endpoint, stream_name, **opts)
        )
        .outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


# -- SQS ---------------------------------------------------------------

def sqs_dedup_id(lsn: str, envelope: str, txid: int | None = None) -> str:
    """awssqs.go:100-116: uppercase-hex SHA-256 of
    '<lsn>-<envelope>' (or '<lsn>-<txid>-<envelope>')."""
    if txid is not None:
        content = f"{lsn}-{txid}-{envelope}"
    else:
        content = f"{lsn}-{envelope}"
    return hashlib.sha256(content.encode()).hexdigest().upper()


class SqsPublisher:
    """SendMessage per row over the SQS query protocol."""

    def __init__(
        self,
        queue_url: str,
        *,
        region: str = "us-east-1",
        access_key: str = "",
        secret_key: str = "",
        max_retries: int = 3,
    ) -> None:
        self.queue_url = queue_url
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.max_retries = max_retries

    def send_message(
        self, body: str, group_id: str, dedup_id: str
    ) -> str:
        """-> the MessageId from the XML reply; verifies the returned
        MD5OfMessageBody (the SDK's response integrity check)."""
        form = urllib.parse.urlencode(
            {
                "Action": "SendMessage",
                "Version": "2012-11-05",
                "DelaySeconds": "0",
                "MessageBody": body,
                "MessageGroupId": group_id,
                "MessageDeduplicationId": dedup_id,
            }
        ).encode()
        headers = sigv4_headers(
            "POST",
            self.queue_url,
            region=self.region,
            service="sqs",
            access_key=self.access_key,
            secret_key=self.secret_key,
            body=form,
            headers={
                "Content-Type": "application/x-www-form-urlencoded",
            },
        )
        reply = _post_with_retry(
            self.queue_url, form, headers, max_retries=self.max_retries
        ).decode()
        mid = _xml_field(reply, "MessageId")
        md5 = _xml_field(reply, "MD5OfMessageBody")
        if md5 and md5 != hashlib.md5(body.encode()).hexdigest():
            raise AwsDeliveryError("sqs: MD5OfMessageBody mismatch")
        if not mid:
            raise AwsDeliveryError(f"sqs: no MessageId in reply {reply[:200]}")
        return mid


def _xml_field(xml: str, tag: str) -> str | None:
    open_t, close_t = f"<{tag}>", f"</{tag}>"
    if open_t not in xml:
        return None
    start = xml.index(open_t) + len(open_t)
    return xml[start : xml.index(close_t, start)]


def sqs_send_rows(rows, queue_url: str, **opts) -> int:
    """Executor-side partition body for sqs_shaped (H7) frames
    (message_group_id, message_deduplication_id, message_body)."""
    pub = SqsPublisher(queue_url, **opts)
    delivered = 0
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        pub.send_message(
            d["message_body"],
            d["message_group_id"],
            d["message_deduplication_id"],
        )
        delivered += 1
    return delivered


def sqs_sink_batch(df: DataFrame, queue_url: str, **opts) -> None:
    df.foreachPartition(lambda rows: sqs_send_rows(rows, queue_url, **opts))


def sqs_sink_stream(
    df: DataFrame,
    queue_url: str,
    *,
    checkpoint_dir: str | None = None,
    query_name: str = "sqs_sink",
    **opts,
):
    writer = (
        df.writeStream.queryName(query_name)
        .foreachBatch(lambda b, _id: sqs_sink_batch(b, queue_url, **opts))
        .outputMode("append")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
