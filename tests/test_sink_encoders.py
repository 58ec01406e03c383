"""Per-sink wire-contract tests (SURVEY.md §2.H7): the encoders must
produce the reference sinks' identity/partitioning fields from the
same envelope, deterministically."""

from __future__ import annotations

import hashlib
import json

from timescaledb_event_streamer_spark.cdc.envelope import read_envelope
from timescaledb_event_streamer_spark.sinks.encoders import (
    http_shaped,
    kinesis_shaped,
    nats_shaped,
    redis_shaped,
    sqs_shaped,
)
from timescaledb_event_streamer_spark.sources.tables import load


def _env(spark, sf_small):
    return read_envelope(load(spark, sf_small, "events").limit(50))


def test_kinesis_partition_key_is_topic(spark, sf_small):
    rows = kinesis_shaped(_env(spark, sf_small)).collect()
    assert rows
    for r in rows:
        assert r["partition_key"] == r["stream"]
        assert r["stream"].startswith("timescaledb.public.")
        payload = json.loads(bytes(r["data"]).decode())
        assert payload["op"] == "r"


def test_sqs_dedup_id_is_sha256_of_lsn_and_body(spark, sf_small):
    rows = sqs_shaped(_env(spark, sf_small)).collect()
    assert rows
    for r in rows[:10]:
        body = r["message_body"]
        want = hashlib.sha256(
            f"{json.loads(body)['lsn']}-{body}".encode()
        ).hexdigest().upper()
        assert r["message_deduplication_id"] == want
    # replay => identical dedup ids (broker-side exactly-once)
    again = sqs_shaped(_env(spark, sf_small)).collect()
    assert {r["message_deduplication_id"] for r in rows} == {
        r["message_deduplication_id"] for r in again
    }


def test_nats_subject_routing(spark, sf_small):
    rows = nats_shaped(_env(spark, sf_small)).collect()
    assert {r["subject"] for r in rows} <= {
        f"timescaledb.public.{t}" for t in ("click", "view", "purchase", "signup", "error")
    }


def test_redis_xadd_fields(spark, sf_small):
    rows = redis_shaped(_env(spark, sf_small)).collect()
    for r in rows[:10]:
        key = json.loads(r["key"])
        env = json.loads(r["envelope"])
        assert key["key_user_id"] == env["key_user_id"]
        assert r["stream"].startswith("timescaledb.public.")


def test_http_post_rows(spark, sf_small):
    rows = http_shaped(_env(spark, sf_small), url="https://example.invalid/cdc").collect()
    for r in rows[:5]:
        assert r["method"] == "POST"
        assert r["content_type"] == "application/json"
        assert json.loads(r["body"])["op"] == "r"


def test_encoders_stay_codegen(spark, sf_small):
    # no Python row UDFs: the encoders must be pure JVM expressions
    for enc in (kinesis_shaped, sqs_shaped, nats_shaped, redis_shaped):
        plan = enc(_env(spark, sf_small))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
