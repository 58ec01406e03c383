"""CDC envelope / catalog semantics (reference spi/schema/eventschema.go,
internal/systemcatalog)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from timescaledb_event_streamer_spark.catalog.chunks import (
    CHUNK_INTERVAL_S,
    chunk_catalog,
    resolve_chunks,
)
from timescaledb_event_streamer_spark.cdc.envelope import read_envelope, stream_envelope
from timescaledb_event_streamer_spark.sources.tables import load


@pytest.fixture(scope="module")
def events(spark, sf_small):
    return load(spark, sf_small, "events")


def test_read_envelope_is_all_reads(events):
    env = read_envelope(events)
    ops = [r["op"] for r in env.select("op").distinct().collect()]
    assert ops == ["r"]
    assert env.count() == events.count()


def test_read_envelope_topic_format(events):
    row = read_envelope(events).select("topic", "source_table").first()
    assert row["topic"] == f"timescaledb.public.{row['source_table']}"


def test_stream_envelope_ops_cover_cud(events):
    env = stream_envelope(events)
    ops = {r["op"] for r in env.select("op").distinct().collect()}
    assert ops == {"c", "u", "d"}


def test_stream_envelope_delete_has_no_after_image(events):
    env = stream_envelope(events, replica_identity="FULL")
    bad = env.filter((F.col("op") == "d") & F.col("after_value").isNotNull()).count()
    assert bad == 0


def test_stream_envelope_full_vs_default_before_image(events):
    full = stream_envelope(events, replica_identity="FULL")
    # under FULL, an update whose key has a prior version carries it
    n_before = full.filter((F.col("op") == "u") & F.col("before_value").isNotNull()).count()
    assert n_before > 0
    default = stream_envelope(events, replica_identity="DEFAULT")
    assert (
        default.filter(F.col("before_value").isNotNull()).count() == 0
    ), "DEFAULT replica identity must not carry non-key before image"


def test_stream_envelope_rejects_unknown_identity(events):
    with pytest.raises(ValueError):
        stream_envelope(events, replica_identity="BOGUS")


def test_chunk_catalog_ranges_are_aligned(events):
    cat = chunk_catalog(events).collect()
    for row in cat:
        assert row["range_start_s"] % CHUNK_INTERVAL_S == 0
        assert row["range_end_s"] - row["range_start_s"] == CHUNK_INTERVAL_S
        assert row["chunk_name"] == (
            f"_hyper_{row['hypertable_id']}_{row['chunk_id']}_chunk"
        )


def test_chunk_resolution_covers_every_event(events):
    cat = chunk_catalog(events)
    resolved = resolve_chunks(events, cat)
    assert resolved.count() == events.count()
    # each event lands inside its chunk's range
    bad = resolved.filter(
        ~(
            (F.unix_timestamp("ts") >= F.col("range_start_s"))
            & (F.unix_timestamp("ts") < F.col("range_end_s"))
        )
    ).count()
    assert bad == 0


def test_chunk_resolution_plan_broadcasts_catalog(events):
    cat = chunk_catalog(events)
    plan = resolve_chunks(events, cat)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_composite_and_array_columns_roundtrip(events):
    """J2: PG composite/array types map to Spark struct/array columns
    (spi/pgtypes/compositecolumn.go, enhanced_array_text_codec.go)."""
    df = events.select(
        F.struct(
            F.lit("public").alias("schema"), F.col("event_type").alias("table")
        ).alias("source"),
        F.split(F.col("props"), ",").alias("props_parts"),
        F.array(F.col("value"), F.col("value") * 2).alias("value_arr"),
    )
    types = dict(df.dtypes)
    assert types["source"].startswith("struct<")
    assert types["props_parts"] == "array<string>"
    row = df.first()
    assert row["source"]["schema"] == "public"
    assert row["value_arr"][1] == row["value_arr"][0] * 2
