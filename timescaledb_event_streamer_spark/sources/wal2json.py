"""wal2json v2 logical-decoding parser.

The reference consumes PostgreSQL logical replication via the binary
`pgoutput` plugin (replicationconnection.go:36) and hand-decodes
tuples (typemanager/decoderplan.go). The Spark-first equivalent is
the JSON representation every managed Postgres exposes — wal2json
format-version 2: one JSON document per change, `action` I/U/D/T/B/C
/M, `columns` (new image), `identity` (old image for U/D under
replica identity), string LSNs like `0/16B2B68`.

`parse_wal2json` turns a DataFrame with a JSON string column — a
Kafka value stream, a file stream, or a batch read — into the same
Debezium-style envelope the rest of the engine speaks
(cdc/envelope.py). Everything is `from_json` + codegen expressions,
so the parser runs identically under batch and Structured Streaming
and stays JVM-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# column entries: value arrives as its JSON literal; from_json coerces
# scalars to string, typed conversion is pg_type_conversion's job
_COLS_TYPE = ArrayType(
    StructType(
        [
            StructField("name", StringType()),
            StructField("type", StringType()),
            StructField("value", StringType()),
        ]
    )
)

WAL2JSON_SCHEMA = StructType(
    [
        StructField("action", StringType()),
        StructField("schema", StringType()),
        StructField("table", StringType()),
        StructField("lsn", StringType()),
        StructField("timestamp", StringType()),
        StructField("xid", LongType()),
        StructField("columns", _COLS_TYPE),
        StructField("identity", _COLS_TYPE),
        StructField("pk", _COLS_TYPE),
        StructField("prefix", StringType()),  # logical decoding messages
        StructField("content", StringType()),
    ]
)

# wal2json action -> reference envelope op (spi/schema/eventschema.go)
_ACTION_TO_OP = {"I": "c", "U": "u", "D": "d", "T": "t", "M": "m"}


def lsn_to_long(lsn: Column) -> Column:
    """'X/Y' hex LSN -> 64-bit integer (hi<<32 | lo), the ordering
    key the reference tracks per table (spi/statestorage). The ONE
    canonical LSN-text parser — sources/pg_replication.lsn_from_text
    delegates here.

    shift/or, not multiply/add: the top bit of a real LSN would
    overflow a signed-long multiply under ANSI mode. try_cast so a
    malformed half (torn wire input) decodes NULL instead of killing
    the query."""
    parts = F.split(lsn, "/")
    # F.get, not [..]: a slash-less/torn LSN text must decode NULL —
    # under ANSI mode a plain index would abort the whole query on the
    # first malformed row (found by the restart-skip replay test)
    return F.shiftleft(F.conv(F.get(parts, 0), 16, 10).try_cast("long"), 32).bitwiseOR(
        F.conv(F.get(parts, 1), 16, 10).try_cast("long")
    )


def _image(cols: Column) -> Column:
    return F.map_from_entries(
        F.transform(cols, lambda c: F.struct(c["name"].alias("key"), c["value"].alias("value")))
    )


def parse_wal2json(
    lines: DataFrame, json_col: str = "value", topic_prefix: str = "timescaledb"
) -> DataFrame:
    """Parse wal2json v2 documents into the engine's CDC envelope:
    (topic, op, source_schema, source_table, lsn, ts_ms, xid,
    before, after, message_prefix, message_content).

    Transaction markers (B/C) are dropped — commit grouping is the
    transaction tracker's job and xid is carried on every row.
    """
    rec = F.from_json(F.col(json_col), WAL2JSON_SCHEMA)
    parsed = lines.select(rec.alias("r")).select("r.*")
    data = parsed.filter(F.col("action").isin(*_ACTION_TO_OP.keys()))
    op = F.element_at(
        F.create_map(
            *[x for kv in _ACTION_TO_OP.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        ),
        F.col("action"),
    )
    return data.select(
        F.concat_ws(
            ".", F.lit(topic_prefix), F.col("schema"), F.coalesce("table", F.lit("$messages"))
        ).alias("topic"),
        op.alias("op"),
        F.col("schema").alias("source_schema"),
        F.col("table").alias("source_table"),
        lsn_to_long(F.col("lsn")).alias("lsn"),
        (F.unix_micros(F.to_timestamp("timestamp")) / 1000).cast("long").alias("ts_ms"),
        "xid",
        F.when(F.col("action").isin("U", "D"), _image(F.col("identity"))).alias("before"),
        F.when(F.col("action").isin("I", "U"), _image(F.col("columns"))).alias("after"),
        F.col("prefix").alias("message_prefix"),
        F.col("content").alias("message_content"),
    )


def synthesize_wal2json(events: DataFrame) -> DataFrame:
    """Render the simulated transaction log (`events` table) as
    wal2json v2 documents — the test/round-trip generator. op
    derivation matches cdc/envelope.py; LSN is formatted as the
    canonical 'hi/lo' hex pair so parsing is exercised for real."""
    from timescaledb_event_streamer_spark.cdc.envelope import derive_op

    op = derive_op(F.col("event_id"))
    action = (
        F.when(op == "c", F.lit("I")).when(op == "u", F.lit("U")).otherwise(F.lit("D"))
    )
    lsn_hex = F.concat_ws(
        "/",
        F.upper(F.hex(F.shiftright(F.col("event_id"), 32))),
        F.upper(F.hex(F.col("event_id").bitwiseAND(F.lit(4294967295)))),
    )
    col = lambda name, typ, val: F.struct(  # noqa: E731
        F.lit(name).alias("name"), F.lit(typ).alias("type"), val.cast("string").alias("value")
    )
    new_image = F.array(
        col("user_id", "bigint", F.col("user_id")),
        col("value", "double precision", F.col("value")),
        col("props", "text", F.col("props")),
    )
    key_image = F.array(col("user_id", "bigint", F.col("user_id")))
    doc = F.to_json(
        F.struct(
            action.alias("action"),
            F.lit("public").alias("schema"),
            F.col("event_type").alias("table"),
            lsn_hex.alias("lsn"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS+00").alias("timestamp"),
            F.floor(F.col("event_id") / 100).cast("long").alias("xid"),
            F.when(action.isin("I", "U"), new_image).alias("columns"),
            F.when(action.isin("U", "D"), key_image).alias("identity"),
        ),
        {"ignoreNullFields": "true"},
    )
    return events.select(doc.alias("value"))
