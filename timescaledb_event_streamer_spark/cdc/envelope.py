"""Debezium-style CDC event envelopes, Spark-first.

Reference parity: spi/schema/eventschema.go — envelope fields
``before/after/op/source/ts_ms`` (schemamodel.go:50-55), operations
``r c u d t m $`` (eventschema.go:37-43) plus timescale
compression/decompression sub-ops (eventschema.go:49-50). ReadEvent/
CreateEvent/UpdateEvent/DeleteEvent builders are eventschema.go:53-117.

The driver testdata's `events` table stands in for the decoded WAL:
``event_id`` is the LSN (commit order), ``event_type`` the relation,
``user_id`` the replica-identity key, ``value``/``props`` the row
payload. Where the reference decodes a binary WAL record per row, we
derive the operation deterministically from the LSN so the oracle
can reproduce it: lsn % 10 == 0 -> delete, in (1,2) -> update,
else -> insert. Everything is built from JVM-side column expressions
— no Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.catalog.naming import DEFAULT_PREFIX, event_topic

OP_READ = "r"
OP_CREATE = "c"
OP_UPDATE = "u"
OP_DELETE = "d"
OP_TRUNCATE = "t"
OP_MESSAGE = "m"
OP_TIMESCALE = "$"

SOURCE_SCHEMA = "public"


def ts_ms(ts: Column) -> Column:
    """Event timestamp in epoch milliseconds (envelope ``ts_ms``)."""
    return F.floor(F.unix_micros(ts) / F.lit(1000)).cast("long")


def derive_op(lsn: Column) -> Column:
    """Deterministic op for the simulated transaction log (see module doc)."""
    m = F.pmod(lsn, F.lit(10))
    return (
        F.when(m == 0, F.lit(OP_DELETE))
        .when(m.isin(1, 2), F.lit(OP_UPDATE))
        .otherwise(F.lit(OP_CREATE))
    )


def _source_columns(events: DataFrame) -> list[Column]:
    return [
        F.lit(SOURCE_SCHEMA).alias("source_schema"),
        F.col("event_type").alias("source_table"),
        F.col("event_id").alias("lsn"),
        ts_ms(F.col("ts")).alias("ts_ms"),
    ]


def read_envelope(events: DataFrame, prefix: str = DEFAULT_PREFIX) -> DataFrame:
    """Initial-snapshot envelope: every row surfaces as ``op='r'``
    with only an after-image (reference eventschema.go:53-66)."""
    return events.select(
        event_topic(F.lit(SOURCE_SCHEMA), F.col("event_type"), prefix).alias("topic"),
        F.lit(OP_READ).alias("op"),
        *_source_columns(events),
        F.col("user_id").alias("key_user_id"),
        F.col("value").alias("after_value"),
        F.col("props").alias("after_props"),
    )


def stream_envelope(
    events: DataFrame,
    prefix: str = DEFAULT_PREFIX,
    replica_identity: str = "FULL",
) -> DataFrame:
    """Streaming-phase envelope with before/after images.

    The before image of an update/delete is the previous row version
    of the same key in the same relation (reference keeps this via
    replica identity; spi/pgtypes/replicaidentity.go). With replica
    identity DEFAULT only key columns survive in ``before``; FULL
    keeps the whole old row; NOTHING drops the before image.

    The lag window shuffles by (relation, key) — at scale that is a
    hash-partitioned exchange over the natural stream key, the same
    layout a keyed changelog topic would have.
    """
    w = Window.partitionBy("event_type", "user_id").orderBy("event_id")
    op = derive_op(F.col("event_id"))
    prev_value = F.lag("value").over(w)
    prev_props = F.lag("props").over(w)
    has_before = op.isin(OP_UPDATE, OP_DELETE)
    if replica_identity == "FULL":
        before_value = F.when(has_before, prev_value)
        before_props = F.when(has_before, prev_props)
    elif replica_identity == "DEFAULT":
        before_value = F.lit(None).cast("double")
        before_props = F.lit(None).cast("string")
    elif replica_identity == "NOTHING":
        before_value = F.lit(None).cast("double")
        before_props = F.lit(None).cast("string")
    else:
        raise ValueError(f"unsupported replica identity {replica_identity!r}")
    is_delete = op == OP_DELETE
    return events.select(
        event_topic(F.lit(SOURCE_SCHEMA), F.col("event_type"), prefix).alias("topic"),
        op.alias("op"),
        *_source_columns(events),
        F.col("user_id").alias("key_user_id"),
        before_value.alias("before_value"),
        before_props.alias("before_props"),
        F.when(~is_delete, F.col("value")).alias("after_value"),
        F.when(~is_delete, F.col("props")).alias("after_props"),
    )
