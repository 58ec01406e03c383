"""CDC coverage, part 2 (SURVEY.md §2.A9-A14 + §2.J1): replica
identity, tombstones, offset tracking, message events, compression
markers, key extraction, and PG type conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.catalog.chunks import CHUNK_INTERVAL_S
from timescaledb_event_streamer_spark.catalog.naming import event_topic, message_topic
from timescaledb_event_streamer_spark.cdc.envelope import (
    OP_DELETE,
    derive_op,
    stream_envelope,
    ts_ms,
)
from timescaledb_event_streamer_spark.plans.queries_cdc import (
    _SQL_CHUNK_START,
    _SQL_OP,
    _SQL_TS_MS,
)
from timescaledb_event_streamer_spark.caching import scoped_persist
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load


@register(
    "cdc_replica_identity",
    family="cdc",
    doc="Replica-identity matrix: per (table, op), how many events carry a "
    "before image under DEFAULT identity (only key cols; pgtypes/replicaidentity.go)",
    oracle=f"""
        WITH env AS (SELECT *, {_SQL_OP} AS op FROM events)
        SELECT event_type AS source_table,
               op,
               count(*) AS n,
               CAST(0 AS BIGINT) AS n_before_images,
               CAST(sum(CASE WHEN op <> 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_after_images
        FROM env
        GROUP BY 1, 2
    """,
)
def cdc_replica_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = stream_envelope(load(spark, sf_dir, "events"), replica_identity="DEFAULT")
    return env.groupBy("source_table", "op").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("before_value").isNotNull(), 1).otherwise(0)).alias(
            "n_before_images"
        ),
        F.sum(F.when(F.col("after_value").isNotNull(), 1).otherwise(0)).alias(
            "n_after_images"
        ),
    )


@register(
    "cdc_tombstones",
    family="cdc",
    doc="Delete events followed by tombstones (key-only, null payload) for "
    "log-compacted sinks (eventemitter.go delete+tombstone emission)",
    oracle=f"""
        WITH env AS (SELECT *, {_SQL_OP} AS op FROM events WHERE {_SQL_OP} = 'd')
        SELECT 'timescaledb.public.' || event_type AS topic,
               event_id AS lsn,
               user_id AS key_user_id,
               false AS is_tombstone,
               'd' AS op
        FROM env
        UNION ALL
        SELECT 'timescaledb.public.' || event_type AS topic,
               event_id AS lsn,
               user_id AS key_user_id,
               true AS is_tombstone,
               NULL AS op
        FROM env
    """,
)
def cdc_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    dels = events.withColumn("op", derive_op(F.col("event_id"))).filter(
        F.col("op") == OP_DELETE
    )
    base = dels.select(
        event_topic(F.lit("public"), F.col("event_type")).alias("topic"),
        F.col("event_id").alias("lsn"),
        F.col("user_id").alias("key_user_id"),
    )
    delete_rows = base.select(
        "topic", "lsn", "key_user_id", F.lit(False).alias("is_tombstone"), F.lit("d").alias("op")
    )
    tombstone_rows = base.select(
        "topic",
        "lsn",
        "key_user_id",
        F.lit(True).alias("is_tombstone"),
        F.lit(None).cast("string").alias("op"),
    )
    return delete_rows.unionByName(tombstone_rows)


@register(
    "cdc_offset_tracking",
    family="cdc",
    doc="State-storage offsets: per topic, the restart position "
    "(spi/statestorage, offsets per table)",
    oracle=f"""
        SELECT 'timescaledb.public.' || event_type AS topic,
               max(event_id) AS last_lsn,
               max({_SQL_TS_MS}) AS last_ts_ms,
               count(*) AS n_processed,
               max(event_id) = (SELECT max(event_id) FROM events) AS is_head
        FROM events
        GROUP BY 1
    """,
)
def cdc_offset_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    per_topic = events.groupBy(
        event_topic(F.lit("public"), F.col("event_type")).alias("topic")
    ).agg(
        F.max("event_id").alias("last_lsn"),
        F.max(ts_ms(F.col("ts"))).alias("last_ts_ms"),
        F.count(F.lit(1)).alias("n_processed"),
    )
    # The global head is the max over the topic-grain aggregate — a
    # tiny re-aggregation broadcast back in, so `events` is scanned
    # exactly once (no driver collect, no second 100 TB pass).
    head = per_topic.agg(F.max("last_lsn").alias("head_lsn"))
    return per_topic.crossJoin(F.broadcast(head)).select(
        "topic",
        "last_lsn",
        "last_ts_ms",
        "n_processed",
        (F.col("last_lsn") == F.col("head_lsn")).alias("is_head"),
    )


@register(
    "cdc_message_events",
    family="cdc",
    doc="Logical decoding message events (op='m') routed to the message topic "
    "(eventschema.go:132-144, namegenerator.go MessageTopicName)",
    oracle=f"""
        SELECT 'timescaledb.message' AS topic,
               'm' AS op,
               event_id AS lsn,
               {_SQL_TS_MS} AS ts_ms,
               'wal_message' AS prefix,
               props AS content
        FROM events
        WHERE event_id % 100 = 0
    """,
)
def cdc_message_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.filter(F.pmod(F.col("event_id"), F.lit(100)) == 0).select(
        message_topic().alias("topic"),
        F.lit("m").alias("op"),
        F.col("event_id").alias("lsn"),
        ts_ms(F.col("ts")).alias("ts_ms"),
        F.lit("wal_message").alias("prefix"),
        F.col("props").alias("content"),
    )


@register(
    "cdc_compression_markers",
    family="cdc",
    doc="Timescale compression events (op='$', tsop='c') for chunks older than "
    "the compress-after horizon (eventschema.go:152-178)",
    oracle=f"""
        WITH keyed AS (
            SELECT event_type, {_SQL_CHUNK_START} AS range_start_s, {_SQL_TS_MS} AS tms
            FROM events
        ),
        horizon AS (
            SELECT max(range_start_s) AS head_chunk FROM keyed
        ),
        chunks AS (
            SELECT event_type AS hypertable_name,
                   range_start_s,
                   max(tms) AS last_ts_ms,
                   count(*) AS n_rows
            FROM keyed
            GROUP BY 1, 2
        )
        SELECT hypertable_name,
               range_start_s,
               '$' AS op,
               'c' AS tsop,
               last_ts_ms,
               n_rows
        FROM chunks, horizon
        WHERE range_start_s < head_chunk - {CHUNK_INTERVAL_S}
    """,
)
def cdc_compression_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.catalog.chunks import chunk_start_epoch

    events = load(spark, sf_dir, "events")
    keyed = events.select(
        "event_type",
        chunk_start_epoch(F.col("ts")).alias("range_start_s"),
        ts_ms(F.col("ts")).alias("tms"),
    )
    chunks = keyed.groupBy(
        F.col("event_type").alias("hypertable_name"), "range_start_s"
    ).agg(F.max("tms").alias("last_ts_ms"), F.count(F.lit(1)).alias("n_rows"))
    # Compress-after horizon from the chunk-grain aggregate itself
    # (metadata-sized), broadcast back in: one events scan total.
    head = chunks.agg(F.max("range_start_s").alias("head_chunk"))
    return chunks.crossJoin(F.broadcast(head)).filter(
        F.col("range_start_s") < F.col("head_chunk") - CHUNK_INTERVAL_S
    ).select(
        "hypertable_name",
        "range_start_s",
        F.lit("$").alias("op"),
        F.lit("c").alias("tsop"),
        "last_ts_ms",
        "n_rows",
    )


# multiplicative (Knuth) hash — deterministic and expressible in both
# engines, standing in for the sink's key-hash partitioner
_KNUTH = 2654435761
_PARTITIONS = 16


@register(
    "cdc_key_extraction",
    family="cdc",
    doc="Message key extraction + sink partition assignment "
    "(eventschema.go:180 MessageKey; kafka key-hash partitioning)",
    oracle=f"""
        SELECT DISTINCT
               'timescaledb.public.' || event_type AS topic,
               user_id AS key_user_id,
               (user_id * {_KNUTH}) % 2147483648 % {_PARTITIONS} AS sink_partition
        FROM events
    """,
)
def cdc_key_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.select(
        event_topic(F.lit("public"), F.col("event_type")).alias("topic"),
        F.col("user_id").alias("key_user_id"),
        (
            F.pmod(F.pmod(F.col("user_id") * _KNUTH, F.lit(2147483648)), F.lit(_PARTITIONS))
        ).alias("sink_partition"),
    ).distinct()


@register(
    "pg_type_conversion",
    family="pgtypes",
    doc="PG wire-text -> typed column conversion (spi/pgtypes/typemanager.go): "
    "json field extraction, date formatting, numeric scaling",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0 AS k_is_even,
               strftime(ts, '%Y-%m-%d') AS event_date,
               CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM events
    """,
)
def pg_type_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.select(
        "event_id",
        k.alias("props_k"),
        (F.pmod(k, F.lit(2)) == 0).alias("k_is_even"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )


@register(
    "pg_range_point_types",
    family="pgtypes",
    doc="PG range + geometric wire-text parsing (spi/pgtypes: int8range, "
    "point): round-trip a range literal built from each event's value "
    "band and a point literal from (user_id, value) — parse back to "
    "typed bounds/coords with containment + distance semantics, all "
    "codegen string ops.",
    oracle="""
        WITH w AS (
            SELECT event_id,
                   '[' || CAST(CAST(floor(value / 10) * 10 AS BIGINT) AS VARCHAR)
                       || ',' || CAST(CAST(floor(value / 10) * 10 + 10 AS BIGINT) AS VARCHAR)
                       || ')' AS range_text,
                   '(' || CAST(user_id AS VARCHAR) || ','
                       || CAST(CAST(round(value, 0) AS BIGINT) AS VARCHAR) || ')' AS point_text,
                   value, user_id
            FROM events
        )
        SELECT event_id,
               range_text,
               CAST(regexp_extract(range_text, '^\\[(-?\\d+),', 1) AS BIGINT) AS range_lo,
               CAST(regexp_extract(range_text, ',(-?\\d+)\\)$', 1) AS BIGINT) AS range_hi,
               value >= CAST(regexp_extract(range_text, '^\\[(-?\\d+),', 1) AS BIGINT)
                 AND value < CAST(regexp_extract(range_text, ',(-?\\d+)\\)$', 1) AS BIGINT)
                 AS range_contains_value,
               CAST(regexp_extract(point_text, '^\\((-?\\d+),', 1) AS BIGINT) AS point_x,
               CAST(regexp_extract(point_text, ',(-?\\d+)\\)$', 1) AS BIGINT) AS point_y
        FROM w
    """,
)
def pg_range_point_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    lo = (F.floor(F.col("value") / 10) * 10).cast("long")
    range_text = F.concat(
        F.lit("["), lo.cast("string"), F.lit(","), (lo + 10).cast("string"), F.lit(")")
    )
    point_text = F.concat(
        F.lit("("),
        F.col("user_id").cast("string"),
        F.lit(","),
        F.round(F.col("value"), 0).cast("long").cast("string"),
        F.lit(")"),
    )
    w = events.select("event_id", "value", "user_id",
                      range_text.alias("range_text"), point_text.alias("point_text"))
    r_lo = F.regexp_extract("range_text", r"^\[(-?\d+),", 1).cast("long")
    r_hi = F.regexp_extract("range_text", r",(-?\d+)\)$", 1).cast("long")
    return w.select(
        "event_id",
        "range_text",
        r_lo.alias("range_lo"),
        r_hi.alias("range_hi"),
        ((F.col("value") >= r_lo) & (F.col("value") < r_hi)).alias("range_contains_value"),
        F.regexp_extract("point_text", r"^\((-?\d+),", 1).cast("long").alias("point_x"),
        F.regexp_extract("point_text", r",(-?\d+)\)$", 1).cast("long").alias("point_y"),
    )


@register(
    "cdc_toast_backfill",
    family="cdc",
    doc="Unchanged-TOAST reconstruction: logical replication omits a "
    "TOASTed column from an UPDATE tuple when it did not change "
    "(decoderplan.go:57-59 leaves the value unset), so the full "
    "after-image is rebuilt by carrying the last transmitted value "
    "forward per key in LSN order. Simulated here with `props` as the "
    "toasted column, omitted on every op='u'. One window per "
    "(table, key) partition -- a single shuffle on the key, no join; "
    "the standard per-key LOCF pass at scale.",
    oracle=f"""
        WITH env AS (SELECT *, {_SQL_OP} AS op FROM events),
        t AS (
            SELECT event_type AS source_table,
                   user_id AS key_user_id,
                   event_id AS lsn,
                   op,
                   value AS after_value,
                   CASE WHEN op <> 'u' THEN props END AS wire_props,
                   op = 'u' AS was_toasted
            FROM env WHERE op <> 'd'
        )
        SELECT source_table, key_user_id, lsn, op, after_value,
               last_value(wire_props IGNORE NULLS) OVER (
                   PARTITION BY source_table, key_user_id ORDER BY lsn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS after_props,
               was_toasted
        FROM t
    """,
)
def cdc_toast_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").withColumn("op", derive_op(F.col("event_id")))
    w = (
        Window.partitionBy("event_type", "user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wire_props = F.when(F.col("op") != "u", F.col("props"))
    return ev.filter(F.col("op") != OP_DELETE).select(
        F.col("event_type").alias("source_table"),
        F.col("user_id").alias("key_user_id"),
        F.col("event_id").alias("lsn"),
        "op",
        F.col("value").alias("after_value"),
        F.last(wire_props, ignorenulls=True).over(w).alias("after_props"),
        (F.col("op") == "u").alias("was_toasted"),
    )


@register(
    "pg_ltree_ops",
    family="pgtypes",
    doc="PG ltree wire-text semantics (spi/pgtypes/ltree.go): label "
    "paths built per event, then nlevel, subpath(0,2), leaf label and "
    "ancestor containment ('root.click' @> path) -- all codegen "
    "string ops, no shuffle.",
    oracle="""
        WITH w AS (
            SELECT event_id,
                   'root.' || event_type || '.u' || CAST(user_id % 10 AS VARCHAR)
                       || '.e' || CAST(event_id % 5 AS VARCHAR) AS path
            FROM events
        )
        SELECT event_id,
               path,
               CAST(len(string_split(path, '.')) AS INT) AS nlevel,
               array_to_string(string_split(path, '.')[1:2], '.') AS subpath_0_2,
               regexp_extract(path, '([^.]+)$', 1) AS leaf,
               path LIKE 'root.click.%' AS under_click
        FROM w
    """,
)
def pg_ltree_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    path = F.concat(
        F.lit("root."),
        F.col("event_type"),
        F.lit(".u"),
        F.pmod(F.col("user_id"), F.lit(10)).cast("string"),
        F.lit(".e"),
        F.pmod(F.col("event_id"), F.lit(5)).cast("string"),
    )
    w = events.select("event_id", path.alias("path"))
    labels = F.split("path", r"\.")
    return w.select(
        "event_id",
        "path",
        F.size(labels).alias("nlevel"),
        F.concat_ws(".", F.slice(labels, 1, 2)).alias("subpath_0_2"),
        F.regexp_extract("path", r"([^.]+)$", 1).alias("leaf"),
        F.col("path").like("root.click.%").alias("under_click"),
    )


@register(
    "pg_array_text_codec",
    family="pgtypes",
    doc="PG array wire-text codec (spi/pgtypes/enhanced_array_text_"
    "codec.go): '{a,b,c}' literals parsed back into typed arrays with "
    "cardinality and element aggregates -- brace strip + split + cast "
    "in one codegen projection.",
    oracle="""
        WITH w AS (
            SELECT event_id,
                   '{' || CAST(user_id AS VARCHAR)
                       || ',' || CAST(event_id % 100 AS VARCHAR)
                       || ',' || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                       || '}' AS arr_text
            FROM events
        ),
        p AS (
            SELECT event_id, arr_text,
                   list_transform(string_split(trim(arr_text, '{}'), ','),
                                  x -> CAST(x AS BIGINT)) AS arr
            FROM w
        )
        SELECT event_id, arr_text,
               CAST(len(arr) AS INT) AS cardinality,
               arr[1] AS first_elem,
               CAST(list_aggregate(arr, 'sum') AS BIGINT) AS elem_sum
        FROM p
    """,
)
def pg_array_text_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    arr_text = F.concat(
        F.lit("{"),
        F.col("user_id").cast("string"),
        F.lit(","),
        F.pmod(F.col("event_id"), F.lit(100)).cast("string"),
        F.lit(","),
        F.floor("value").cast("long").cast("string"),
        F.lit("}"),
    )
    w = events.select("event_id", arr_text.alias("arr_text"))
    arr = F.transform(
        F.split(F.regexp_replace("arr_text", r"^\{|\}$", ""), ","),
        lambda x: x.cast("long"),
    )
    p = w.select("event_id", "arr_text", arr.alias("arr"))
    return p.select(
        "event_id",
        "arr_text",
        F.size("arr").alias("cardinality"),
        F.col("arr")[0].alias("first_elem"),
        F.aggregate("arr", F.lit(0).cast("long"), lambda a, x: a + x).alias("elem_sum"),
    )


@register(
    "cdc_wal2json_roundtrip",
    family="cdc",
    doc="wal2json v2 ingestion end-to-end: the events table rendered "
    "as wal2json documents (hex 'hi/lo' LSNs, postgres timestamp "
    "text, columns/identity images), then parsed back through "
    "sources/wal2json.py into the CDC envelope. The oracle derives "
    "the same envelope directly from events WITHOUT JSON, so the "
    "whole parse path (from_json, LSN hex math, image maps) is "
    "verified against an independent derivation.",
    oracle=f"""
        WITH env AS (SELECT *, {_SQL_OP} AS op FROM events)
        SELECT 'timescaledb.public.' || event_type AS topic,
               op,
               event_id AS lsn,
               {_SQL_TS_MS} AS ts_ms,
               event_id // 100 AS xid,
               CASE WHEN op IN ('u', 'd')
                    THEN CAST(user_id AS VARCHAR) END AS before_user_id,
               CASE WHEN op IN ('c', 'u')
                    THEN CAST(user_id AS VARCHAR) END AS after_user_id,
               CASE WHEN op IN ('c', 'u') THEN props END AS after_props
        FROM env
    """,
)
def cdc_wal2json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:

    from timescaledb_event_streamer_spark.sources.wal2json import (
        parse_wal2json,
        synthesize_wal2json,
    )

    # persist the rendered documents (r11, the container-router
    # rationale): parse_wal2json's B/C-marker filter is pushed below
    # its projection, and when the lines are a live expression both
    # the filter AND the envelope projection re-run the whole
    # to_json render per row (measured 2x the query). In production
    # wal2json lines are a materialized source column and this reuse
    # is free; the persist replaces exactly that. The parse path —
    # the operator under test — still runs on every execution.
    lines = scoped_persist(
        synthesize_wal2json(load(spark, sf_dir, "events")),
        "cdc_wal2json_roundtrip.lines",
    )
    env = parse_wal2json(lines)
    return env.select(
        "topic",
        "op",
        "lsn",
        "ts_ms",
        "xid",
        F.col("before")["user_id"].alias("before_user_id"),
        F.col("after")["user_id"].alias("after_user_id"),
        F.col("after")["props"].alias("after_props"),
    )


@register(
    "cdc_kafka_roundtrip",
    family="cdc",
    doc="Kafka wire round-trip: the streaming envelope encoded to the "
    "(key, value, topic) binary contract (sink/kafka/kafka.go) and "
    "decoded back via sinks.writers.decode_kafka_shaped -- the "
    "key_user_id in the output comes from the KEY blob, everything "
    "else from the value JSON, so both wire fields are verified "
    "against the envelope oracle.",
    oracle=f"""
        WITH t AS (
            SELECT *,
                   {_SQL_OP} AS op,
                   lag(value) OVER w AS prev_value,
                   lag(props) OVER w AS prev_props
            FROM events
            WINDOW w AS (PARTITION BY event_type, user_id ORDER BY event_id)
        )
        SELECT 'timescaledb.public.' || event_type AS topic,
               user_id AS key_user_id,
               op,
               'public' AS source_schema,
               event_type AS source_table,
               event_id AS lsn,
               {_SQL_TS_MS} AS ts_ms,
               CASE WHEN op IN ('u', 'd') THEN prev_value END AS before_value,
               CASE WHEN op IN ('u', 'd') THEN prev_props END AS before_props,
               CASE WHEN op <> 'd' THEN value END AS after_value,
               CASE WHEN op <> 'd' THEN props END AS after_props
        FROM t
    """,
)
def cdc_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sinks.writers import (
        decode_kafka_shaped,
        kafka_shaped,
    )

    env = stream_envelope(load(spark, sf_dir, "events"), replica_identity="FULL")
    wire = kafka_shaped(env)
    return decode_kafka_shaped(
        wire,
        # key_user_id is intentionally absent: it must come from the
        # KEY blob, not the value payload
        "op STRING, source_schema STRING, source_table STRING, lsn BIGINT, "
        "ts_ms BIGINT, before_value DOUBLE, "
        "before_props STRING, after_value DOUBLE, after_props STRING",
    ).select(
        "topic",
        "key_user_id",
        "op",
        "source_schema",
        "source_table",
        "lsn",
        "ts_ms",
        "before_value",
        "before_props",
        "after_value",
        "after_props",
    )


@register(
    "cdc_publication_routing",
    family="cdc",
    doc="Publication semantics (publicationmanager.go, pg_publication): "
    "a publication carries a table set AND a published-operation list "
    "(publish = 'insert,update,...'). Events route only if their "
    "table is in the publication and their op is published. Config "
    "here: click/view publish all ops, purchase publishes inserts "
    "only, everything else is out of the publication. Broadcast map "
    "lookup -- zero shuffle.",
    oracle=f"""
        WITH env AS (SELECT *, {_SQL_OP} AS op FROM events)
        SELECT 'timescaledb.public.' || event_type AS topic,
               op,
               event_id AS lsn,
               user_id AS key_user_id
        FROM env
        WHERE (event_type IN ('click', 'view'))
           OR (event_type = 'purchase' AND op = 'c')
    """,
)
def cdc_publication_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").withColumn(
        "op", derive_op(F.col("event_id"))
    )
    published_ops = F.create_map(
        F.lit("click"), F.lit("c,u,d"),
        F.lit("view"), F.lit("c,u,d"),
        F.lit("purchase"), F.lit("c"),
    )
    ops = F.element_at(published_ops, F.col("event_type"))
    routed = events.filter(
        ops.isNotNull() & F.array_contains(F.split(ops, ","), F.col("op"))
    )
    return routed.select(
        F.concat(F.lit("timescaledb.public."), F.col("event_type")).alias("topic"),
        "op",
        F.col("event_id").alias("lsn"),
        F.col("user_id").alias("key_user_id"),
    )


@register(
    "cdc_schema_registry",
    family="cdc",
    doc="Per-topic schema-name registry (spi/schema/eventschema.go:"
    "230-292, namegenerator.go): key schema = '<topic>.Key', row "
    "schema = '<topic>.Value', envelope schema = '<topic>.Envelope', "
    "with event counts -- the metadata a schema-registry-backed sink "
    "publishes alongside the data. One tiny aggregation.",
    oracle="""
        SELECT 'timescaledb.public.' || event_type AS topic,
               'timescaledb.public.' || event_type || '.Key' AS key_schema,
               'timescaledb.public.' || event_type || '.Value' AS value_schema,
               'timescaledb.public.' || event_type || '.Envelope' AS envelope_schema,
               count(*) AS n_events
        FROM events
        GROUP BY 1, 2, 3, 4
    """,
)
def cdc_schema_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    topic = F.concat(F.lit("timescaledb.public."), F.col("event_type"))
    return (
        events.select(
            topic.alias("topic"),
            F.concat(topic, F.lit(".Key")).alias("key_schema"),
            F.concat(topic, F.lit(".Value")).alias("value_schema"),
            F.concat(topic, F.lit(".Envelope")).alias("envelope_schema"),
        )
        .groupBy("topic", "key_schema", "value_schema", "envelope_schema")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "cdc_ordering_audit",
    family="cdc",
    doc="Commit-order audit: per table, how often LSN order disagrees "
    "with timestamp order within a key's timeline (out-of-order "
    "arrivals the transaction tracker must absorb; "
    "transactiontracker.go). One lag window per (table, key), "
    "rolled up per table.",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   ts < lag(ts) OVER (
                       PARTITION BY event_type, user_id ORDER BY event_id
                   ) AS regressed
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_with_predecessor,
               CAST(sum(CASE WHEN regressed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ts_regressions,
               round(sum(CASE WHEN regressed THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS regression_rate
        FROM s
        WHERE regressed IS NOT NULL
        GROUP BY event_type
    """,
)
def cdc_ordering_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("event_id")
    s = events.select(
        "event_type", (F.col("ts") < F.lag("ts").over(w)).alias("regressed")
    )
    return (
        s.filter(F.col("regressed").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_with_predecessor"),
            F.sum(F.when(F.col("regressed"), 1).otherwise(0)).alias(
                "n_ts_regressions"
            ),
            F.round(
                F.sum(F.when(F.col("regressed"), 1).otherwise(0)) / F.count(F.lit(1)),
                6,
            ).alias("regression_rate"),
        )
    )


@register(
    "cdc_snapshot_watermarks",
    family="cdc",
    doc="Resumable-snapshot watermark batches: each table's snapshot "
    "is cut into 250-row batches in LSN order; per batch emit "
    "(low_lsn, high_lsn, n_rows) -- the watermark record the "
    "reference persists so an interrupted snapshot resumes at the "
    "last completed batch (internal/systemcatalog/snapshotting/, "
    "spi/watermark/). One window + one agg, both on the same "
    "event_type key -- a single shuffle, and at scale the batch "
    "boundaries are exactly the parquet row-group offsets a "
    "restart would seek to.",
    oracle="""
        WITH numbered AS (
            SELECT event_type,
                   event_id,
                   (row_number() OVER (
                        PARTITION BY event_type ORDER BY event_id
                    ) - 1) // 250 AS batch_idx
            FROM events
        )
        SELECT event_type AS source_table,
               batch_idx,
               min(event_id) AS low_lsn,
               max(event_id) AS high_lsn,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM numbered
        GROUP BY 1, 2
    """,
)
def cdc_snapshot_watermarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    numbered = events.select(
        F.col("event_type").alias("source_table"),
        "event_id",
        F.floor((F.row_number().over(w) - 1) / 250).alias("batch_idx"),
    )
    return numbered.groupBy("source_table", "batch_idx").agg(
        F.min("event_id").alias("low_lsn"),
        F.max("event_id").alias("high_lsn"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "cdc_dlq_routing",
    family="cdc",
    doc="Dead-letter routing: rows failing envelope validation are "
    "routed to a per-table DLQ topic with a reason, healthy rows to "
    "their normal topic (the declarative form of the reference sink "
    "layer's failure handling, internal/eventing/sink/). Pure "
    "projection + aggregation — one shuffle on the tiny "
    "(topic, reason) key; rules evaluate in whole-stage codegen.",
    oracle="""
        WITH routed AS (
            SELECT CASE
                       WHEN value > 200.0
                         OR json_extract_string(props, '$.k') IS NULL
                       THEN 'timescaledb.dlq.' || event_type
                       ELSE 'timescaledb.public.' || event_type
                   END AS topic,
                   CASE
                       WHEN value > 200.0 THEN 'value_out_of_range'
                       WHEN json_extract_string(props, '$.k') IS NULL
                       THEN 'missing_payload_key'
                       ELSE 'ok'
                   END AS reason
            FROM events
        )
        SELECT topic, reason, CAST(count(*) AS BIGINT) AS n_events
        FROM routed GROUP BY 1, 2
    """,
)
def cdc_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    bad_value = F.col("value") > 200.0
    bad_key = F.get_json_object(F.col("props"), "$.k").isNull()
    is_dlq = bad_value | bad_key
    routed = events.select(
        F.when(
            is_dlq, F.concat(F.lit("timescaledb.dlq."), F.col("event_type"))
        )
        .otherwise(event_topic(F.lit("public"), F.col("event_type")))
        .alias("topic"),
        F.when(bad_value, F.lit("value_out_of_range"))
        .when(bad_key, F.lit("missing_payload_key"))
        .otherwise(F.lit("ok"))
        .alias("reason"),
    )
    return routed.groupBy("topic", "reason").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "pg_timetz",
    family="pgtypes",
    doc="PG timetz wire-text round-trip (spi/pgtypes/timetz.go:263-295): "
    "build 'HH:MM:SS.ffffff+OH' literals from each event's time-of-day "
    "and a per-user zone offset, parse back, and normalize to UTC "
    "seconds-of-day exactly as the reference does (tim.In(time.UTC)). "
    "All codegen string ops, no shuffle.",
    oracle="""
        WITH w AS (
            SELECT event_id,
                   strftime(ts, '%H:%M:%S.%f') AS t_text,
                   (user_id % 5) - 2 AS off_h
            FROM events
        ),
        lit AS (
            SELECT event_id, off_h,
                   t_text || CASE WHEN off_h < 0 THEN '-' ELSE '+' END
                          || lpad(CAST(abs(off_h) AS VARCHAR), 2, '0')
                       AS timetz_text
            FROM w
        ),
        parsed AS (
            SELECT event_id, timetz_text,
                   CAST(regexp_extract(timetz_text, '^(\\d{2}):', 1) AS BIGINT) AS hh,
                   CAST(regexp_extract(timetz_text, '^\\d{2}:(\\d{2}):', 1) AS BIGINT) AS mm,
                   CAST(regexp_extract(timetz_text, ':(\\d{2})\\.', 1) AS BIGINT) AS ss,
                   CAST(regexp_extract(timetz_text, '\\.(\\d{6})', 1) AS BIGINT) AS micros,
                   CAST(regexp_extract(timetz_text, '([+-]\\d{2})$', 1) AS BIGINT) AS tz_off_h
            FROM lit
        )
        SELECT event_id, timetz_text, tz_off_h, micros,
               ((hh * 3600 + mm * 60 + ss - tz_off_h * 3600) % 86400 + 86400)
                   % 86400 AS utc_seconds_of_day
        FROM parsed
    """,
)
def pg_timetz(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    off_h = F.pmod(F.col("user_id"), F.lit(5)) - 2
    t_text = F.date_format("ts", "HH:mm:ss.SSSSSS")
    timetz_text = F.concat(
        t_text,
        F.when(off_h < 0, F.lit("-")).otherwise(F.lit("+")),
        F.lpad(F.abs(off_h).cast("string"), 2, "0"),
    )
    lit = events.select("event_id", timetz_text.alias("timetz_text"))
    hh = F.regexp_extract("timetz_text", r"^(\d{2}):", 1).cast("long")
    mm = F.regexp_extract("timetz_text", r"^\d{2}:(\d{2}):", 1).cast("long")
    ss = F.regexp_extract("timetz_text", r":(\d{2})\.", 1).cast("long")
    micros = F.regexp_extract("timetz_text", r"\.(\d{6})", 1).cast("long")
    tz = F.regexp_extract("timetz_text", r"([+-]\d{2})$", 1).cast("long")
    return lit.select(
        "event_id",
        "timetz_text",
        tz.alias("tz_off_h"),
        micros.alias("micros"),
        F.pmod(hh * 3600 + mm * 60 + ss - tz * 3600, F.lit(86400)).alias(
            "utc_seconds_of_day"
        ),
    )
