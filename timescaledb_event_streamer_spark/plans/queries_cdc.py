"""CDC-core queries (SURVEY.md §2.A) over the simulated transaction
log (`events` table).

Each query has a DuckDB oracle expressing identical semantics, so
the driver's hash-compare is exact. Shared derivations (op from lsn,
ts_ms, chunk bucketing) are defined once in cdc/ and catalog/ and
mirrored literally in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.catalog.chunks import (
    CHUNK_INTERVAL_S,
    chunk_catalog,
    resolve_chunks,
)
from timescaledb_event_streamer_spark.catalog.naming import event_topic
from timescaledb_event_streamer_spark.catalog.tablefilter import TableFilter
from timescaledb_event_streamer_spark.cdc.envelope import (
    OP_DELETE,
    derive_op,
    read_envelope,
    stream_envelope,
)
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

# Oracle fragments mirroring cdc/envelope.py derivations.
_SQL_OP = (
    "CASE WHEN event_id % 10 = 0 THEN 'd' "
    "WHEN event_id % 10 IN (1, 2) THEN 'u' ELSE 'c' END"
)
_SQL_TS_MS = "CAST(epoch_us(ts) // 1000 AS BIGINT)"
_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"
_SQL_CHUNK_START = f"({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {CHUNK_INTERVAL_S})"


@register(
    "cdc_envelope_read",
    family="cdc",
    doc="Initial-snapshot envelope: op='r', source block, ts_ms (eventschema.go:53-66)",
    oracle=f"""
        SELECT 'timescaledb.public.' || event_type AS topic,
               'r' AS op,
               'public' AS source_schema,
               event_type AS source_table,
               event_id AS lsn,
               {_SQL_TS_MS} AS ts_ms,
               user_id AS key_user_id,
               value AS after_value,
               props AS after_props
        FROM events
    """,
)
def cdc_envelope_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_envelope(load(spark, sf_dir, "events"))


@register(
    "cdc_envelope_stream",
    family="cdc",
    doc="Streaming envelope with before/after images under replica identity FULL "
    "(eventschema.go:67-117, replicaidentity.go)",
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
               op,
               'public' AS source_schema,
               event_type AS source_table,
               event_id AS lsn,
               {_SQL_TS_MS} AS ts_ms,
               user_id AS key_user_id,
               CASE WHEN op IN ('u', 'd') THEN prev_value END AS before_value,
               CASE WHEN op IN ('u', 'd') THEN prev_props END AS before_props,
               CASE WHEN op <> 'd' THEN value END AS after_value,
               CASE WHEN op <> 'd' THEN props END AS after_props
        FROM t
    """,
)
def cdc_envelope_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_envelope(load(spark, sf_dir, "events"), replica_identity="FULL")


@register(
    "cdc_chunk_resolution",
    family="cdc",
    doc="Chunk catalog derivation + chunk->hypertable resolution via broadcast join "
    "(systemcatalog.go, replicationresolver.go)",
    oracle=f"""
        WITH keyed AS (
            SELECT *, {_SQL_CHUNK_START} AS range_start_s FROM events
        ),
        distinct_chunks AS (
            SELECT DISTINCT event_type AS hypertable_name, range_start_s FROM keyed
        ),
        chunks AS (
            SELECT hypertable_name,
                   range_start_s,
                   dense_rank() OVER (ORDER BY hypertable_name) AS hypertable_id,
                   dense_rank() OVER (ORDER BY hypertable_name, range_start_s) AS chunk_id
            FROM distinct_chunks
        )
        SELECT c.hypertable_id,
               c.hypertable_name,
               c.chunk_id,
               '_hyper_' || c.hypertable_id || '_' || c.chunk_id || '_chunk' AS chunk_name,
               c.range_start_s,
               c.range_start_s + {CHUNK_INTERVAL_S} AS range_end_s,
               count(*) AS n_events,
               min(k.event_id) AS lsn_min,
               max(k.event_id) AS lsn_max
        FROM keyed k
        JOIN chunks c
          ON k.event_type = c.hypertable_name AND k.range_start_s = c.range_start_s
        GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
def cdc_chunk_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The output grain IS the chunk-catalog grain, so the per-chunk
    # stats fold into the catalog derivation: one scan, one shuffle,
    # two metadata-sized windows — no join-back (the broadcast
    # resolve_chunks hot path is exercised by the stream-static and
    # pruning queries, where the event grain is preserved).
    from timescaledb_event_streamer_spark.catalog.chunks import chunk_start_epoch

    events = load(spark, sf_dir, "events")
    per_chunk = (
        events.select(
            F.col("event_type").alias("hypertable_name"),
            chunk_start_epoch(F.col("ts")).alias("range_start_s"),
            "event_id",
        )
        .groupBy("hypertable_name", "range_start_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("lsn_min"),
            F.max("event_id").alias("lsn_max"),
        )
    )
    # constant partition key: single-partition is deliberate (chunk
    # grain is metadata-sized) and this keeps WindowExec from warning
    # (column-derived because Catalyst folds literal partition keys)
    one_part = F.length("hypertable_name") * 0
    w_ht = Window.partitionBy(one_part).orderBy("hypertable_name")
    w_chunk = Window.partitionBy(one_part).orderBy("hypertable_name", "range_start_s")
    return (
        per_chunk.withColumn("hypertable_id", F.dense_rank().over(w_ht).cast("long"))
        .withColumn("chunk_id", F.dense_rank().over(w_chunk).cast("long"))
        .select(
            "hypertable_id",
            "hypertable_name",
            "chunk_id",
            F.concat(
                F.lit("_hyper_"),
                F.col("hypertable_id"),
                F.lit("_"),
                F.col("chunk_id"),
                F.lit("_chunk"),
            ).alias("chunk_name"),
            "range_start_s",
            (F.col("range_start_s") + F.lit(CHUNK_INTERVAL_S)).alias("range_end_s"),
            "n_events",
            "lsn_min",
            "lsn_max",
        )
    )


@register(
    "cdc_topic_naming",
    family="cdc",
    doc="Debezium naming strategy routing: prefix.schema.table (namegenerator.go:62-75)",
    oracle=f"""
        SELECT 'timescaledb.public.' || event_type AS topic,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_keys,
               min({_SQL_TS_MS}) AS first_ts_ms,
               max({_SQL_TS_MS}) AS last_ts_ms
        FROM events
        GROUP BY 1
    """,
)
def cdc_topic_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.cdc.envelope import ts_ms

    events = load(spark, sf_dir, "events")
    return (
        events.select(
            event_topic(F.lit("public"), F.col("event_type")).alias("topic"),
            "user_id",
            ts_ms(F.col("ts")).alias("_ts_ms"),
        )
        .groupBy("topic")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_keys"),
            F.min("_ts_ms").alias("first_ts_ms"),
            F.max("_ts_ms").alias("last_ts_ms"),
        )
    )


# Filter config fixed for the correctness gate: include tables with an
# 'e', exclude err?r — exercises '*' and '?' wildcards.
_FILTER = TableFilter(
    includes=["public.*e*"], excludes=["public.err?r"], accepted_by_default=False
)


@register(
    "cdc_table_filter",
    family="cdc",
    doc="Include/exclude wildcard table filtering (tablefilter.go:69-90,252-261)",
    oracle="""
        SELECT event_type AS table_name, count(*) AS n_events
        FROM events
        WHERE regexp_matches(event_type, '^.*?e.*?$')
          AND NOT regexp_matches(event_type, '^err.{1}r$')
        GROUP BY 1
    """,
)
def cdc_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.filter(_FILTER.column(F.lit("public"), F.col("event_type")))
        .groupBy(F.col("event_type").alias("table_name"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "cdc_event_filter",
    family="cdc",
    doc="Config-driven predicate filtering on envelopes (internal/eventing/eventfiltering)",
    oracle=f"""
        WITH env AS (
            SELECT *, {_SQL_OP} AS op FROM events
        )
        SELECT 'timescaledb.public.' || event_type AS topic,
               op,
               event_id AS lsn,
               user_id AS key_user_id,
               value AS after_value
        FROM env
        WHERE op = 'c' AND value > 30.0 AND event_type IN ('click', 'purchase')
    """,
)
def cdc_event_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    env = events.withColumn("op", derive_op(F.col("event_id")))
    return env.filter(
        (F.col("op") == "c")
        & (F.col("value") > 30.0)
        & F.col("event_type").isin("click", "purchase")
    ).select(
        event_topic(F.lit("public"), F.col("event_type")).alias("topic"),
        "op",
        F.col("event_id").alias("lsn"),
        F.col("user_id").alias("key_user_id"),
        F.col("value").alias("after_value"),
    )


@register(
    "cdc_snapshot_stream_merge",
    family="cdc",
    doc="Snapshot (op='r') union streaming phase, keep-latest per key by LSN; "
    "deletes drop keys (snapshotting/ + watermark/ hand-off)",
    oracle=f"""
        WITH watermark AS (
            SELECT max(event_id) // 2 AS wm FROM events
        ),
        log AS (
            SELECT e.*,
                   CASE WHEN e.event_id <= w.wm THEN 'r' ELSE {_SQL_OP} END AS op
            FROM events e, watermark w
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY event_type, user_id ORDER BY event_id DESC
                   ) AS rn
            FROM log
        )
        SELECT event_type AS source_table,
               user_id AS key_user_id,
               event_id AS last_lsn,
               op AS last_op,
               value AS last_value
        FROM ranked
        WHERE rn = 1 AND op <> 'd'
    """,
)
def cdc_snapshot_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    # Snapshot watermark (same role as the reference's watermark
    # table, spi/watermark/): a 1-row aggregate broadcast-joined into
    # the log. This keeps the watermark in-plan and removes the
    # driver-side collect; the 1-row agg subplan still reads events
    # separately (cache/persist the source to share the scan).
    wm = events.agg((F.max("event_id") / 2).cast("long").alias("wm"))
    log = events.crossJoin(F.broadcast(wm)).withColumn(
        "op",
        F.when(F.col("event_id") <= F.col("wm"), F.lit("r")).otherwise(
            derive_op(F.col("event_id"))
        ),
    ).drop("wm")
    w = Window.partitionBy("event_type", "user_id").orderBy(F.col("event_id").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != OP_DELETE))
        .select(
            F.col("event_type").alias("source_table"),
            F.col("user_id").alias("key_user_id"),
            F.col("event_id").alias("last_lsn"),
            F.col("op").alias("last_op"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "cdc_transaction_stats",
    family="cdc",
    doc="Transaction grouping + per-txn stats (transactiontracker.go): "
    "xid = lsn // 50 models commit batches",
    oracle=f"""
        WITH t AS (
            SELECT *, event_id // 50 AS xid, {_SQL_OP} AS op FROM events
        )
        SELECT xid,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_tables,
               min(event_id) AS first_lsn,
               max(event_id) AS last_lsn,
               max({_SQL_TS_MS}) AS commit_ts_ms,
               CAST(sum(CASE WHEN op = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
               CAST(sum(CASE WHEN op = 'u' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
               CAST(sum(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
        FROM t
        GROUP BY xid
    """,
)
def cdc_transaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.cdc.envelope import ts_ms

    events = load(spark, sf_dir, "events")
    t = events.withColumn("xid", (F.col("event_id") / 50).cast("long")).withColumn(
        "op", derive_op(F.col("event_id"))
    )
    return t.groupBy("xid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_tables"),
        F.min("event_id").alias("first_lsn"),
        F.max("event_id").alias("last_lsn"),
        F.max(ts_ms(F.col("ts"))).alias("commit_ts_ms"),
        F.sum(F.when(F.col("op") == "c", 1).otherwise(0)).alias("n_inserts"),
        F.sum(F.when(F.col("op") == "u", 1).otherwise(0)).alias("n_updates"),
        F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("n_deletes"),
    )


_SQL_SPACE_HASH = "((user_id * 2654435761) % 4294967296)"
_SQL_SPACE_SLICE = f"(({_SQL_SPACE_HASH} * 4) // 4294967296)"


@register(
    "cdc_chunk_resolution_space",
    family="cdc",
    doc="Multi-dimensional (time x space) chunk resolution — the "
    "space-partitioned hypertable layout "
    "(spi/systemcatalog/column.go:242 models dimension type 'space' "
    "vs 'time'; chunks are the cross product of a 7-day time range "
    "and one of 4 hash slices of user_id, mirroring "
    "_timescaledb_catalog.dimension_slice hash ranges). Same "
    "one-scan/one-shuffle catalog-grain fold as the 1-D resolution; "
    "the slice hash is a portable Knuth multiplicative hash over a "
    "2^32 space so both engines derive identical slices in exact "
    "64-bit arithmetic. The broadcast event-grain resolve "
    "(resolve_chunks_2d) and the 2-D pruning proof live in pytest.",
    oracle=f"""
        WITH keyed AS (
            SELECT *,
                   {_SQL_CHUNK_START} AS range_start_s,
                   {_SQL_SPACE_SLICE} AS slice_id
            FROM events
        ),
        distinct_chunks AS (
            SELECT DISTINCT event_type AS hypertable_name, range_start_s,
                            slice_id
            FROM keyed
        ),
        chunks AS (
            SELECT hypertable_name, range_start_s, slice_id,
                   dense_rank() OVER (ORDER BY hypertable_name)
                       AS hypertable_id,
                   dense_rank() OVER (
                       ORDER BY hypertable_name, range_start_s, slice_id)
                       AS chunk_id
            FROM distinct_chunks
        )
        SELECT c.hypertable_id,
               c.hypertable_name,
               c.chunk_id,
               '_hyper_' || c.hypertable_id || '_' || c.chunk_id || '_chunk'
                   AS chunk_name,
               c.range_start_s,
               c.range_start_s + {CHUNK_INTERVAL_S} AS range_end_s,
               c.slice_id,
               c.slice_id * 1073741824 AS slice_hash_start,
               (c.slice_id + 1) * 1073741824 AS slice_hash_end,
               count(*) AS n_events,
               count(DISTINCT k.user_id) AS n_users,
               min(k.event_id) AS lsn_min,
               max(k.event_id) AS lsn_max
        FROM keyed k
        JOIN chunks c
          ON k.event_type = c.hypertable_name
         AND k.range_start_s = c.range_start_s
         AND k.slice_id = c.slice_id
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9
    """,
)
def cdc_chunk_resolution_space(spark: SparkSession, sf_dir: str) -> DataFrame:
    # catalog-grain fold, 2-D: one scan, one (3-key) shuffle, two
    # metadata-sized windows — the event-grain broadcast resolve is
    # resolve_chunks_2d, pytest-exercised with the pruning proof
    from timescaledb_event_streamer_spark.catalog.chunks import (
        SPACE_PARTITIONS,
        _HASH_SPACE,
        chunk_start_epoch,
        space_slice,
    )

    events = load(spark, sf_dir, "events")
    slice_width = _HASH_SPACE // SPACE_PARTITIONS
    per_chunk = (
        events.select(
            F.col("event_type").alias("hypertable_name"),
            chunk_start_epoch(F.col("ts")).alias("range_start_s"),
            space_slice(F.col("user_id")).alias("slice_id"),
            "event_id",
            "user_id",
        )
        .groupBy("hypertable_name", "range_start_s", "slice_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("lsn_min"),
            F.max("event_id").alias("lsn_max"),
        )
    )
    one_part = F.length("hypertable_name") * 0
    w_ht = Window.partitionBy(one_part).orderBy("hypertable_name")
    w_chunk = Window.partitionBy(one_part).orderBy(
        "hypertable_name", "range_start_s", "slice_id"
    )
    return (
        per_chunk.withColumn("hypertable_id", F.dense_rank().over(w_ht).cast("long"))
        .withColumn("chunk_id", F.dense_rank().over(w_chunk).cast("long"))
        .select(
            "hypertable_id",
            "hypertable_name",
            "chunk_id",
            F.concat(
                F.lit("_hyper_"), F.col("hypertable_id"),
                F.lit("_"), F.col("chunk_id"), F.lit("_chunk"),
            ).alias("chunk_name"),
            "range_start_s",
            (F.col("range_start_s") + F.lit(CHUNK_INTERVAL_S)).alias("range_end_s"),
            "slice_id",
            (F.col("slice_id") * slice_width).alias("slice_hash_start"),
            ((F.col("slice_id") + 1) * slice_width).alias("slice_hash_end"),
            "n_events",
            "n_users",
            "lsn_min",
            "lsn_max",
        )
    )


_SNAPSHOT_MODES = ("always", "initial_only", "never")


@register(
    "cdc_snapshot_modes",
    family="cdc",
    doc="Initial-snapshot mode semantics — what each configured mode "
    "emits on connector startup (spi/config/configuration.go:61-66 "
    "defines always / never / initial_only; "
    "internal/replication/replicationchannel/replicationchannel.go:199-226 "
    "gates the snapshot and the stream start on the mode). The slot "
    "creation LSN is a deterministic data-derived constant "
    "(floor(0.6 * max lsn)); rows at-or-below it are the snapshot "
    "tier, rows above it the streamed tier. Per (mode, hypertable): "
    "'always' emits snapshot + stream, 'never' streams only, "
    "'initial_only' snapshots and never starts streaming. Plan: ONE "
    "events scan -> per-hypertable tier aggregate (map-side "
    "partials), a 1-row broadcast slot LSN, and the 3 modes unfold "
    "from a literal array explode over the tiny aggregate — the "
    "mode fan-out never touches event-grain rows.",
    oracle="""
        WITH slot AS (
            SELECT CAST(floor(0.6 * max(event_id)) AS BIGINT) AS slot_lsn
            FROM events
        ),
        tiers AS (
            SELECT event_type AS hypertable_name,
                   CAST(sum(CASE WHEN event_id <= slot_lsn THEN 1 ELSE 0 END)
                        AS BIGINT) AS snap_n,
                   CAST(sum(CASE WHEN event_id > slot_lsn THEN 1 ELSE 0 END)
                        AS BIGINT) AS stream_n,
                   min(CASE WHEN event_id <= slot_lsn THEN event_id END)
                       AS snap_min,
                   max(CASE WHEN event_id <= slot_lsn THEN event_id END)
                       AS snap_max,
                   min(CASE WHEN event_id > slot_lsn THEN event_id END)
                       AS stream_min,
                   max(CASE WHEN event_id > slot_lsn THEN event_id END)
                       AS stream_max
            FROM events, slot
            GROUP BY event_type
        )
        SELECT m.snapshot_mode,
               t.hypertable_name,
               CASE WHEN m.snapshot_mode = 'never' THEN 0
                    ELSE t.snap_n END AS n_snapshot,
               CASE WHEN m.snapshot_mode = 'initial_only' THEN 0
                    ELSE t.stream_n END AS n_stream,
               CASE WHEN m.snapshot_mode = 'never' THEN t.stream_n
                    WHEN m.snapshot_mode = 'initial_only' THEN t.snap_n
                    ELSE t.snap_n + t.stream_n END AS n_emitted,
               CASE WHEN m.snapshot_mode = 'never' THEN t.stream_min
                    WHEN m.snapshot_mode = 'initial_only' THEN t.snap_min
                    ELSE coalesce(t.snap_min, t.stream_min) END AS lsn_min,
               CASE WHEN m.snapshot_mode = 'never' THEN t.stream_max
                    WHEN m.snapshot_mode = 'initial_only' THEN t.snap_max
                    ELSE coalesce(t.stream_max, t.snap_max) END AS lsn_max
        FROM tiers t
        CROSS JOIN (
            SELECT unnest(['always', 'initial_only', 'never'])
                AS snapshot_mode
        ) m
    """,
)
def cdc_snapshot_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    slot = events.agg(
        F.floor(F.lit(0.6) * F.max("event_id")).cast("long").alias("slot_lsn")
    )
    in_snap = F.col("event_id") <= F.col("slot_lsn")
    tiers = (
        events.crossJoin(F.broadcast(slot))
        .groupBy(F.col("event_type").alias("hypertable_name"))
        .agg(
            F.sum(F.when(in_snap, 1).otherwise(0)).alias("snap_n"),
            F.sum(F.when(~in_snap, 1).otherwise(0)).alias("stream_n"),
            F.min(F.when(in_snap, F.col("event_id"))).alias("snap_min"),
            F.max(F.when(in_snap, F.col("event_id"))).alias("snap_max"),
            F.min(F.when(~in_snap, F.col("event_id"))).alias("stream_min"),
            F.max(F.when(~in_snap, F.col("event_id"))).alias("stream_max"),
        )
    )
    mode = F.col("snapshot_mode")
    unfolded = tiers.select(
        F.explode(F.array(*[F.lit(m) for m in _SNAPSHOT_MODES])).alias(
            "snapshot_mode"
        ),
        "*",
    )
    return unfolded.select(
        "snapshot_mode",
        "hypertable_name",
        F.when(mode == "never", F.lit(0).cast("long"))
        .otherwise(F.col("snap_n"))
        .alias("n_snapshot"),
        F.when(mode == "initial_only", F.lit(0).cast("long"))
        .otherwise(F.col("stream_n"))
        .alias("n_stream"),
        F.when(mode == "never", F.col("stream_n"))
        .when(mode == "initial_only", F.col("snap_n"))
        .otherwise(F.col("snap_n") + F.col("stream_n"))
        .alias("n_emitted"),
        F.when(mode == "never", F.col("stream_min"))
        .when(mode == "initial_only", F.col("snap_min"))
        .otherwise(F.coalesce("snap_min", "stream_min"))
        .alias("lsn_min"),
        F.when(mode == "never", F.col("stream_max"))
        .when(mode == "initial_only", F.col("snap_max"))
        .otherwise(F.coalesce("stream_max", "snap_max"))
        .alias("lsn_max"),
    )
