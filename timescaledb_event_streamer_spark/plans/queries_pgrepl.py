"""Replication-protocol handshake queries (SURVEY.md §2.J18).

The connection-setup surface of the reference
(internal/replication/replicationconnection/replicationconnection.go):
IDENTIFY_SYSTEM, CREATE_REPLICATION_SLOT and the START_REPLICATION
accept, plus the restart-LSN decision — as wire codecs over synthesized
golden reply streams. One "connection" per hypertable: reply values are
derived deterministically from the events table, encoded into real
protocol-v3 byte streams, decoded back through
sources/pg_replication.py, and the oracle derives every value
independently from the generating columns (never by re-parsing), so
encode and decode bugs cannot cancel out — the J15/J16 discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

#: oracle-side LSN text ('X/Y', uppercase hex, no leading zeros — the
#: pglogrepl.LSN.String form; DuckDB to_hex is uppercase already)
_SQL_LSN_TEXT = (
    "(to_hex({lsn} // 4294967296) || '/' || to_hex({lsn} % 4294967296))"
)


@register(
    "cdc_replication_handshake",
    family="cdc",
    doc="Replication-channel handshake: IDENTIFY_SYSTEM and "
    "CREATE_REPLICATION_SLOT reply streams (RowDescription + DataRow "
    "+ CommandComplete) plus the START_REPLICATION CopyBothResponse, "
    "encoded as real protocol-v3 bytes per hypertable and decoded "
    "back with the bounded-fold backend-message walk "
    "(sources/pg_replication.py; reference "
    "replicationconnection.go:36,156,212 via pglogrepl). The restart "
    "LSN applies locateRestartLSN's rule "
    "(replicationconnection.go:216-290) to the DECODED values: "
    "confirmed_flush_lsn, overridden by a further-ahead offset-storage "
    "LSN, falling back to the server xlogpos when both are absent — "
    "the per-table derivations exercise all three branches. Pure hex "
    "codegen, one metadata-sized row per relation.",
    oracle=f"""
        WITH per_table AS (
            SELECT event_type, max(event_id) AS mx
            FROM events GROUP BY event_type
        ),
        d AS (
            SELECT event_type,
                   mx * 4 + 3 AS xlog_lsn,
                   CASE WHEN length(event_type) % 2 = 0
                        THEN mx * 2 ELSE 0 END AS cf_lsn,
                   CASE WHEN event_type LIKE 'c%'
                        THEN mx * 3 END AS off_lsn,
                   mx
            FROM per_table
        ),
        r AS (
            SELECT *,
                   CASE WHEN off_lsn IS NOT NULL AND off_lsn > cf_lsn
                        THEN off_lsn ELSE cf_lsn END AS base
            FROM d
        )
        SELECT event_type AS source_table,
               'systemid,timeline,xlogpos,dbname' AS declared_fields,
               CAST(7000000000000 + mx AS VARCHAR) AS system_id,
               CAST(length(event_type) % 3 + 1 AS BIGINT) AS timeline,
               {_SQL_LSN_TEXT.format(lsn="xlog_lsn")} AS xlogpos_text,
               xlog_lsn AS xlogpos_lsn,
               'postgres' AS dbname,
               'timescaledb_' || event_type AS slot_name,
               xlog_lsn AS consistent_point_lsn,
               '00000003-' || lpad(lower(to_hex(mx)), 8, '0') || '-1'
                   AS snapshot_name,
               'pgoutput' AS output_plugin,
               CAST(0 AS BIGINT) AS copy_format,
               CAST(0 AS BIGINT) AS copy_cols,
               CASE WHEN base = 0 THEN xlog_lsn ELSE base END
                   AS restart_lsn_value,
               CASE WHEN base = cf_lsn AND base <> 0 THEN 'confirmed_flush'
                    WHEN off_lsn IS NOT NULL AND base = off_lsn THEN 'offset'
                    ELSE 'xlog_pos' END AS restart_source
        FROM r
    """,
)
def cdc_replication_handshake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources import pg_replication as pr

    events = load(spark, sf_dir, "events")
    per_table = (
        events.groupBy("event_type").agg(F.max("event_id").alias("mx")).coalesce(1)
    )
    mx = F.col("mx")
    xlog_lsn = mx * 4 + 3
    d = per_table.select(
        "event_type",
        "mx",
        xlog_lsn.alias("xlog_lsn"),
        # branch-exercising restart inputs (derived, see oracle)
        F.when(F.length("event_type") % 2 == 0, mx * 2).otherwise(F.lit(0))
        .alias("cf_lsn"),
        F.when(F.col("event_type").startswith("c"), mx * 3).alias("off_lsn"),
        # the two golden reply streams + the copy-both accept, as the
        # server would send them (real protocol-v3 framing)
        pr.encode_query_reply(
            [
                (F.lit("systemid"), 25), (F.lit("timeline"), 23),
                (F.lit("xlogpos"), 25), (F.lit("dbname"), 25),
            ],
            [
                (F.lit(7000000000000) + mx).cast("string"),
                (F.length("event_type") % 3 + 1).cast("string"),
                pr.lsn_to_text(xlog_lsn),
                F.lit("postgres"),
            ],
            "IDENTIFY_SYSTEM",
        ).alias("identify_reply"),
        pr.encode_query_reply(
            [
                (F.lit("slot_name"), 25), (F.lit("consistent_point"), 25),
                (F.lit("snapshot_name"), 25), (F.lit("output_plugin"), 25),
            ],
            [
                F.concat(F.lit("timescaledb_"), F.col("event_type")),
                pr.lsn_to_text(xlog_lsn),
                F.concat(
                    F.lit("00000003-"),
                    F.lpad(F.lower(F.hex(mx)), 8, "0"), F.lit("-1"),
                ),
                F.lit("pgoutput"),
            ],
            "CREATE_REPLICATION_SLOT",
        ).alias("slot_reply"),
        pr.encode_copy_both_response(0).alias("copy_both"),
    )
    # decode ONLY from the wire streams
    decoded = pr.parse_create_slot_reply(
        pr.parse_identify_system(d, "identify_reply"), "slot_reply"
    )
    cb = pr.decode_copy_both(
        pr.split_backend_messages(F.col("copy_both"))[0].getField("body")
    )
    return decoded.select(
        F.col("event_type").alias("source_table"),
        "declared_fields",
        "system_id",
        "timeline",
        "xlogpos_text",
        "xlogpos_lsn",
        "dbname",
        "slot_name",
        "consistent_point_lsn",
        "snapshot_name",
        "output_plugin",
        cb.getField("overall_format").alias("copy_format"),
        cb.getField("ncols").alias("copy_cols"),
        pr.restart_lsn(F.col("cf_lsn"), F.col("off_lsn"), F.col("xlogpos_lsn"))
        .alias("restart_lsn_value"),
        pr.restart_source(F.col("cf_lsn"), F.col("off_lsn"), F.col("xlogpos_lsn"))
        .alias("restart_source"),
    )
