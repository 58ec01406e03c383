"""PostgreSQL type-system operators, part 2 (SURVEY.md §2.J20+):
enum and domain type kinds — the two PgKind values of the reference's
type model not yet covered (`spi/pgtypes/pgtype.go:53-54` declares
DomainKind "d" and EnumKind "e"; `internal/typemanager/typemanager.go:512`
converts enums via enum2string and :256 handles enum arrays;
typemanager.go:143 carries enumValues through type registration).

Registered AFTER the round-5 certification-waitlist freeze — queues
behind the 47 pending queries, certifies in round 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread

#: synthetic oid for the simulated enum type (first user-range oid,
#: the value PostgreSQL hands the first CREATE TYPE in a fresh db)
_ENUM_TYPID = 16384

#: domain check bounds for the simulated `value_dollars` domain over
#: numeric(10,2): CHECK (VALUE >= 0 AND VALUE <= 100). The corpus
#: spans ~0..200+, so both the pass and the violation branch carry
#: real rows at every scale factor.
_DOMAIN_MAX = 100.0


@register(
    "pg_enum_domain",
    family="pgtypes",
    doc="Enum + domain type-kind semantics (J20) — the two PgKind "
    "values the type matrix hadn't covered: EnumKind 'e' and "
    "DomainKind 'd' (spi/pgtypes/pgtype.go:53-54; enum2string "
    "conversion internal/typemanager/typemanager.go:512; enumValues "
    "registration :143). The event_type column plays an enum over "
    "its five labels: the operator builds the pg_enum catalog "
    "(enumtypid, enumsortorder by registration order = label order, "
    "enumlabel), resolves every event through it, and proves the "
    "ORDINAL semantics enums add over plain strings (cumulative "
    "counts in sort order — comparisons bind to enumsortorder, not "
    "collation). The value column plays a domain value_dollars over "
    "numeric(10,2) with CHECK(0 <= v <= 100): domains resolve to "
    "their parent base type with constraint outcomes surfaced, so "
    "violations are counted per label. Plan: one scan, one "
    "label-grain reduce, catalog windows over 5 metadata rows.",
    oracle=f"""
        WITH cat AS (
            SELECT event_type AS enumlabel,
                   dense_rank() OVER (ORDER BY event_type)
                       AS enumsortorder
            FROM (SELECT DISTINCT event_type FROM events)
        ),
        per_label AS (
            SELECT event_type AS enumlabel,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(*) FILTER (
                       value < 0 OR value > {_DOMAIN_MAX}
                   ) AS BIGINT) AS n_domain_violations
            FROM events GROUP BY 1
        )
        SELECT {_ENUM_TYPID} AS enumtypid,
               c.enumsortorder,
               c.enumlabel,
               p.n_events,
               CAST(sum(p.n_events) OVER (
                   ORDER BY c.enumsortorder
               ) AS BIGINT) AS cum_events_by_ordinal,
               p.n_domain_violations,
               round(p.n_domain_violations * 1.0 / p.n_events, 6)
                   AS violation_rate
        FROM cat c JOIN per_label p USING (enumlabel)
    """,
)
def pg_enum_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    per_label = events.groupBy(F.col("event_type").alias("enumlabel")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                (F.col("value") < 0) | (F.col("value") > _DOMAIN_MAX), 1
            ).otherwise(0)
        ).alias("n_domain_violations"),
    )
    # pg_enum catalog: sort order assigned in registration order (the
    # labels sort here — documented convention of the simulation);
    # the windows run over 5 metadata-grain rows, never event-grain
    one_part = F.length("enumlabel") * 0
    w_ord = Window.partitionBy(one_part).orderBy("enumlabel")
    w_cum = (
        Window.partitionBy(one_part)
        .orderBy("enumsortorder")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_label.withColumn(
            "enumsortorder", F.dense_rank().over(w_ord).cast("long")
        )
        .withColumn("cum_events_by_ordinal", F.sum("n_events").over(w_cum))
        .select(
            F.lit(_ENUM_TYPID).cast("long").alias("enumtypid"),
            "enumsortorder",
            "enumlabel",
            "n_events",
            "cum_events_by_ordinal",
            "n_domain_violations",
            F.round(
                F.col("n_domain_violations") * 1.0 / F.col("n_events"), 6
            ).alias("violation_rate"),
        )
    )


#: the reference's interval flattening constants
#: (internal/typemanager/builtin_converters.go:44-49): months convert
#: at the 365.25/12-day average -> 2_629_800_000_000 us exactly
_US_PER_DAY = 86_400_000_000
_US_PER_MONTH = 2_629_800_000_000


@register(
    "pg_uuid_interval",
    family="pgtypes",
    doc="uuid + interval converters (J21), the last two builtin "
    "converters of the reference's matrix without an operator "
    "(uuid2text internal/typemanager/builtin_converters.go:300 "
    "formats the 16 bytes canonically; interval2int64 :350 flattens "
    "to total microseconds with months at the 365.25/12-day average "
    "— micros + days*86400e6 + months*2_629_800e6, exact integer). "
    "Wire build and parse are separate projections: interval text "
    "uses PostgreSQL's component form with proper singular/plural "
    "and zero-component omission, parsed back by codegen regexes "
    "with optional groups; uuid text is formatted 8-4-4-4-12 from "
    "md5-derived bytes and audited for version nibble and RFC-4122 "
    "variant (the distribution check a datalake runs on id "
    "columns). One scan, no shuffle.",
    oracle=f"""
        WITH d AS (
            SELECT event_id,
                   event_id % 14 AS months,
                   user_id % 40 AS days,
                   (event_id * 7919) % 86400000000 AS time_us,
                   md5(CAST(event_id AS VARCHAR)) AS hx
            FROM events
        )
        SELECT event_id,
               CASE WHEN months = 0 AND days = 0 THEN ''
                    ELSE trim(
                        CASE WHEN months = 1 THEN '1 mon '
                             WHEN months > 1
                             THEN months || ' mons ' ELSE '' END
                        || CASE WHEN days = 1 THEN '1 day'
                                WHEN days > 1 THEN days || ' days'
                                ELSE '' END) || ' '
               END
               || lpad(CAST(time_us // 3600000000 AS VARCHAR), 2, '0')
               || ':' || lpad(CAST((time_us // 60000000) % 60
                                   AS VARCHAR), 2, '0')
               || ':' || lpad(CAST((time_us // 1000000) % 60
                                   AS VARCHAR), 2, '0')
               || '.' || lpad(CAST(time_us % 1000000 AS VARCHAR), 6, '0')
                   AS interval_text,
               CAST(time_us + days * {_US_PER_DAY}
                    + months * {_US_PER_MONTH} AS BIGINT) AS interval_us,
               substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
                   || substr(hx, 13, 4) || '-' || substr(hx, 17, 4)
                   || '-' || substr(hx, 21, 12) AS uuid_text,
               CAST(('0x' || substr(hx, 13, 1)) AS BIGINT) AS uuid_version,
               CAST(('0x' || substr(hx, 17, 1)) AS BIGINT) >= 8
                   AND CAST(('0x' || substr(hx, 17, 1)) AS BIGINT) <= 11
                   AS uuid_variant_rfc
        FROM d
    """,
)
def pg_uuid_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): md5 + component text build + 4 regex parses per row is
    # the expensive projection; the single-split local scan would run
    # it on one core (7.3x scaling row before, ~linear after). No-op
    # on a real multi-split table.
    events = spread(load(spark, sf_dir, "events"))
    months = F.col("event_id") % 14
    days = F.col("user_id") % 40
    time_us = (F.col("event_id") * 7919) % 86_400_000_000
    hx = F.md5(F.col("event_id").cast("string"))
    two = lambda c: F.lpad(c.cast("long").cast("string"), 2, "0")  # noqa: E731
    datepart = F.trim(
        F.concat(
            F.when(months == 1, F.lit("1 mon "))
            .when(months > 1, F.concat(months.cast("string"), F.lit(" mons ")))
            .otherwise(F.lit("")),
            F.when(days == 1, F.lit("1 day"))
            .when(days > 1, F.concat(days.cast("string"), F.lit(" days")))
            .otherwise(F.lit("")),
        )
    )
    wire_interval = F.concat(
        F.when((months == 0) & (days == 0), F.lit("")).otherwise(
            F.concat(datepart, F.lit(" "))
        ),
        two(time_us / 3_600_000_000),
        F.lit(":"),
        two((time_us / 60_000_000).cast("long") % 60),
        F.lit(":"),
        two((time_us / 1_000_000).cast("long") % 60),
        F.lit("."),
        F.lpad((time_us % 1_000_000).cast("string"), 6, "0"),
    )
    wire_uuid = F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )
    wire = events.select(
        "event_id",
        wire_interval.alias("interval_text"),
        wire_uuid.alias("uuid_text"),
    )
    # parse side: wire text only. Optional component groups parse to
    # '' -> 0 via the try-cast + coalesce idiom
    mon = F.coalesce(
        F.regexp_extract("interval_text", r"(\d+) mons?", 1).try_cast("long"),
        F.lit(0),
    )
    day = F.coalesce(
        F.regexp_extract("interval_text", r"(\d+) days?", 1).try_cast("long"),
        F.lit(0),
    )
    hh = F.regexp_extract("interval_text", r"(\d{2}):\d{2}:\d{2}\.", 1).cast("long")
    mm = F.regexp_extract("interval_text", r"\d{2}:(\d{2}):\d{2}\.", 1).cast("long")
    ss = F.regexp_extract("interval_text", r"\d{2}:\d{2}:(\d{2})\.", 1).cast("long")
    us = F.regexp_extract("interval_text", r"\.(\d{6})$", 1).cast("long")
    ver_nibble = F.substring("uuid_text", 15, 1)
    var_nibble = F.substring("uuid_text", 20, 1)
    var_val = F.conv(var_nibble, 16, 10).cast("long")
    return wire.select(
        "event_id",
        "interval_text",
        (
            (hh * 3_600_000_000 + mm * 60_000_000 + ss * 1_000_000 + us)
            + day * _US_PER_DAY
            + mon * _US_PER_MONTH
        ).alias("interval_us"),
        "uuid_text",
        F.conv(ver_nibble, 16, 10).cast("long").alias("uuid_version"),
        ((var_val >= 8) & (var_val <= 11)).alias("uuid_variant_rfc"),
    )
