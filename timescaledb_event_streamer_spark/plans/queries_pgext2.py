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
from timescaledb_event_streamer_spark.sources.tables import load

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
