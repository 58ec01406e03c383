"""PG type-system coverage, part 2 (SURVEY.md §2.J8-J11): PostGIS
EWKB geometry/geography, XML, and box-array codecs.

Reference semantics:
- spi/pgtypes/postgis_codec.go + geometry.go + geography.go — hex
  EWKB in, both byte orders, SRID flag, GeoJSON out.
- spi/pgtypes/xml.go — XML as validated pass-through string.
- spi/pgtypes/boxarray_codec.go — ``box[]`` text protocol uses a
  SEMICOLON element separator (the box literal itself contains
  commas), each element ``(x2,y2),(x1,y1)``.

All encode/decode is JVM-side codegen (string + integer arithmetic,
xpath built-ins); the DuckDB oracles re-derive the same wire text
independently, so the driver's value-hash compares a real round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.functions.geo import (
    attach_parsed_point,
    ewkb_bbox_polygon_hex,
    ewkb_point_hex,
    point_geojson,
    point_wkt,
)
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

# ---------------------------------------------------------------------------
# DuckDB-side helpers (SQL text fragments). The IEEE-754 encode is the
# same exact-integer-arithmetic construction as functions/geo.py —
# see that module's docstring for why it is exact.


def _sql_le(h: str, nbytes: int) -> str:
    """Byte-reverse a fixed-width hex expression (BE -> LE)."""
    pairs = [f"substr({h}, {2 * i + 1}, 2)" for i in range(nbytes)]
    return " || ".join(reversed(pairs))


def _sql_dbits(col: str) -> str:
    """16-hex-char big-endian IEEE-754 bit pattern of a nonnegative
    integer-valued column (expects ``{col}_e`` = length(bin(col))-1
    computed in an earlier CTE)."""
    e = f"{col}_e"
    return (
        f"CASE WHEN {col} = 0 THEN '0000000000000000' "
        f"ELSE lpad(to_hex((1023 + {e})::BIGINT * 4503599627370496 "
        f"+ (({col})::BIGINT - (2**{e})::BIGINT) * (2**(52 - {e}))::BIGINT), 16, '0') END"
    )


_SQL_GEO_SRC = """
        SELECT event_id,
               event_type,
               user_id + event_id % 97 AS gx,
               CAST(round(value, 0) AS BIGINT) AS gy,
               CASE WHEN event_id % 2 = 0 THEN 4326 ELSE 3857 END AS srid,
               event_id % 3 = 0 AS is_be,
               CASE WHEN user_id % 2 = 1 THEN 'geography' ELSE 'geometry' END AS kind
        FROM events
"""

_SQL_GEO_BITS = f"""
        SELECT *,
               length(bin(gx)) - 1 AS gx_e,
               length(bin(gy)) - 1 AS gy_e
        FROM src
"""

_SQL_GEO_HEX = f"""
        SELECT *,
               {_sql_dbits("gx")} AS xhex,
               {_sql_dbits("gy")} AS yhex,
               lpad(to_hex(srid), 8, '0') AS sridhex
        FROM bits
"""


@register(
    "pg_postgis",
    family="pgtypes",
    doc="PostGIS EWKB point codec round-trip (spi/pgtypes/"
    "postgis_codec.go:26-220, geometry.go, geography.go): encode "
    "SRID-flagged point EWKB in BOTH byte orders (the reference "
    "encoder emits big-endian, postgis_codec.go:118; PostGIS-native "
    "wire text is little-endian), decode back via pure-codegen "
    "IEEE-754 arithmetic, emit WKT + the envelope GeoJSON "
    "(postGisMarshalJson), plus distance/containment derivations. "
    "Narrow per-row projection, no shuffle, fully pushdown-safe.",
    oracle=f"""
        WITH src AS ({_SQL_GEO_SRC}),
        bits AS ({_SQL_GEO_BITS}),
        hx AS ({_SQL_GEO_HEX})
        SELECT event_id,
               kind,
               CASE WHEN is_be THEN 'XDR' ELSE 'NDR' END AS wire_endian,
               CASE WHEN is_be
                    THEN '00' || '20000001' || sridhex || xhex || yhex
                    ELSE '01' || '01000020' || {_sql_le("sridhex", 4)}
                         || {_sql_le("xhex", 8)} || {_sql_le("yhex", 8)}
               END AS ewkb_hex,
               srid AS srid_out,
               CAST(1 AS INT) AS geom_type,
               gx::DOUBLE AS x,
               gy::DOUBLE AS y,
               'POINT(' || gx || ' ' || gy || ')' AS wkt,
               '{{"type":"Point","coordinates":[' || gx || ',' || gy || ']}}' AS geojson,
               round(sqrt(gx * gx + gy * gy), 6) AS dist_origin,
               gx <= 100 AND gy <= 250 AS in_query_box
        FROM hx
    """,
)
def pg_postgis(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    src = events.select(
        "event_id",
        (F.col("user_id") + F.col("event_id") % 97).alias("gx"),
        F.round("value", 0).cast("long").alias("gy"),
        F.when(F.col("event_id") % 2 == 0, 4326).otherwise(3857).alias("srid"),
        (F.col("event_id") % 3 == 0).alias("is_be"),
        F.when(F.col("user_id") % 2 == 1, "geography").otherwise("geometry").alias("kind"),
    )
    # staged encode (r11): materialize the BE hex pieces once per row
    # instead of re-expanding the IEEE encode inside every CaseWhen
    # branch / le_bytes substring — byte-identical hex, 4.5x less
    # expression work (see attach_ewkb_point_hex)
    from timescaledb_event_streamer_spark.functions.geo import (
        attach_ewkb_point_hex,
    )

    enc = attach_ewkb_point_hex(
        src, F.col("gx"), F.col("gy"), F.col("srid"), big_endian=F.col("is_be")
    ).select("event_id", "kind", "ewkb_hex")
    # Decode ONLY from the wire hex — the round-trip is the test.
    # Staged projections, not the struct form: see attach_parsed_point.
    dec = attach_parsed_point(enc, "ewkb_hex")
    x, y = F.col("pt_x"), F.col("pt_y")
    return dec.select(
        "event_id",
        "kind",
        F.col("pt_endian").alias("wire_endian"),
        "ewkb_hex",
        F.col("pt_srid").alias("srid_out"),
        F.col("pt_geom_type").alias("geom_type"),
        x.alias("x"),
        y.alias("y"),
        point_wkt(x, y).alias("wkt"),
        point_geojson(x, y).alias("geojson"),
        F.round(F.sqrt(x * x + y * y), 6).alias("dist_origin"),
        ((x <= 100) & (y <= 250)).alias("in_query_box"),
    )


@register(
    "pg_postgis_polygon",
    family="pgtypes",
    doc="PostGIS EWKB polygon codec (postgis_codec.go type dispatch, "
    "geometry.go): per-table bbox ring encoded as a 5-point EWKB "
    "POLYGON (SRID 4326, little-endian), then the AREA is computed by "
    "DECODING the ring back out of the hex and running the shoelace "
    "formula over the recovered corners — the oracle derives area "
    "independently from the bbox aggregates, so an encode or decode "
    "bug cannot cancel out. One shuffle (the groupBy).",
    oracle=f"""
        WITH src AS ({_SQL_GEO_SRC}),
        agg AS (
            SELECT event_type,
                   min(gx) AS x0, max(gx) AS x1,
                   min(gy) AS y0, max(gy) AS y1,
                   count(*) AS n_points,
                   CAST(sum(CASE WHEN gx <= 50 AND gy <= 100 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_in_probe_box
            FROM src GROUP BY event_type
        ),
        bits AS (
            SELECT *,
                   length(bin(x0)) - 1 AS x0_e, length(bin(x1)) - 1 AS x1_e,
                   length(bin(y0)) - 1 AS y0_e, length(bin(y1)) - 1 AS y1_e
            FROM agg
        ),
        hx AS (
            SELECT *,
                   {_sql_dbits("x0")} AS x0h, {_sql_dbits("x1")} AS x1h,
                   {_sql_dbits("y0")} AS y0h, {_sql_dbits("y1")} AS y1h
            FROM bits
        ),
        led AS (
            SELECT *,
                   {_sql_le("x0h", 8)} AS x0l, {_sql_le("x1h", 8)} AS x1l,
                   {_sql_le("y0h", 8)} AS y0l, {_sql_le("y1h", 8)} AS y1l
            FROM hx
        )
        SELECT event_type,
               '01' || '03000020' || 'E6100000' || '01000000' || '05000000'
                   || x0l || y0l || x1l || y0l || x1l || y1l
                   || x0l || y1l || x0l || y0l AS ewkb_hex,
               CAST(4326 AS BIGINT) AS srid_out,
               n_points,
               n_in_probe_box,
               'POLYGON((' || x0 || ' ' || y0 || ',' || x1 || ' ' || y0 || ','
                   || x1 || ' ' || y1 || ',' || x0 || ' ' || y1 || ','
                   || x0 || ' ' || y0 || '))' AS wkt,
               ((x1 - x0) * (y1 - y0))::DOUBLE AS area
        FROM led
    """,
)
def pg_postgis_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    src = events.select(
        "event_type",
        (F.col("user_id") + F.col("event_id") % 97).alias("gx"),
        F.round("value", 0).cast("long").alias("gy"),
    )
    agg = src.groupBy("event_type").agg(
        F.min("gx").alias("x0"), F.max("gx").alias("x1"),
        F.min("gy").alias("y0"), F.max("gy").alias("y1"),
        F.count(F.lit(1)).alias("n_points"),
        F.sum(
            F.when((F.col("gx") <= 50) & (F.col("gy") <= 100), 1).otherwise(0)
        ).alias("n_in_probe_box"),
    )
    enc = agg.withColumn(
        "ewkb_hex",
        ewkb_bbox_polygon_hex(
            F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), F.lit(4326)
        ),
    )
    # Decode the ring back OUT of the hex: LE polygon layout is
    # endian(2) type(8) srid(8) nrings(8) npoints(8) then 5 corner
    # pairs of 16 hex chars each. Shoelace area over the recovered
    # corners proves both directions. Corners are materialized as
    # columns first (staged projections — see attach_parsed_point's
    # docstring for the 64 KB codegen rationale).
    from timescaledb_event_streamer_spark.functions.geo import (
        double_from_bits_hex,
        le_bytes,
    )

    dec = enc.withColumns(
        {
            f"_c{i}{ax}": double_from_bits_hex(
                le_bytes(F.substring("ewkb_hex", 35 + (i * 2 + axis) * 16, 16), 8)
            )
            for i in range(5)
            for axis, ax in ((0, "x"), (1, "y"))
        }
    )
    xs = [F.col(f"_c{i}x") for i in range(5)]
    ys = [F.col(f"_c{i}y") for i in range(5)]
    shoelace = xs[0] * ys[1] - xs[1] * ys[0]
    for i in range(1, 4):
        shoelace = shoelace + xs[i] * ys[i + 1] - xs[i + 1] * ys[i]
    srid_out = F.conv(le_bytes(F.substring("ewkb_hex", 11, 8), 4), 16, 10).cast("long")
    wkt_parts: list[F.Column] = [F.lit("POLYGON((")]
    for i in range(5):
        if i:
            wkt_parts.append(F.lit(","))
        wkt_parts += [
            xs[i].cast("long").cast("string"), F.lit(" "), ys[i].cast("long").cast("string"),
        ]
    wkt_parts.append(F.lit("))"))
    return dec.select(
        "event_type",
        "ewkb_hex",
        srid_out.alias("srid_out"),
        "n_points",
        "n_in_probe_box",
        F.concat(*wkt_parts).alias("wkt"),
        (F.abs(shoelace) / 2).alias("area"),
    )


@register(
    "pg_xml",
    family="pgtypes",
    doc="PG xml codec (spi/pgtypes/xml.go — validated pass-through "
    "string, JSON-marshalled into the envelope) + the XML analytic "
    "surface Spark adds: build the XML wire text from row fields, "
    "decode the attribute and every child element back into typed "
    "columns through ONE native from_xml parse per row (r11 — the "
    "per-field javax xpath chain cost ~55 us/row PER FIELD and is "
    "retired), and re-emit the envelope JSON string byte-identical "
    "to Go json.Marshal (xml.go MarshalJSON), including its HTML-safe "
    "escaping of < > & as \\u003c \\u003e \\u0026. The oracle derives "
    "every extracted value independently from the source columns, so "
    "the XML decode is checked against ground truth, not against "
    "itself.",
    oracle="""
        WITH src AS (
            SELECT event_id, user_id, event_type,
                   '<event id="' || event_id || '"><type>' || event_type
                       || '</type><user>' || user_id || '</user><cents>'
                       || CAST(round(value * 100) AS BIGINT) || '</cents></event>'
                       AS xml_text,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT event_id,
               xml_text,
               event_type AS x_type,
               user_id AS x_user,
               cents AS x_cents,
               event_id AS x_attr_id,
               user_id >= 8 AS x_power_user,
               '"' || replace(replace(replace(replace(xml_text,
                   '&', '\\u0026'), '<', '\\u003c'), '>', '\\u003e'),
                   '"', '\\"') || '"' AS envelope_json
        FROM src
    """,
)
def pg_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    xml = F.concat(
        F.lit('<event id="'), F.col("event_id").cast("string"),
        F.lit('"><type>'), F.col("event_type"),
        F.lit("</type><user>"), F.col("user_id").cast("string"),
        F.lit("</user><cents>"),
        F.round(F.col("value") * 100, 0).cast("long").cast("string"),
        F.lit("</cents></event>"),
    )
    w = events.select("event_id", xml.alias("xml_text"))
    # single-parse decode (r11): the original shape paid FIVE javax
    # xpath evaluations per row (~55 us/row EACH, the /event/user one
    # twice — 89% of the query). Spark's native XML reader pulls the
    # attribute and all three child fields out of ONE StAX parse per
    # row at ~2 us/row; the typed values are identical (clean digit
    # strings cast exactly like xpath_long's number coercion, the
    # element text like xpath_string — and the oracle re-derives every
    # extracted column from the source ground truth, so the decode
    # stays checked against truth, not against itself). coalesce
    # pins the one divergent edge: an empty <type> is '' under the
    # old xpath_string contract, never NULL.
    st = F.from_xml(
        "xml_text", "_id BIGINT, type STRING, user BIGINT, cents BIGINT"
    )
    w = w.select("event_id", "xml_text", st.alias("_x"))
    return w.select(
        "event_id",
        "xml_text",
        F.coalesce(F.col("_x.type"), F.lit("")).alias("x_type"),
        F.col("_x.user").alias("x_user"),
        F.col("_x.cents").alias("x_cents"),
        F.col("_x._id").alias("x_attr_id"),
        (F.col("_x.user") >= 8).alias("x_power_user"),
        # xml.go MarshalJSON: json.Marshal of the raw XML string —
        # including Go's default HTML-safe escaping of < > & to
        # \\u003c \\u003e \\u0026, so the envelope bytes match the
        # reference exactly, not just JSON-equivalently. Literal
        # replace() instead of regexp_replace (r11): same bytes, no
        # regex engine on the hot path.
        F.concat(
            F.lit('"'),
            F.replace(
                F.replace(
                    F.replace(
                        F.replace(
                            F.col("xml_text"), F.lit("&"), F.lit("\\u0026")
                        ),
                        F.lit("<"), F.lit("\\u003c"),
                    ),
                    F.lit(">"), F.lit("\\u003e"),
                ),
                F.lit('"'), F.lit('\\"'),
            ),
            F.lit('"'),
        ).alias("envelope_json"),
    )


@register(
    "pg_box_array",
    family="pgtypes",
    doc="PG box[] codec (spi/pgtypes/boxarray_codec.go:96-117): the "
    "text protocol separates box elements with SEMICOLONS (the box "
    "literal '(x2,y2),(x1,y1)' itself contains commas, which is why "
    "pgx's stock array codec breaks and the reference ships a custom "
    "scan plan). Build the wire literal, split on ';' after brace "
    "strip, parse each corner pair, and derive per-box geometry "
    "(area, probe-point containment, pairwise overlap).",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   user_id + event_id % 97 AS ax,
                   CAST(round(value, 0) AS BIGINT) AS ay,
                   user_id % 13 AS bx,
                   event_id % 29 AS by
            FROM events
        )
        SELECT event_id,
               '{(' || (ax + 10) || ',' || (ay + 5) || '),(' || ax || ',' || ay
                   || ');(' || (bx + 4) || ',' || (by + 8) || '),(' || bx || ',' || by
                   || ')}' AS box_array_text,
               CAST(2 AS INT) AS n_boxes,
               ax::DOUBLE AS b1_x1, ay::DOUBLE AS b1_y1,
               (ax + 10)::DOUBLE AS b1_x2, (ay + 5)::DOUBLE AS b1_y2,
               CAST(50 AS DOUBLE) AS b1_area,
               CAST(32 AS DOUBLE) AS b2_area,
               ax <= 12 AND ax + 10 >= 12 AND ay <= 20 AND ay + 5 >= 20
                   AS b1_contains_probe,
               ax <= bx + 4 AND bx <= ax + 10 AND ay <= by + 8 AND by <= ay + 5
                   AS boxes_overlap
        FROM src
    """,
)
def pg_box_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    src = events.select(
        "event_id",
        (F.col("user_id") + F.col("event_id") % 97).alias("ax"),
        F.round("value", 0).cast("long").alias("ay"),
        (F.col("user_id") % 13).alias("bx"),
        (F.col("event_id") % 29).alias("by"),
    )
    lit = F.concat(
        F.lit("{("), (F.col("ax") + 10).cast("string"), F.lit(","),
        (F.col("ay") + 5).cast("string"), F.lit("),("),
        F.col("ax").cast("string"), F.lit(","), F.col("ay").cast("string"),
        F.lit(");("), (F.col("bx") + 4).cast("string"), F.lit(","),
        (F.col("by") + 8).cast("string"), F.lit("),("),
        F.col("bx").cast("string"), F.lit(","), F.col("by").cast("string"),
        F.lit(")}"),
    )
    w = src.select("event_id", lit.alias("box_array_text"))
    # Decode: strip braces, split on ';' (boxarray_codec.go:107), then
    # regexp the two corner pairs per element. All codegen.
    elems = F.split(F.expr("substring(box_array_text, 2, length(box_array_text) - 2)"), ";")
    num = r"(-?\d+(?:\.\d+)?)"
    box_re = rf"\({num},{num}\),\({num},{num}\)"

    def corner(el: F.Column, group: int) -> F.Column:
        return F.regexp_extract(el, box_re, group).cast("double")

    b1, b2 = F.element_at(elems, 1), F.element_at(elems, 2)
    # PG normalizes box corners to (upper-right),(lower-left):
    # groups 1,2 = x2,y2 (high), groups 3,4 = x1,y1 (low).
    b1x2, b1y2, b1x1, b1y1 = corner(b1, 1), corner(b1, 2), corner(b1, 3), corner(b1, 4)
    b2x2, b2y2, b2x1, b2y1 = corner(b2, 1), corner(b2, 2), corner(b2, 3), corner(b2, 4)
    return w.select(
        "event_id",
        "box_array_text",
        F.size(elems).alias("n_boxes"),
        b1x1.alias("b1_x1"), b1y1.alias("b1_y1"),
        b1x2.alias("b1_x2"), b1y2.alias("b1_y2"),
        ((b1x2 - b1x1) * (b1y2 - b1y1)).alias("b1_area"),
        ((b2x2 - b2x1) * (b2y2 - b2y1)).alias("b2_area"),
        ((b1x1 <= 12) & (b1x2 >= 12) & (b1y1 <= 20) & (b1y2 >= 20))
        .alias("b1_contains_probe"),
        ((b1x1 <= b2x2) & (b2x1 <= b1x2) & (b1y1 <= b2y2) & (b2y1 <= b1y2))
        .alias("boxes_overlap"),
    )


@register(
    "cdc_pgoutput_roundtrip",
    family="cdc",
    doc="pgoutput BINARY logical-replication frame round-trip — the "
    "reference's actual wire format (replicationconnection.go:36, "
    "spi/pgtypes/logicalreplicationmessage.go:47, typemanager/"
    "decoderplan.go): synthesize XLogData-wrapped B/C/R/I/U/D frames "
    "from the simulated transaction log, then decode envelopes back "
    "out of the wire hex alone — length-prefixed tuple values, "
    "null-terminated relation strings, PG-epoch commit timestamps, "
    "and xid/ts attach via a segmented transaction-tracker LOCF "
    "(no full-stream single-partition window). The oracle derives "
    "every output column independently from the source rows, so an "
    "encode/decode bug cannot cancel out.",
    oracle="""
        WITH base AS (
            SELECT event_id, user_id, event_type, props,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CASE WHEN event_id % 10 = 0 THEN 'd'
                        WHEN event_id % 10 IN (1, 2) THEN 'u'
                        ELSE 'c' END AS op,
                   event_id * 4 + 2 AS lsn,
                   CAST(floor(event_id / 100) AS BIGINT) AS xid,
                   ts
            FROM events
        ),
        tx AS (SELECT xid, max(ts) AS commit_ts FROM base GROUP BY xid)
        SELECT 'timescaledb.public.' || b.event_type AS topic,
               b.op,
               'public' AS source_schema,
               b.event_type AS source_table,
               b.lsn,
               b.xid,
               CAST(epoch_us(t.commit_ts) // 1000 AS BIGINT) AS ts_ms,
               b.user_id AS key_user_id,
               CASE WHEN b.op IN ('u', 'd') THEN b.user_id END AS before_user_id,
               CASE WHEN b.op IN ('c', 'u') THEN b.user_id END AS after_user_id,
               CASE WHEN b.op IN ('c', 'u') THEN b.cents END AS after_cents,
               CASE WHEN b.op IN ('c', 'u') THEN b.props END AS after_props
        FROM base b JOIN tx t USING (xid)
    """,
)
def cdc_pgoutput_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_pgoutput,
        synthesize_pgoutput,
    )

    return parse_pgoutput(synthesize_pgoutput(load(spark, sf_dir, "events")))


@register(
    "cdc_pgoutput_messages",
    family="cdc",
    doc="pgoutput admin-frame round-trip — the four message kinds the "
    "reference's binary path dispatches beyond B/C/R/I/U/D: Truncate "
    "'T' (replicationhandler.go:304, relid vector + CASCADE/RESTART "
    "option bits, fanned out to one row per truncated relation via "
    "the 'R' catalog), LogicalDecodingMessage 'M' "
    "(spi/pgtypes/logicalreplicationmessage.go:47 — flags, embedded "
    "LSN, prefix cstring, length-prefixed content), composite Type "
    "'Y' registrations (replicationhandler.go:316), and Origin 'O' "
    "announcements (replicationhandler.go:326). Synthesized from the "
    "simulated WAL, decoded back from the wire hex alone; the oracle "
    "derives every row independently from the source table, so an "
    "encode/decode bug cannot cancel out.",
    oracle="""
        WITH mx AS (SELECT max(event_id) AS m FROM events),
             rels AS (SELECT DISTINCT event_type FROM events)
        SELECT 'm' AS op,
               event_id * 4 + 1 AS lsn,
               CAST(NULL AS VARCHAR) AS source_table,
               event_type AS prefix,
               props AS content,
               CAST(event_id % 2 = 1 AS VARCHAR) AS transactional,
               CAST(NULL AS VARCHAR) AS cascade_opt,
               CAST(NULL AS VARCHAR) AS restart_identity
        FROM events WHERE event_id % 10 = 5
        UNION ALL
        SELECT 't', 4 * m + 5, event_type, NULL, NULL, NULL, 'true', 'true'
        FROM rels, mx
        UNION ALL
        SELECT 'y', 0, event_type || '_t', 'public', NULL, NULL, NULL, NULL
        FROM rels
        UNION ALL
        SELECT 'o', 4 * m + 7, NULL, 'pgstream', NULL, NULL, NULL, NULL
        FROM mx
    """,
)
def cdc_pgoutput_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_admin_frames,
        synthesize_admin_frames,
    )

    return parse_admin_frames(synthesize_admin_frames(load(spark, sf_dir, "events")))


@register(
    "cdc_keepalive_status",
    family="cdc",
    doc="Replication-protocol control frames: primary keepalive 'k' "
    "decode + the standby status reply the client computes "
    "(replicationhandler.go:163-176 dispatch; ServerWALEnd/ServerTime/"
    "ReplyRequested fields; replicationcontext.go:241-249 "
    "AcknowledgeReceived = WALStart + len(WALData); "
    "replicationconnection.go:94-105 SendStatusUpdate = processed "
    "LSN + 1 with write == apply == flush). Synthesizes the raw "
    "CopyData mix one slot per relation, then parses posture from the "
    "wire hex alone; the oracle derives every column independently "
    "from the source rows, so an encode/decode bug cannot cancel out. "
    "Per-slot single-row aggregation — metadata-sized shuffle at any "
    "corpus scale.",
    oracle="""
        WITH base AS (
            SELECT event_type AS slot,
                   event_id % 5 = 0 AS is_k,
                   event_id % 15 = 0 AS reply,
                   event_id * 4 + 2 AS lsn,
                   strlen(props) AS plen,
                   epoch_us(ts) AS us
            FROM events
        )
        SELECT slot,
               count(*) AS n_frames,
               CAST(sum(CASE WHEN is_k THEN 1 ELSE 0 END) AS BIGINT) AS n_keepalive,
               CAST(sum(CASE WHEN is_k THEN 0 ELSE 1 END) AS BIGINT) AS n_xlog,
               CAST(sum(CASE WHEN is_k AND reply THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_reply_requested,
               max(CASE WHEN NOT is_k THEN lsn + plen END) AS last_received_lsn,
               max(CASE WHEN NOT is_k THEN lsn + plen END) + 1 AS standby_write_lsn,
               max(CASE WHEN NOT is_k THEN lsn + plen END) + 1 AS standby_apply_lsn,
               max(CASE WHEN is_k THEN lsn END) AS max_keepalive_wal_end,
               CAST(floor(max(us) / 1000) AS BIGINT) AS last_server_time_ms
        FROM base
        GROUP BY slot
    """,
)
def cdc_keepalive_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_standby_status,
        synthesize_copydata,
    )

    return parse_standby_status(synthesize_copydata(load(spark, sf_dir, "events")))


@register(
    "cdc_replication_channel_stats",
    family="cdc",
    doc="Replication-channel counter struct over the decoded pgoutput "
    "stream (internal/stats + replicationhandler.go:40-48): "
    "total/insert/update/delete/skipped call counters, transaction "
    "count, and largest-transaction gauge — with the restart-LSN "
    "skip rule applied exactly as the handler does "
    "(replicationhandler.go:195-206: a frame whose WALStart is below "
    "the slot's restart LSN is counted total+skipped and never "
    "reaches the op counters). Restart LSN is the deterministic 40% "
    "point of the WAL span (a mid-stream resume). Two-level fold: "
    "per-xid partial counts (one metadata-sized shuffle) then a "
    "single global reduce; the oracle recomputes every counter from "
    "the source rows.",
    oracle="""
        WITH r AS (
            SELECT CAST(floor((4 * max(event_id) + 2) * 2 / 5) AS BIGINT)
                AS restart_lsn
            FROM events
        ),
        env AS (
            SELECT CAST(floor(event_id / 100) AS BIGINT) AS xid,
                   event_id * 4 + 2 AS lsn,
                   CASE WHEN event_id % 10 = 0 THEN 'd'
                        WHEN event_id % 10 IN (1, 2) THEN 'u'
                        ELSE 'c' END AS op
            FROM events
        ),
        fl AS (SELECT xid, op, lsn < restart_lsn AS skip FROM env, r),
        perx AS (
            SELECT xid,
                   count(*) AS tot,
                   sum(CASE WHEN skip THEN 1 ELSE 0 END) AS sk,
                   sum(CASE WHEN NOT skip AND op = 'c' THEN 1 ELSE 0 END) AS ins,
                   sum(CASE WHEN NOT skip AND op = 'u' THEN 1 ELSE 0 END) AS upd,
                   sum(CASE WHEN NOT skip AND op = 'd' THEN 1 ELSE 0 END) AS del,
                   sum(CASE WHEN NOT skip THEN 1 ELSE 0 END) AS live
            FROM fl GROUP BY xid
        )
        SELECT (SELECT restart_lsn FROM r) AS restart_lsn,
               CAST(sum(tot) AS BIGINT) AS n_total,
               CAST(sum(sk) AS BIGINT) AS n_skipped,
               CAST(sum(ins) AS BIGINT) AS n_inserts,
               CAST(sum(upd) AS BIGINT) AS n_updates,
               CAST(sum(del) AS BIGINT) AS n_deletes,
               CAST(sum(CASE WHEN live > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_transactions,
               CAST(max(live) AS BIGINT) AS largest_transaction
        FROM perx
    """,
)
def cdc_replication_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        parse_pgoutput,
        synthesize_pgoutput,
    )

    env = parse_pgoutput(synthesize_pgoutput(load(spark, sf_dir, "events"))).select(
        "xid", "lsn", "op"
    )
    restart = env.agg(
        F.floor(F.max("lsn") * 2 / 5).cast("long").alias("restart_lsn")
    )
    fl = env.crossJoin(F.broadcast(restart)).withColumn(
        "skip", F.col("lsn") < F.col("restart_lsn")
    )
    live = F.sum(F.when(~F.col("skip"), 1).otherwise(0))

    def op_count(op: str):
        return F.sum(F.when(~F.col("skip") & (F.col("op") == op), 1).otherwise(0))

    perx = fl.groupBy("xid", "restart_lsn").agg(
        F.count(F.lit(1)).alias("tot"),
        F.sum(F.when(F.col("skip"), 1).otherwise(0)).alias("sk"),
        op_count("c").alias("ins"),
        op_count("u").alias("upd"),
        op_count("d").alias("del"),
        live.alias("live"),
    )
    return perx.groupBy("restart_lsn").agg(
        F.sum("tot").alias("n_total"),
        F.sum("sk").alias("n_skipped"),
        F.sum("ins").alias("n_inserts"),
        F.sum("upd").alias("n_updates"),
        F.sum("del").alias("n_deletes"),
        F.sum(F.when(F.col("live") > 0, 1).otherwise(0)).alias("n_transactions"),
        F.max("live").alias("largest_transaction"),
    )


@register(
    "pg_geom_lines",
    family="pgtypes",
    doc="PG geometric wire-text codecs beyond point/box (the "
    "reference's datatype matrix: lseg, line, circle, path — "
    "tests/datatype_test.go; spi/pgtypes geometry text protocol): "
    "build each literal from integer row derivations, parse back "
    "with codegen regexps, and derive geometry semantics — segment "
    "length, line slope/intercept from the {A,B,C} coefficient form, "
    "circle area and point-containment, path arity and openness "
    "('[' = open, '(' = closed). The oracle re-derives every output "
    "from the generating columns, so a build/parse bug cannot cancel "
    "out. Narrow projection, no shuffle, pushdown-safe.",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   user_id % 50 AS x1,
                   CAST(round(value, 0) AS BIGINT) AS y1,
                   user_id % 50 + event_id % 20 + 1 AS x2,
                   CAST(round(value, 0) AS BIGINT) + event_id % 10 + 1 AS y2,
                   event_id % 30 + 1 AS r,
                   event_id % 2 = 1 AS open
            FROM events
        ),
        geo AS (
            SELECT *,
                   y1 - y2 AS la, x2 - x1 AS lb,
                   -((y1 - y2) * x1 + (x2 - x1) * y1) AS lc
            FROM src
        )
        SELECT event_id,
               '[(' || x1 || ',' || y1 || '),(' || x2 || ',' || y2 || ')]'
                   AS lseg_text,
               '{' || la || ',' || lb || ',' || lc || '}' AS line_text,
               '<(' || x1 || ',' || y2 || '),' || r || '>' AS circle_text,
               CASE WHEN open
                    THEN '[(' || x1 || ',' || y1 || '),(' || x2 || ',' || y2
                         || '),(' || (x1 + 1) || ',' || (y1 + 2) || ')]'
                    ELSE '((' || x1 || ',' || y1 || '),(' || x2 || ',' || y2
                         || '),(' || (x1 + 1) || ',' || (y1 + 2) || '))'
               END AS path_text,
               round(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)), 6)
                   AS lseg_len,
               round(-la * 1.0 / lb, 6) AS line_slope,
               round(-lc * 1.0 / lb, 6) AS line_y_intercept,
               round(pi() * r * r, 6) AS circle_area,
               (x1 - x1) * (x1 - x1) + (y1 - y2) * (y1 - y2) <= r * r
                   AS circle_contains_p1,
               3 AS path_points,
               open AS path_is_open
        FROM geo
    """,
)
def pg_geom_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    x1 = F.col("user_id") % 50
    y1 = F.round("value", 0).cast("long")
    x2 = x1 + F.col("event_id") % 20 + 1
    y2 = y1 + F.col("event_id") % 10 + 1
    r = F.col("event_id") % 30 + 1
    is_open = F.col("event_id") % 2 == 1
    la, lb = y1 - y2, x2 - x1
    lc = -(la * x1 + lb * y1)

    def s(c):
        return c.cast("string")

    pt = lambda a, b: F.concat(F.lit("("), s(a), F.lit(","), s(b), F.lit(")"))  # noqa: E731
    lseg = F.concat(F.lit("["), pt(x1, y1), F.lit(","), pt(x2, y2), F.lit("]"))
    line = F.concat(F.lit("{"), s(la), F.lit(","), s(lb), F.lit(","), s(lc), F.lit("}"))
    circle = F.concat(F.lit("<"), pt(x1, y2), F.lit(","), s(r), F.lit(">"))
    pts3 = F.concat(pt(x1, y1), F.lit(","), pt(x2, y2), F.lit(","), pt(x1 + 1, y1 + 2))
    path = F.when(is_open, F.concat(F.lit("["), pts3, F.lit("]"))).otherwise(
        F.concat(F.lit("("), pts3, F.lit(")"))
    )
    w = events.select(
        "event_id", lseg.alias("lseg_text"), line.alias("line_text"),
        circle.alias("circle_text"), path.alias("path_text"),
    )
    # parse ONLY from the wire text
    num = r"(-?\d+)"
    sx1 = F.regexp_extract("lseg_text", rf"^\[\({num},", 1).cast("long")
    sy1 = F.regexp_extract("lseg_text", rf"^\[\(-?\d+,{num}\)", 1).cast("long")
    sx2 = F.regexp_extract("lseg_text", rf",\({num},-?\d+\)\]$", 1).cast("long")
    sy2 = F.regexp_extract("lseg_text", rf",{num}\)\]$", 1).cast("long")
    pa = F.regexp_extract("line_text", rf"^\{{{num},", 1).cast("long")
    pb = F.regexp_extract("line_text", rf",{num},", 1).cast("long")
    pc = F.regexp_extract("line_text", rf",{num}\}}$", 1).cast("long")
    cx = F.regexp_extract("circle_text", rf"^<\({num},", 1).cast("long")
    cy = F.regexp_extract("circle_text", rf",{num}\),", 1).cast("long")
    cr = F.regexp_extract("circle_text", rf"\),{num}>$", 1).cast("long")
    n_pts = F.size(F.split(F.col("path_text"), r"\),\(")).cast("int")
    return w.select(
        "event_id",
        "lseg_text", "line_text", "circle_text", "path_text",
        F.round(F.sqrt((sx2 - sx1) * (sx2 - sx1) + (sy2 - sy1) * (sy2 - sy1)), 6)
        .alias("lseg_len"),
        F.round(-pa * 1.0 / pb, 6).alias("line_slope"),
        F.round(-pc * 1.0 / pb, 6).alias("line_y_intercept"),
        F.round(F.lit(3.141592653589793) * cr * cr, 6).alias("circle_area"),
        ((sx1 - cx) * (sx1 - cx) + (sy1 - cy) * (sy1 - cy) <= cr * cr)
        .alias("circle_contains_p1"),
        n_pts.alias("path_points"),
        F.col("path_text").startswith("[").alias("path_is_open"),
    )


@register(
    "pg_hstore_bitstrings",
    family="pgtypes",
    doc="Remaining datatype-matrix wire codecs "
    "(tests/datatype_test.go: hstore, bit/varbit, bytea, macaddr8): "
    "hstore '\"k\"=>\"v\"' literals with NULL values, varbit binary "
    "strings of natural width, PG '\\x' bytea hex, and 8-byte EUI-64 "
    "MACs — built from row derivations, parsed back from the wire "
    "text alone (regexp + base-conversion codegen). The oracle "
    "derives every parsed value independently from the generating "
    "columns (never by re-parsing), so build and parse bugs cannot "
    "cancel out.",
    oracle="""
        WITH src AS (
            SELECT event_id, user_id, event_type, props,
                   user_id % 509 + 1 AS bits_val,
                   event_id % 3 = 0 AS note_null
            FROM events
        )
        SELECT event_id,
               '"user"=>"' || user_id || '", "type"=>"' || event_type
                   || '", "note"=>' ||
                   CASE WHEN note_null THEN 'NULL'
                        ELSE '"n' || event_id % 7 || '"' END AS hstore_text,
               3 AS hstore_pairs,
               user_id AS hstore_user,
               event_type AS hstore_type,
               note_null AS hstore_note_is_null,
               bin(bits_val) AS varbit_text,
               strlen(bin(bits_val)) AS varbit_len,
               bits_val AS varbit_value,
               '\\x' || lower(hex(encode(substr(props, 1, 6)))) AS bytea_text,
               strlen(substr(props, 1, 6)) AS bytea_len,
               -- first BYTE of the UTF-8 encoding (not the first code
               -- point): both engines parse the leading hex pair of the
               -- wire text, so the compare stays byte-based even on
               -- multibyte-leading props values
               CAST(('0x' || substr(hex(encode(substr(props, 1, 1))), 1, 2)) AS INT)
                   AS bytea_first,
               lower(lpad(to_hex((event_id // 72057594037927936) % 256), 2, '0')) || ':'
                   || lower(lpad(to_hex((event_id // 281474976710656) % 256), 2, '0')) || ':'
                   || lower(lpad(to_hex((event_id // 1099511627776) % 256), 2, '0')) || ':'
                   || lower(lpad(to_hex((event_id // 4294967296) % 256), 2, '0')) || ':'
                   || lower(lpad(to_hex((event_id // 16777216) % 256), 2, '0')) || ':'
                   || lower(lpad(to_hex((event_id // 65536) % 256), 2, '0')) || ':'
                   || lower(lpad(to_hex((event_id // 256) % 256), 2, '0')) || ':'
                   || lower(lpad(to_hex(event_id % 256), 2, '0')) AS macaddr8_text,
               (event_id // 72057594037927936) % 2 = 0 AS mac_is_unicast,
               ((event_id // 72057594037927936) % 4) >= 2 AS mac_is_local
        FROM src
    """,
)
def pg_hstore_bitstrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    uid, eid = F.col("user_id"), F.col("event_id")
    note_null = eid % 3 == 0
    hstore = F.concat(
        F.lit('"user"=>"'), uid.cast("string"),
        F.lit('", "type"=>"'), F.col("event_type"),
        F.lit('", "note"=>'),
        F.when(note_null, F.lit("NULL")).otherwise(
            F.concat(F.lit('"n'), (eid % 7).cast("string"), F.lit('"'))
        ),
    )
    bits_val = uid % 509 + 1
    varbit = F.bin(bits_val)
    bytea = F.concat(
        F.lit("\\x"),
        F.lower(F.hex(F.encode(F.substring("props", 1, 6), "UTF-8"))),
    )
    mac_bytes = [F.lpad(F.lower(F.hex(F.shiftright(eid, 8 * i) % 256)), 2, "0")
                 for i in range(7, -1, -1)]
    mac = F.concat_ws(":", *mac_bytes)
    w = events.select(
        "event_id",
        hstore.alias("hstore_text"), varbit.alias("varbit_text"),
        bytea.alias("bytea_text"), mac.alias("macaddr8_text"),
    )
    # parse ONLY from the wire text
    first_mac_byte = F.conv(F.substring("macaddr8_text", 1, 2), 16, 10).cast("long")
    return w.select(
        "event_id",
        "hstore_text",
        (F.size(F.split("hstore_text", "=>")) - 1).cast("int").alias("hstore_pairs"),
        F.regexp_extract("hstore_text", r'"user"=>"(\d+)"', 1).cast("long")
        .alias("hstore_user"),
        F.regexp_extract("hstore_text", r'"type"=>"([^"]*)"', 1).alias("hstore_type"),
        F.col("hstore_text").endswith("=>NULL").alias("hstore_note_is_null"),
        "varbit_text",
        F.length("varbit_text").cast("long").alias("varbit_len"),
        F.conv(F.col("varbit_text"), 2, 10).cast("long").alias("varbit_value"),
        "bytea_text",
        (F.length("bytea_text") / 2 - 1).cast("long").alias("bytea_len"),
        F.conv(F.substring("bytea_text", 3, 2), 16, 10).cast("long").alias("bytea_first"),
        "macaddr8_text",
        (first_mac_byte % 2 == 0).alias("mac_is_unicast"),
        (first_mac_byte % 4 >= 2).alias("mac_is_local"),
    )


@register(
    "cdc_relation_versioning",
    family="cdc",
    doc="Mid-stream schema evolution: the reference's relation cache "
    "replaces the cached schema whenever a NEW Relation frame "
    "arrives, and later data frames decode under the new column set "
    "(replicationhandler.go Relation dispatch; internal/typemanager "
    "decoder-plan rebuild per registration). Synthesis re-announces "
    "every relation at LSN 2*max(event_id) with a fourth column; "
    "resolve decodes ALL R frames into validity intervals "
    "(metadata-sized, broadcast) and interval-joins the data stream "
    "to the latest announcement at-or-before each frame's LSN — the "
    "stream itself never shuffles for the resolve. Oracle derives "
    "the version split independently from the LSN layout.",
    oracle="""
        WITH mx AS (SELECT 2 * max(event_id) AS thr FROM events),
        env AS (SELECT event_type, event_id * 4 + 2 AS lsn FROM events),
        led AS (
            SELECT event_type, lsn,
                   CASE WHEN lsn >= thr THEN 4 ELSE 3 END AS v
            FROM env, mx
        )
        SELECT event_type AS source_table,
               CAST(v AS BIGINT) AS schema_version_cols,
               count(*) AS n_events,
               min(lsn) AS first_lsn,
               max(lsn) AS last_lsn
        FROM led
        GROUP BY 1, 2
    """,
)
def cdc_relation_versioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.pgoutput import (
        resolve_schema_versions,
        synthesize_versioned_log,
    )

    return resolve_schema_versions(
        synthesize_versioned_log(load(spark, sf_dir, "events"))
    )


@register(
    "pg_temporal_ranges",
    family="pgtypes",
    doc="Temporal + numeric range wire-text codecs — the range kinds "
    "the reference's datatype matrix exercises beyond int8range "
    "(tests/datatype_test.go: tsrange, daterange, numrange; "
    "spi/pgtypes range decoding): PG emits quoted timestamp bounds "
    "for tsrange and bare bounds for daterange/numrange. Literals "
    "are built from per-event derivations (containing hour / 7-day "
    "chunk week / quarter-step value band), parsed back from the "
    "wire text ALONE via codegen regexps, with containment and "
    "half-open-bound semantics; the oracle derives every parsed "
    "value independently from the generating columns.",
    oracle="""
        WITH w AS (
            SELECT event_id, ts, value,
                   date_trunc('hour', ts) AS hlo,
                   to_timestamp((epoch_us(ts) // 1000000)
                       - ((epoch_us(ts) // 1000000) % 604800))::TIMESTAMP AS wlo,
                   floor(value * 4) / 4 AS nlo
            FROM events
        )
        SELECT event_id,
               '["' || strftime(hlo, '%Y-%m-%d %H:%M:%S') || '","'
                    || strftime(hlo + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S')
                    || '")' AS tsrange_text,
               CAST(epoch_us(hlo) // 1000000 AS BIGINT) AS tsr_lo_s,
               CAST(epoch_us(hlo + INTERVAL 1 HOUR) // 1000000 AS BIGINT)
                   AS tsr_hi_s,
               ts >= hlo AND ts < hlo + INTERVAL 30 MINUTE
                   AS tsr_first_half,
               '[' || strftime(wlo, '%Y-%m-%d') || ','
                   || strftime(wlo + INTERVAL 7 DAY, '%Y-%m-%d')
                   || ')' AS daterange_text,
               strftime(wlo, '%Y-%m-%d') AS dr_lo,
               strftime(wlo + INTERVAL 7 DAY, '%Y-%m-%d') AS dr_hi,
               CAST(7 AS BIGINT) AS dr_days,
               '[' || CAST(CAST(nlo AS DECIMAL(38,2)) AS VARCHAR) || ','
                   || CAST(CAST(nlo + 0.25 AS DECIMAL(38,2)) AS VARCHAR)
                   || ')' AS numrange_text,
               nlo AS nr_lo,
               nlo + 0.25 AS nr_hi,
               value >= nlo AND value < nlo + 0.25 AS nr_contains_value
        FROM w
    """,
)
def pg_temporal_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.tables import spread

    # per-row regex codec over a narrow projection: spread() restores
    # source parallelism when the input arrives as one split (no-op on
    # a real multi-split table)
    events = spread(load(spark, sf_dir, "events"))
    hlo = F.date_trunc("hour", F.col("ts"))
    hhi = hlo + F.expr("INTERVAL 1 HOUR")
    wk_s = F.unix_timestamp("ts") - F.pmod(F.unix_timestamp("ts"), F.lit(604800))
    wlo = F.timestamp_seconds(wk_s)
    nlo = F.floor(F.col("value") * 4) / 4
    fmt = "yyyy-MM-dd HH:mm:ss"
    w = events.select(
        "event_id", "ts", "value",
        F.concat(
            F.lit('["'), F.date_format(hlo, fmt), F.lit('","'),
            F.date_format(hhi, fmt), F.lit('")'),
        ).alias("tsrange_text"),
        F.concat(
            F.lit("["), F.date_format(wlo, "yyyy-MM-dd"), F.lit(","),
            F.date_format(wlo + F.expr("INTERVAL 7 DAY"), "yyyy-MM-dd"),
            F.lit(")"),
        ).alias("daterange_text"),
        # DECIMAL(38,2) rendering: identical digit strings on both
        # engines for negative bounds and large magnitudes (double
        # cast-to-string would disagree on E-notation thresholds)
        F.concat(
            F.lit("["), nlo.cast("decimal(38,2)").cast("string"), F.lit(","),
            (nlo + 0.25).cast("decimal(38,2)").cast("string"), F.lit(")"),
        ).alias("numrange_text"),
    )
    # parse ONLY from the wire text
    tsr_lo = F.to_timestamp(
        F.regexp_extract("tsrange_text", r'^\["([^"]+)"', 1), fmt
    )
    tsr_hi = F.to_timestamp(
        F.regexp_extract("tsrange_text", r'"([^"]+)"\)$', 1), fmt
    )
    nr_lo = F.regexp_extract("numrange_text", r"^\[(-?[0-9.]+),", 1).cast("double")
    nr_hi = F.regexp_extract("numrange_text", r",(-?[0-9.]+)\)$", 1).cast("double")
    dr_lo = F.regexp_extract("daterange_text", r"^\[([0-9-]+),", 1)
    dr_hi = F.regexp_extract("daterange_text", r",([0-9-]+)\)$", 1)
    return w.select(
        "event_id",
        "tsrange_text",
        F.unix_timestamp(tsr_lo).alias("tsr_lo_s"),
        F.unix_timestamp(tsr_hi).alias("tsr_hi_s"),
        ((F.col("ts") >= tsr_lo)
         & (F.col("ts") < tsr_lo + F.expr("INTERVAL 30 MINUTE")))
        .alias("tsr_first_half"),
        "daterange_text",
        dr_lo.alias("dr_lo"),
        dr_hi.alias("dr_hi"),
        F.datediff(F.to_date(dr_hi), F.to_date(dr_lo)).cast("long").alias("dr_days"),
        "numrange_text",
        nr_lo.alias("nr_lo"),
        nr_hi.alias("nr_hi"),
        ((F.col("value") >= nr_lo) & (F.col("value") < nr_hi))
        .alias("nr_contains_value"),
    )
