"""PostGIS EWKB codec — pure-codegen encode/decode of hex EWKB.

Reference semantics: spi/pgtypes/postgis_codec.go:26-220 (geometry /
geography values arrive as hex-encoded EWKB in text format or raw
EWKB bytes in binary format; the codec validates the endian byte,
decodes via ewkb.Unmarshal — both byte orders — and re-emits events
as GeoJSON), spi/pgtypes/geometry.go + geography.go (value wrappers).

Spark-first design: no Python UDFs. EWKB is a deterministic byte
layout, so both directions are expressible as JVM-side string/integer
arithmetic that whole-stage codegen compiles:

- IEEE-754 encode (integer-valued coords): for n > 0,
  ``expo = length(bin(n)) - 1`` (exact — no floating log2),
  ``mant = (n - 2^expo) * 2^(52-expo)`` (exact: < 2^52),
  ``bits = (1023 + expo) * 2^52 + mant`` in BIGINT arithmetic.
- IEEE-754 decode (any finite normal double): ``conv(hex, 16, 10)``
  as unsigned decimal(20,0); sign/exponent/mantissa splits are
  divisions by powers of two, and ``(1 + mant/2^52) * 2^(expo-1023)``
  is EXACT in double arithmetic (mant/2^52 and the power-of-two
  product only shift the exponent).

The same formulas run verbatim in DuckDB (bin/to_hex/lpad/substr),
which is what makes the driver's hash-comparing oracle possible.

Layout handled: [endian:1][type+flags:4][srid?:4][coords:8 each],
flags SRID=0x20000000 (wkbZ/wkbM offsets documented but not emitted
by the testdata derivation). Subnormals/Inf/NaN are out of scope —
PostGIS coordinates in the reference's test corpus are finite.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO52 = 4503599627370496  # 2^52
SRID_FLAG = 0x20000000

# ---------------------------------------------------------------------------
# hex helpers


def _hex_long(col: Column, width: int) -> Column:
    """Zero-padded uppercase hex of a nonnegative BIGINT column."""
    return F.lpad(F.hex(col.cast("long")), width, "0")


def le_bytes(hexcol: Column, nbytes: int) -> Column:
    """Reverse the byte order of a fixed-width hex string (BE <-> LE)."""
    pairs = [F.substring(hexcol, 2 * i + 1, 2) for i in range(nbytes)]
    return F.concat(*reversed(pairs))


# ---------------------------------------------------------------------------
# IEEE-754 double <-> 16-hex-char bit pattern


def double_bits_hex(n: Column) -> Column:
    """Big-endian hex bit pattern of ``CAST(n AS DOUBLE)`` for a
    NONNEGATIVE integer-valued column. Exact integer arithmetic; no
    floating log2 (``length(bin(n)) - 1`` is the exponent).

    Domain: 0 <= n < 2^53 (exactly representable doubles). Out-of-range
    input returns NULL rather than silently encoding garbage — negative
    n would make ``bin`` emit 64-char two's complement and n >= 2^53
    truncates the mantissa multiplier to 0."""
    n = n.cast("long")
    expo = (F.length(F.bin(n)) - 1).cast("long")
    mant = ((n - F.pow(F.lit(2.0), expo).cast("long"))
            * F.pow(F.lit(2.0), F.lit(52) - expo).cast("long"))
    bits = (F.lit(1023) + expo) * F.lit(TWO52) + mant
    return (
        F.when((n < 0) | (expo > 52), F.lit(None).cast("string"))
        .when(n == 0, F.lit("0000000000000000"))
        .otherwise(_hex_long(bits, 16))
    )


def double_from_bits_hex(h: Column) -> Column:
    """Decode a 16-hex-char big-endian IEEE-754 bit pattern to DOUBLE.
    Handles sign and all finite normals (exact — see module doc);
    bits == 0 decodes to 0.0."""
    # Split the top hex digit off so all arithmetic fits signed 64-bit
    # (the full pattern can exceed Long.MAX when the sign bit is set).
    hi = F.conv(F.substring(h, 1, 1), 16, 10).cast("long")
    sign = F.floor(hi / 8).cast("long")
    rest = (hi % 8) * F.lit(1152921504606846976) + F.conv(
        F.substring(h, 2, 15), 16, 10
    ).cast("long")
    # integer shift, NOT floor(rest / 2^52): the double division rounds
    # up for mantissas near 2^52 (rest > 2^53 is not exactly
    # representable), which made the exponent off by one and doubled
    # the decoded value — caught by the roundtrip property test
    expo = F.shiftright(rest, 52).cast("long")
    mant = (rest % F.lit(TWO52)).cast("double")
    mag = (F.lit(1.0) + mant / F.lit(float(TWO52))) * F.pow(
        F.lit(2.0), (expo - 1023).cast("double")
    )
    val = F.when(rest == 0, F.lit(0.0)).otherwise(mag)
    return F.when(sign == 1, -val).otherwise(val)


# ---------------------------------------------------------------------------
# EWKB encode (testdata derivation writes both byte orders)


def ewkb_point_hex(x: Column, y: Column, srid: Column, *, big_endian: Column) -> Column:
    """Hex EWKB of POINT(x y) with an SRID, in either byte order.

    ``big_endian`` mirrors the reference encoder (ewkb.Marshal with
    binary.BigEndian, postgis_codec.go:118); little-endian is the
    PostGIS-native NDR order the decoder must equally accept.
    """
    type_be = _hex_long(F.lit(1 + SRID_FLAG), 8)
    srid_be = _hex_long(srid, 8)
    x_be = double_bits_hex(x)
    y_be = double_bits_hex(y)
    be = F.concat(F.lit("00"), type_be, srid_be, x_be, y_be)
    le = F.concat(
        F.lit("01"), le_bytes(type_be, 4), le_bytes(srid_be, 4),
        le_bytes(x_be, 8), le_bytes(y_be, 8),
    )
    return F.when(big_endian, be).otherwise(le)


def attach_ewkb_point_hex(
    df, x: Column, y: Column, srid: Column, *, big_endian: Column,
    out: str = "ewkb_hex",
):
    """Staged-projection variant of :func:`ewkb_point_hex` (r11).

    Why: inside one projection, the BE/LE CaseWhen branches and
    ``le_bytes``'s eight per-byte substrings each re-expand the full
    ``double_bits_hex`` tree (lazy branch evaluation defeats
    subexpression elimination), so the IEEE encode ran up to 8x per
    coordinate — measured 3.05s -> 0.67s at sf0.1 on the point
    round-trip. Materializing the BE hex pieces as real columns first
    (the attach_parsed_point rationale) makes each encode run once;
    the emitted hex is byte-identical."""
    s1 = df.withColumns({
        "_xbe": double_bits_hex(x),
        "_ybe": double_bits_hex(y),
        "_sbe": _hex_long(srid, 8),
    })
    type_be = _hex_long(F.lit(1 + SRID_FLAG), 8)
    col = F.when(
        big_endian,
        F.concat(F.lit("00"), type_be, F.col("_sbe"), F.col("_xbe"), F.col("_ybe")),
    ).otherwise(
        F.concat(
            F.lit("01"), le_bytes(type_be, 4), le_bytes(F.col("_sbe"), 4),
            le_bytes(F.col("_xbe"), 8), le_bytes(F.col("_ybe"), 8),
        )
    )
    return s1.withColumn(out, col).drop("_xbe", "_ybe", "_sbe")


def ewkb_bbox_polygon_hex(
    minx: Column, miny: Column, maxx: Column, maxy: Column, srid: Column
) -> Column:
    """Little-endian hex EWKB of the closed 5-point bbox POLYGON ring
    ((minx miny, maxx miny, maxx maxy, minx maxy, minx miny))."""
    def d(c: Column) -> Column:
        return le_bytes(double_bits_hex(c), 8)

    ring = F.concat(
        d(minx), d(miny), d(maxx), d(miny), d(maxx), d(maxy),
        d(minx), d(maxy), d(minx), d(miny),
    )
    return F.concat(
        F.lit("01"),
        le_bytes(_hex_long(F.lit(3 + SRID_FLAG), 8), 4),
        le_bytes(_hex_long(srid, 8), 4),
        F.lit("01000000"),  # nrings = 1, LE
        F.lit("05000000"),  # npoints = 5, LE
        ring,
    )


# ---------------------------------------------------------------------------
# EWKB decode


def _norm(hexcol: Column, start: int, nbytes: int, is_le: Column) -> Column:
    """Extract ``nbytes`` at 1-based hex offset ``start`` and normalize
    to big-endian according to the wire's endian flag."""
    raw = F.substring(hexcol, start, 2 * nbytes)
    return F.when(is_le, le_bytes(raw, nbytes)).otherwise(raw)


def parse_ewkb_point(hexcol: Column) -> Column:
    """Parse hex EWKB of an SRID-flagged POINT (either byte order) into
    a struct (endian, geom_type, srid, x, y).

    Mirrors postgis_codec.go:180-198 scanPlanTextPostGis (hex decode →
    ewkb.Unmarshal) with the same validation posture: the endian byte
    must be 00/01; the SRID flag is honored; type word low bits give
    the geometry kind. NULL on a non-point or malformed prefix.
    """
    is_le = F.substring(hexcol, 1, 2) == "01"
    endian = F.when(is_le, F.lit("NDR")).otherwise(F.lit("XDR"))
    type_word = F.conv(_norm(hexcol, 3, 4, is_le), 16, 10).cast("long")
    has_srid = (F.floor(type_word / F.lit(SRID_FLAG)) % 2 == 1)
    geom_type = (type_word % F.lit(0x1000)).cast("int")
    srid = F.when(
        has_srid, F.conv(_norm(hexcol, 11, 4, is_le), 16, 10).cast("long")
    ).otherwise(F.lit(0))
    coord_off = F.when(has_srid, F.lit(19)).otherwise(F.lit(11))
    x_hex = F.when(is_le,
                   le_bytes(F.substring(hexcol, coord_off, 16), 8)
                   ).otherwise(F.substring(hexcol, coord_off, 16))
    y_hex = F.when(is_le,
                   le_bytes(F.substring(hexcol, coord_off + 16, 16), 8)
                   ).otherwise(F.substring(hexcol, coord_off + 16, 16))
    valid = F.substring(hexcol, 1, 2).isin("00", "01") & (geom_type == 1)
    return F.when(
        valid,
        F.struct(
            endian.alias("endian"),
            geom_type.alias("geom_type"),
            srid.alias("srid"),
            double_from_bits_hex(x_hex).alias("x"),
            double_from_bits_hex(y_hex).alias("y"),
        ),
    )


def attach_parsed_point(df, hexcol: str, prefix: str = "pt_"):
    """Staged-projection variant of :func:`parse_ewkb_point` — attaches
    ``{prefix}endian/geom_type/srid/x/y`` columns.

    Why not the struct form: referencing each struct field re-expands
    the full parse expression per use site (SimplifyExtractValueOps
    duplicates it before CollapseProject's cheapness check can stop
    it), and a query that derives WKT + GeoJSON + distance from x/y
    blows past Janino's 64 KB codegen method limit. Materializing the
    normalized hex slices and then the decoded values as real columns
    keeps every projection small; expensive aliases referenced more
    than once are NOT collapsed (CollapseProject is cost-aware), so
    the decode runs once per row.

    Assumes the SRID flag is present (EWKB as PostGIS emits it, 4-byte
    SRID at offset 11, coords at 19) — use :func:`parse_ewkb_point`
    for mixed WKB/EWKB inputs.
    """
    h = F.col(hexcol)
    is_le = F.substring(h, 1, 2) == "01"
    s1 = df.withColumns({
        "_is_le": is_le,
        "_type_hex": _norm(h, 3, 4, is_le),
        "_srid_hex": _norm(h, 11, 4, is_le),
        "_x_hex": _norm(h, 19, 8, is_le),
        "_y_hex": _norm(h, 35, 8, is_le),
    })
    type_word = F.conv(F.col("_type_hex"), 16, 10).cast("long")
    s2 = s1.withColumns({
        f"{prefix}endian": F.when(F.col("_is_le"), F.lit("NDR")).otherwise(F.lit("XDR")),
        f"{prefix}geom_type": (type_word % F.lit(0x1000)).cast("int"),
        f"{prefix}srid": F.when(
            F.floor(type_word / F.lit(SRID_FLAG)) % 2 == 1,
            F.conv(F.col("_srid_hex"), 16, 10).cast("long"),
        ).otherwise(F.lit(0)),
        f"{prefix}x": double_from_bits_hex(F.col("_x_hex")),
        f"{prefix}y": double_from_bits_hex(F.col("_y_hex")),
    })
    return s2.drop("_is_le", "_type_hex", "_srid_hex", "_x_hex", "_y_hex")


def point_wkt(x: Column, y: Column) -> Column:
    """WKT of an integer-coordinate point (deterministic formatting —
    both sides print BIGINT, avoiding float-format divergence)."""
    return F.concat(
        F.lit("POINT("), x.cast("long").cast("string"), F.lit(" "),
        y.cast("long").cast("string"), F.lit(")"),
    )


def point_geojson(x: Column, y: Column) -> Column:
    """GeoJSON emitted for the event envelope — matches the reference's
    postGisMarshalJson output shape (postgis_codec.go:45-54)."""
    return F.concat(
        F.lit('{"type":"Point","coordinates":['),
        x.cast("long").cast("string"), F.lit(","),
        y.cast("long").cast("string"), F.lit("]}"),
    )
