"""pgoutput binary logical-replication frame codec (hex wire form).

This is the reference's ACTUAL wire format: it consumes the binary
`pgoutput` plugin over a replication connection
(internal/replication/replicationconnection/replicationconnection.go:36)
and hand-decodes frames — length-prefixed tuple values and
null-terminated strings (spi/pgtypes/logicalreplicationmessage.go:47,
internal/typemanager/decoderplan.go). `sources/wal2json.py` covers the
JSON representation; this module covers the binary one, so both
logical-decoding wire formats the ecosystem uses are parseable.

Everything is JVM codegen over hex strings (substr / conv / unhex
arithmetic — the same technique as functions/geo.py's EWKB codec):
zero Python per row, batch/stream identical.

Frame anatomy handled here (1 byte = 2 hex chars):

- XLogData wrapper: 'w' + walStart(8B) + walEnd(8B) + clock(8B) + msg
- Begin    'B': finalLSN(8B) + commitTS(8B, micros since PG epoch
               2000-01-01) + xid(4B)
- Commit   'C': flags(1B) + commitLSN(8B) + endLSN(8B) + commitTS(8B)
- Relation 'R': relid(4B) + namespace\\0 + relname\\0 + replident(1B)
               + ncols(2B) + per column: flags(1B) + name\\0 +
               typoid(4B) + typmod(4B)
- Insert   'I': relid(4B) + 'N' + TupleData
- Update   'U': relid(4B) + 'K' + key TupleData + 'N' + new TupleData
- Delete   'D': relid(4B) + 'K' + key TupleData
- TupleData:    ncols(2B) + per column: 't' + len(4B) + bytes | 'n'

Transaction attach (xid + commit timestamp ride only on B frames) is
the transaction tracker's job
(logicalreplicationresolver/transactiontracker.go): a segmented LOCF —
per-LSN-segment carry-forward plus a metadata-sized cross-segment
boundary pass — so the WAL stream never funnels through a single
partition at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: batch entry points persist their frame input (multi-branch reads).
#: The cache entry lives in the JVM CacheManager until unpersisted, so
#: a long-lived session that keeps invoking the parsers (notebooks,
#: looped bench runs) accumulates cached plans; this registry holds the
#: handle so release_persisted_frames() can reclaim them eagerly. The
#: tiny Python wrappers kept here don't extend the JVM cache lifetime —
#: CacheManager already holds it — they only make release possible.
_PERSISTED_FRAMES: list[DataFrame] = []


def _tracked_persist(frames: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    frames = frames.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_FRAMES.append(frames)
    return frames


def release_persisted_frames() -> int:
    """Unpersist every frame table cached by the batch entry points
    (parse_pgoutput / parse_admin_frames / resolve_schema_versions);
    returns the number released. Safe to call at any time — a
    subsequent parse simply re-persists. Call between iterations in
    loops that rebuild the frame plans (ADVICE r4)."""
    released = 0
    while _PERSISTED_FRAMES:
        df = _PERSISTED_FRAMES.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:  # noqa: BLE001 — already-stopped session
            pass
    return released

#: micros between 1970-01-01 (unix epoch) and 2000-01-01 (PG epoch)
PG_EPOCH_OFFSET_US = 946_684_800_000_000

#: LSN-range width of one transaction-attach segment (see parse docs)
SEGMENT_BITS = 12

_TUPLE_COLS = ["user_id", "value_cents", "props"]
_TYPOIDS = {"user_id": 20, "value_cents": 20, "props": 25}  # int8/int8/text


def _h(col: Column, nbytes: int) -> Column:
    """Fixed-width big-endian hex of a nonnegative integral column."""
    return F.lpad(F.hex(col.cast("long")), 2 * nbytes, "0")


def _cstr(col: Column) -> Column:
    """Null-terminated UTF-8 string as hex."""
    return F.concat(F.hex(col), F.lit("00"))


def _text_value(col: Column) -> Column:
    """TupleData text column: 't' + 4-byte BYTE length + bytes."""
    return F.concat(F.lit("74"), _h(F.octet_length(col), 4), F.hex(col))


def _tuple_data(*cols: Column | None) -> Column:
    """TupleData with fixed column count; None renders the null kind."""
    parts = [_h(F.lit(len(cols)), 2)]
    for c in cols:
        parts.append(F.lit("6E") if c is None else _text_value(c))
    return F.concat(*parts)


def _relid(event_type: Column) -> Column:
    """Deterministic relation OID per table (internal join key only —
    never exposed in results, so any stable derivation works)."""
    return F.pmod(F.abs(F.xxhash64(event_type)), F.lit(1_000_000)) + F.lit(16384)


def _xlogdata(wal_start: Column, payload: Column) -> Column:
    return F.concat(F.lit("77"), _h(wal_start, 8), _h(wal_start, 8),
                    _h(F.lit(0), 8), payload)


def synthesize_pgoutput(events: DataFrame) -> DataFrame:
    """Render the simulated transaction log as XLogData-wrapped
    pgoutput frames (hex): one R frame per relation, B/C frames per
    xid (= event_id div 100), one I/U/D frame per event.

    LSN layout keeps the wire log totally ordered and collision-free:
    B = 400·xid, data = 4·event_id + 2, C = 4·max(event_id) + 3;
    R frames sit at LSN 0. The commit timestamp is the max event ts
    of the transaction, encoded as micros since the PG epoch.
    """
    from timescaledb_event_streamer_spark.cdc.envelope import derive_op

    op = derive_op(F.col("event_id"))
    relid = _relid(F.col("event_type"))
    cents = F.round(F.col("value") * 100, 0).cast("long").cast("string")
    uid = F.col("user_id").cast("string")

    new_tuple = _tuple_data(uid, cents, F.col("props"))
    key_tuple = _tuple_data(uid, None, None)

    data_payload = (
        F.when(op == "c", F.concat(F.lit("49"), _h(relid, 4), F.lit("4E"), new_tuple))
        .when(op == "u", F.concat(F.lit("55"), _h(relid, 4), F.lit("4B"), key_tuple,
                                  F.lit("4E"), new_tuple))
        .otherwise(F.concat(F.lit("44"), _h(relid, 4), F.lit("4B"), key_tuple))
    )
    # A live WAL stream arrives pre-partitioned (one slot/publication
    # per partition); the simulated log materializes from a handful of
    # parquet splits, which would pin the per-row codec work of BOTH
    # this encode and the downstream decode to those few cores. The
    # round-robin here restores the source parallelism the real stream
    # would have — it moves the SLIM columns (ids + props), not the
    # fat frame strings, and measured 2.1x on the sf0.1 roundtrip.
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    data = events.repartition(n_shuffle).select(
        _xlogdata(F.col("event_id") * 4 + 2, data_payload).alias("frame")
    )

    # txn and relation branches are metadata-sized (one row per xid /
    # per table); coalesce them so the frame union doesn't inherit a
    # full set of near-empty shuffle partitions per branch
    txn = events.groupBy(F.floor(F.col("event_id") / 100).cast("long").alias("xid")).agg(
        F.max("event_id").alias("max_eid"), F.max("ts").alias("commit_ts")
    ).coalesce(1)
    commit_lsn = F.col("max_eid") * 4 + 3
    # PG wire timestamps count micros since 2000-01-01 (the PG epoch),
    # i.e. unix micros MINUS the epoch offset (pglogrepl's
    # timeToPgTime; pglogrepl.SendStandbyStatusUpdate mirrors it)
    commit_us = F.unix_micros(F.col("commit_ts")) - F.lit(PG_EPOCH_OFFSET_US)
    begin = txn.select(
        _xlogdata(
            F.col("xid") * 400,
            F.concat(F.lit("42"), _h(commit_lsn, 8), _h(commit_us, 8), _h(F.col("xid"), 4)),
        ).alias("frame")
    )
    commit = txn.select(
        _xlogdata(
            commit_lsn,
            F.concat(F.lit("43"), F.lit("00"), _h(commit_lsn, 8), _h(commit_lsn, 8),
                     _h(commit_us, 8)),
        ).alias("frame")
    )

    return (
        data.unionByName(begin).unionByName(commit)
        .unionByName(_relation_frames(events))
    )


def _relation_frames(
    events: DataFrame,
    cols: list[str] | None = None,
    lsn: Column | None = None,
) -> DataFrame:
    """One 'R' frame per relation (metadata-sized branch). ``cols``
    and ``lsn`` parameterize re-announcements — a schema change is
    the SAME frame layout with a new column list at a later LSN
    (see synthesize_versioned_log)."""
    cols = cols if cols is not None else _TUPLE_COLS
    lsn = lsn if lsn is not None else F.lit(0)
    col_meta = []
    for name in cols:
        flags = "01" if name == "user_id" else "00"
        col_meta.append(F.lit(flags))
        col_meta.append(_cstr(F.lit(name)))
        col_meta.append(_h(F.lit(_TYPOIDS.get(name, 25)), 4))
        col_meta.append(F.lit("FFFFFFFF"))  # typmod -1
    return (
        events.select("event_type", lsn.alias("_lsn")).distinct().coalesce(1).select(
            _xlogdata(
                F.col("_lsn"),
                F.concat(
                    F.lit("52"), _h(_relid(F.col("event_type")), 4),
                    _cstr(F.lit("public")), _cstr(F.col("event_type")),
                    F.lit("64"),  # replica identity 'd' (default)
                    _h(F.lit(len(cols)), 2), *col_meta,
                ),
            ).alias("frame")
        )
    )


# ---------------------------------------------------------------------------
# admin frames: Truncate 'T' / LogicalDecodingMessage 'M' / Type 'Y' /
# Origin 'O' — the four remaining message kinds the reference's binary
# path dispatches (replicationchannel/replicationhandler.go:304,316,326
# and the 'M' decode in spi/pgtypes/logicalreplicationmessage.go:47).
# With these the codec covers the full pgoutput frame set the
# reference consumes: B C R I U D T Y O M.
#
# Wire anatomy (payload after the 50-hex-char XLogData header):
# - Message  'M': flags(1B: 1=transactional) + lsn(8B) + prefix\0 +
#                 contentLen(4B) + content bytes
# - Truncate 'T': nrelations(4B) + options(1B: 1=CASCADE,
#                 2=RESTART IDENTITY) + relid(4B) x nrelations
# - Type     'Y': typoid(4B) + namespace\0 + typename\0
# - Origin   'O': commitLSN(8B) + originName\0


def synthesize_admin_frames(events: DataFrame) -> DataFrame:
    """Render the admin/metadata side of the simulated WAL as
    XLogData-wrapped frames (hex): one 'M' logical-decoding message per
    event with ``event_id % 10 == 5`` (prefix = the table name, content
    = props, transactional flag = event_id parity, message LSN =
    4·event_id + 1 — odd, so collision-free against the data/commit
    LSN layout), ONE 'T' frame truncating every relation (options
    CASCADE|RESTART, LSN = 4·max(event_id) + 5), one 'Y' composite-type
    registration per relation ('public'.'<table>_t' at LSN 0), one 'O'
    origin announcement ('pgstream' at LSN = 4·max(event_id) + 7), and
    the 'R' relation catalog the 'T' decode resolves against."""
    # same source-parallelism restoration as synthesize_pgoutput's
    # data branch (the M subset is 1/10th the stream but carries the
    # full props payload through encode + decode)
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    msg = events.filter(F.col("event_id") % 10 == 5).repartition(n_shuffle)
    m_lsn = F.col("event_id") * 4 + 1
    m_flags = F.when(F.col("event_id") % 2 == 1, "01").otherwise("00")
    m_frames = msg.select(
        _xlogdata(
            m_lsn,
            F.concat(
                F.lit("4D"), m_flags, _h(m_lsn, 8), _cstr(F.col("event_type")),
                _h(F.octet_length("props"), 4), F.hex(F.col("props")),
            ),
        ).alias("frame")
    )

    rel = events.select("event_type").distinct()
    mx = events.groupBy().agg(F.max("event_id").alias("max_eid")).coalesce(1)

    # 'T': a single frame carrying the full sorted relid list (truncate
    # is an all-relations-at-once message in pgoutput; one row, built
    # from two metadata-sized aggregates)
    relids = rel.select(_relid(F.col("event_type")).alias("relid"))
    t_body = relids.groupBy().agg(
        F.array_sort(F.collect_list("relid")).alias("ids")
    ).coalesce(1)
    id_hex = F.aggregate(
        F.col("ids"), F.lit(""), lambda acc, r: F.concat(acc, _h(r, 4))
    )
    t_frames = t_body.crossJoin(mx).select(
        _xlogdata(
            F.col("max_eid") * 4 + 5,
            F.concat(F.lit("54"), _h(F.size("ids"), 4), F.lit("03"), id_hex),
        ).alias("frame")
    )

    y_frames = rel.coalesce(1).select(
        _xlogdata(
            F.lit(0),
            F.concat(
                F.lit("59"), _h(_relid(F.col("event_type")) + 1_000_000, 4),
                _cstr(F.lit("public")),
                _cstr(F.concat(F.col("event_type"), F.lit("_t"))),
            ),
        ).alias("frame")
    )

    o_lsn = F.col("max_eid") * 4 + 7
    o_frames = mx.select(
        _xlogdata(
            o_lsn, F.concat(F.lit("4F"), _h(o_lsn, 8), _cstr(F.lit("pgstream")))
        ).alias("frame")
    )

    return (
        m_frames.unionByName(t_frames).unionByName(y_frames)
        .unionByName(o_frames).unionByName(_relation_frames(events))
    )


def parse_admin_frames(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Decode T/M/Y/O frames from the wire hex alone into one row per
    logical fact: 'm' messages (prefix, content, transactional), 't'
    truncations (one row per truncated relation, resolved through the
    'R' catalog, with the CASCADE / RESTART IDENTITY option bits), 'y'
    type registrations, and 'o' origin announcements. Everything is
    substr/conv codegen except the exploded truncate relid list (an
    array column transform — still JVM-side)."""

    # five consumers (m/t/y/o branches + the relation catalog) read
    # the frame table; persist so the upstream materialization runs
    # once, not per branch (same rationale as parse_pgoutput; a live
    # stream can't persist — micro-batches are already materialized)
    if not frames.isStreaming:
        frames = _tracked_persist(frames)
    h = F.upper(F.col(frame_col))
    base = frames.select(
        h.alias("h"), h.substr(F.lit(51), F.lit(2)).alias("ptype")
    ).filter(F.col("ptype").isin("4D", "54", "59", "4F"))
    hh = F.col("h")

    # flag columns travel as 'true'/'false' strings: a NULLABLE BOOLEAN
    # stringifies differently between Spark (None) and DuckDB (NaN) in
    # the driver's canonicalization, whereas nullable strings are
    # hash-stable (proven by every after_* column)
    null_s = F.lit(None).cast("string")
    null_b = F.lit(None).cast("string")
    out_cols = [
        "op", "lsn", "source_table", "prefix", "content",
        "transactional", "cascade_opt", "restart_identity",
    ]

    # 'M' — prefix cstr, then a length-prefixed content read chained
    # off the decoded prefix length
    m = base.filter(F.col("ptype") == "4D")
    m_prefix, m_plen = _cstr_at(hh.substr(F.lit(71), F.octet_length(hh)))
    m = m.select(
        F.lit("m").alias("op"),
        _u(hh, 55, 8).alias("lsn"),
        null_s.alias("source_table"),
        m_prefix.alias("prefix"),
        F.decode(
            F.unhex(
                hh.substr(
                    F.lit(79) + m_plen, _u(hh, F.lit(71) + m_plen, 4) * 2
                )
            ),
            "UTF-8",
        ).alias("content"),
        (_u(hh, 53, 1) == 1).cast("string").alias("transactional"),
        null_b.alias("cascade_opt"),
        null_b.alias("restart_identity"),
    )

    # 'T' — explode the relid vector, resolve names via the R catalog
    t = base.filter(F.col("ptype") == "54")
    nrel = _u(hh, 53, 4).cast("int")
    opts = _u(hh, 61, 1)
    relid_arr = F.transform(
        F.sequence(F.lit(0), nrel - 1), lambda i: _u(hh, i * 8 + 63, 4)
    )
    t = t.select(
        F.explode(relid_arr).alias("relid"),
        _u(hh, 3, 8).alias("lsn"),
        (F.pmod(opts, 2) == 1).cast("string").alias("cascade_opt"),
        (F.pmod(F.floor(opts / 2), 2) == 1).cast("string").alias("restart_identity"),
    )
    cat = relation_catalog(frames, frame_col)
    t = t.join(F.broadcast(cat), "relid")
    t = t.select(
        F.lit("t").alias("op"),
        "lsn",
        F.col("relname").alias("source_table"),
        null_s.alias("prefix"),
        null_s.alias("content"),
        null_b.alias("transactional"),
        "cascade_opt",
        "restart_identity",
    )

    # 'Y' — two chained cstrs, same technique as the relation catalog
    y = base.filter(F.col("ptype") == "59")
    y_ns_tail = hh.substr(F.lit(61), F.octet_length(hh))
    y_ns, y_ns_len = _cstr_at(y_ns_tail)
    y = y.select(y_ns.alias("prefix"), y_ns_tail.alias("_t"), y_ns_len.alias("_n"))
    y_name, _ = _cstr_at(F.col("_t").substr(F.col("_n") + 1, F.octet_length("_t")))
    y = y.select(
        F.lit("y").alias("op"),
        F.lit(0).cast("long").alias("lsn"),
        y_name.alias("source_table"),
        "prefix",
        null_s.alias("content"),
        null_b.alias("transactional"),
        null_b.alias("cascade_opt"),
        null_b.alias("restart_identity"),
    )

    # 'O' — origin name + the commit LSN embedded in the frame body
    o = base.filter(F.col("ptype") == "4F")
    o_name, _ = _cstr_at(hh.substr(F.lit(69), F.octet_length(hh)))
    o = o.select(
        F.lit("o").alias("op"),
        _u(hh, 53, 8).alias("lsn"),
        null_s.alias("source_table"),
        o_name.alias("prefix"),
        null_s.alias("content"),
        null_b.alias("transactional"),
        null_b.alias("cascade_opt"),
        null_b.alias("restart_identity"),
    )

    return (
        m.select(out_cols)
        .unionByName(t.select(out_cols))
        .unionByName(y.select(out_cols))
        .unionByName(o.select(out_cols))
    )


# ---------------------------------------------------------------------------
# decode


def _u(h: Column, pos: Column | int, nbytes: int) -> Column:
    """Unsigned big-endian int read at 1-indexed hex position.

    try_cast, not cast: a corrupted frame (reconnect tear, flipped
    bits) can spell a u64 above 2^63 whose decimal string overflows
    BIGINT — under ANSI mode a plain cast would kill the whole query
    for one bad frame. NULL decodes are filtered downstream like any
    other unrecognized frame."""
    pos = F.lit(pos) if isinstance(pos, int) else pos
    return F.conv(h.substr(pos, F.lit(2 * nbytes)), 16, 10).try_cast("long")


def _tuple_values(h: Column, start: Column) -> tuple[list[Column], Column]:
    """Sequentially decode a fixed-3-column TupleData starting at hex
    position ``start`` (a Column). Returns the three decoded string
    values (NULL for the 'n' kind) and the position just past the
    tuple. Offsets chain through length prefixes — all codegen."""
    vals: list[Column] = []
    pos = start + 4  # skip ncols(2B)
    for _ in range(3):
        kind = h.substr(pos, F.lit(2))
        vlen = _u(h, pos + 2, 4)
        data = h.substr(pos + 10, vlen * 2)
        vals.append(
            F.when(kind == "74", F.decode(F.unhex(data), "UTF-8"))
        )
        pos = pos + F.when(kind == "74", 10 + vlen * 2).otherwise(F.lit(2))
    return vals, pos


def _cstr_at(rest: Column) -> tuple[Column, Column]:
    """Decode a null-terminated string from the head of a hex tail.
    Returns (value, hex length consumed incl. terminator). Byte-pair
    array + array_position finds the terminator at byte granularity
    (a naive substring search would match '00' spanning two pairs)."""
    pairs = F.split(F.regexp_replace(rest, "(..)", "$1,"), ",")
    idx = F.array_position(pairs, "00")  # 1-indexed pair
    value = F.decode(
        F.unhex(F.array_join(F.slice(pairs, 1, (idx - 1).cast("int")), "")), "UTF-8"
    )
    return value, idx * 2


def relation_catalog(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Decode 'R' frames into the relid -> (namespace, relname) map —
    the consumer-side relation cache every pgoutput client keeps
    (metadata-sized: one row per relation, broadcast downstream)."""
    h = F.upper(F.col(frame_col))
    rel = frames.filter(h.substr(F.lit(51), F.lit(2)) == "52")
    ns_tail = h.substr(F.lit(61), F.octet_length(h))
    ns, ns_len = _cstr_at(ns_tail)
    rel2 = rel.select(
        _u(h, 53, 4).alias("relid"), ns.alias("namespace"), ns_tail.alias("_t"), ns_len.alias("_n")
    )
    name_tail = F.col("_t").substr(F.col("_n") + 1, F.octet_length(F.col("_t")))
    relname, _ = _cstr_at(name_tail)
    return rel2.select("relid", "namespace", relname.alias("relname"))


def decode_frames(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Stateless frame decode: B/I/U/D frames -> (lsn, op, relid,
    _b_xid, _b_ts_ms, _key_uid, _new_uid, after_cents_s, after_props).

    Pure projections + filter, so it runs identically under batch and
    Structured Streaming (the live replication path: stream the raw
    frames, decode here, stream-static join the relation catalog;
    transaction attach then happens per micro-batch or downstream).
    """
    h = F.upper(F.col(frame_col))
    base = frames.select(
        h.alias("h"),
        _u(h, 3, 8).alias("lsn"),
        h.substr(F.lit(51), F.lit(2)).alias("ptype"),
    )
    base = base.filter(F.col("ptype").isin("42", "49", "55", "44"))
    hh = F.col("h")

    # B-frame transaction metadata (null on data frames)
    is_b = F.col("ptype") == "42"
    commit_us = _u(hh, 53 + 16, 8) + F.lit(PG_EPOCH_OFFSET_US)
    b_xid = F.when(is_b, _u(hh, 53 + 32, 4))
    b_ts_ms = F.when(is_b, F.floor(commit_us / 1000).cast("long"))

    # data-frame decode (runs only from the wire hex)
    relid = F.when(~is_b, _u(hh, 53, 4))
    op = (
        F.when(F.col("ptype") == "49", "c")
        .when(F.col("ptype") == "55", "u")
        .when(F.col("ptype") == "44", "d")
    )
    # Every data frame carries a tuple at hex position 63 ('I' its new
    # image, 'U'/'D' the key image) — parse it ONCE and route by type,
    # and stage the parse through intermediate columns so the generated
    # code stays under the JVM method-size codegen limit (a single
    # mega-projection repeating the offset chains made Janino reject
    # the class, silently dropping every execution to interpreted mode).
    t63_vals, t63_end = _tuple_values(hh, F.lit(63))
    is_i = F.col("ptype") == "49"
    is_u = F.col("ptype") == "55"
    is_d = F.col("ptype") == "44"

    stage1 = base.select(
        "h",
        "lsn",
        op.alias("op"),
        relid.alias("relid"),
        b_xid.alias("_b_xid"),
        b_ts_ms.alias("_b_ts_ms"),
        F.when(is_u | is_d, t63_vals[0]).alias("_key_uid"),
        F.when(is_i, t63_vals[0]).alias("_i_uid"),
        F.when(is_i, t63_vals[1]).alias("_i_cents"),
        F.when(is_i, t63_vals[2]).alias("_i_props"),
        F.when(is_u, t63_end + 2).alias("_unew_start"),
    )
    # 'U' second tuple ('N' + new image) parsed off the staged offset
    unew_vals, _ = _tuple_values(F.col("h"), F.col("_unew_start"))
    return stage1.select(
        "lsn",
        "op",
        "relid",
        "_b_xid",
        "_b_ts_ms",
        "_key_uid",
        F.coalesce("_i_uid", unew_vals[0]).alias("_new_uid"),
        F.coalesce("_i_cents", unew_vals[1]).alias("after_cents_s"),
        F.coalesce("_i_props", unew_vals[2]).alias("after_props"),
    )


def parse_pgoutput(
    frames: DataFrame, frame_col: str = "frame", topic_prefix: str = "timescaledb"
) -> DataFrame:
    """Decode XLogData-wrapped pgoutput frames (hex) into the engine's
    envelope: (topic, op, source_schema, source_table, lsn, xid,
    ts_ms, key_user_id, before_user_id, after_user_id, after_cents,
    after_props).

    xid and ts_ms ride only on 'B' frames; they are attached to data
    frames with a segmented LOCF over LSN order — per-segment window
    carry plus a metadata-sized cross-segment boundary table — so no
    full-stream single-partition window exists in the plan
    (transactiontracker.go's commit grouping, distributed).
    """

    # the raw frame table feeds two consumers (the data-frame decode
    # and the relation catalog); persisting it keeps the upstream
    # frame materialization — a per-row string build when the input
    # is the simulated log, a network read when it is a live slot —
    # from running once per consumer (measured 0.6s/branch at sf0.1).
    # A live stream can't persist; its micro-batches arrive
    # materialized, so the double-scan cost doesn't exist there.
    # Lifetime: no unpersist inside the plan — once the returned
    # plan's references drop, Spark's ContextCleaner reclaims the
    # cached blocks on GC (the same lifecycle operators/dedup.py
    # relies on for its shingle table). Long-lived sessions that hold
    # returned DataFrames can reclaim eagerly via
    # release_persisted_frames().
    if not frames.isStreaming:
        frames = _tracked_persist(frames)
    decoded = decode_frames(frames, frame_col)

    # transaction attach: segmented LOCF (see docstring). The
    # explicit repartition is the ONE seg-keyed exchange both
    # consumers below (the LOCF window and the per-segment summary
    # aggregate) read via exchange reuse — without it each consumer
    # plans its own exchange over its own column-pruned decode
    # subtree and the hex decode runs once per branch (r11: the
    # before-plan carried two Exchange+Sort chains, each re-decoding
    # from the persisted frames).
    seg = F.shiftright(F.col("lsn"), SEGMENT_BITS).alias("seg")
    decoded = decoded.withColumn("seg", seg).repartition("seg")
    w_in = (
        Window.partitionBy("seg")
        .orderBy("lsn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    locf = decoded.withColumn("_xid_in", F.last("_b_xid", ignorenulls=True).over(w_in))
    locf = locf.withColumn("_ts_in", F.last("_b_ts_ms", ignorenulls=True).over(w_in))

    # cross-segment carry: ONE window-free aggregation straight off
    # the shared exchange — the segment's last-known (xid, ts) is the
    # value on its highest-LSN B frame, so max_by over (has-value,
    # lsn, value) reads it directly (r11; the previous form took the
    # in-segment LOCF value at the segment's last row, which needed a
    # second Sort + Window + SortAggregate pass over the decoded
    # rows — same result: with-value rows dominate the ordering
    # struct, so the pick is the max-LSN B frame, value-tie-broken,
    # and null exactly when the segment holds no B frame). The carry
    # table is one row per segment (metadata-sized by construction —
    # same deliberate single-partition note as the chunk catalog),
    # shifted so a segment sees only prior segments.
    seg_summary = decoded.groupBy("seg").agg(
        F.max_by(
            "_b_xid", F.struct(F.col("_b_xid").isNotNull(), "lsn", "_b_xid")
        ).alias("_seg_xid"),
        F.max_by(
            "_b_ts_ms", F.struct(F.col("_b_ts_ms").isNotNull(), "lsn", "_b_ts_ms")
        ).alias("_seg_ts"),
    )
    w_seg = (
        Window.partitionBy(F.length(F.col("seg").cast("string")) * 0)
        .orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = seg_summary.select(
        "seg",
        F.last("_seg_xid", ignorenulls=True).over(w_seg).alias("_carry_xid"),
        F.last("_seg_ts", ignorenulls=True).over(w_seg).alias("_carry_ts"),
    )
    attached = locf.join(F.broadcast(carry), "seg").select(
        "lsn", "op", "relid",
        F.coalesce("_xid_in", "_carry_xid").alias("xid"),
        F.coalesce("_ts_in", "_carry_ts").alias("ts_ms"),
        "_key_uid", "_new_uid", "after_cents_s", "after_props",
    )

    data = attached.filter(F.col("op").isNotNull())
    cat = relation_catalog(frames, frame_col)
    return data.join(F.broadcast(cat), "relid").select(
        F.concat_ws(".", F.lit(topic_prefix), "namespace", "relname").alias("topic"),
        "op",
        F.col("namespace").alias("source_schema"),
        F.col("relname").alias("source_table"),
        "lsn",
        "xid",
        "ts_ms",
        F.coalesce("_new_uid", "_key_uid").cast("long").alias("key_user_id"),
        F.col("_key_uid").cast("long").alias("before_user_id"),
        F.col("_new_uid").cast("long").alias("after_user_id"),
        F.col("after_cents_s").cast("long").alias("after_cents"),
        "after_props",
    )


# ---------------------------------------------------------------------------
# streaming transaction tracker

_TXN_STATE_SCHEMA = "carried_xid LONG, carried_ts LONG"
_TXN_OUT_SCHEMA = (
    "lsn LONG, op STRING, relid LONG, xid LONG, ts_ms LONG, "
    "key_uid STRING, new_uid STRING, after_cents_s STRING, after_props STRING"
)


def _txn_attach_fn(key, pdfs, state):
    import pandas as pd

    carried_xid, carried_ts = state.get if state.exists else (None, None)
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("lsn")
    xid_f = pdf["_b_xid"].ffill()
    ts_f = pdf["_b_ts_ms"].ffill()
    if carried_xid is not None:
        xid_f = xid_f.fillna(carried_xid)
        ts_f = ts_f.fillna(carried_ts)
    b_xids = pdf["_b_xid"].dropna()
    if len(b_xids):
        carried_xid = int(b_xids.iloc[-1])
        carried_ts = int(pdf["_b_ts_ms"].dropna().iloc[-1])
    state.update((carried_xid, carried_ts))
    data = pdf["op"].notna()
    if data.any():
        yield pd.DataFrame(
            {
                "lsn": pdf.loc[data, "lsn"],
                "op": pdf.loc[data, "op"],
                "relid": pdf.loc[data, "relid"],
                "xid": xid_f[data],
                "ts_ms": ts_f[data],
                "key_uid": pdf.loc[data, "_key_uid"],
                "new_uid": pdf.loc[data, "_new_uid"],
                "after_cents_s": pdf.loc[data, "after_cents_s"],
                "after_props": pdf.loc[data, "after_props"],
            }
        )


def pgoutput_envelope_stream(
    frames: DataFrame,
    catalog: DataFrame,
    frame_col: str = "frame",
    topic_prefix: str = "timescaledb",
) -> DataFrame:
    """The LIVE binary replication path: streamed pgoutput frames ->
    stateless decode -> transaction tracker as keyed state
    (applyInPandasWithState carrying the open transaction's xid and
    commit-ts across micro-batches, the streaming form of the batch
    segmented LOCF; transactiontracker.go) -> stream-static broadcast
    join with the relation catalog.

    The state key is the WAL slot (one per replication stream) — WAL
    shipping is sequential per slot, which is exactly the reference's
    processing model; parallelism across slots/publications comes from
    the key. Rows are LSN-sorted within each micro-batch; cross-batch
    order is the slot's delivery guarantee.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    decoded = decode_frames(frames, frame_col).withColumn("wal_slot", F.lit(0))
    attached = decoded.groupBy("wal_slot").applyInPandasWithState(
        _txn_attach_fn,
        outputStructType=_TXN_OUT_SCHEMA,
        stateStructType=_TXN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return attached.join(F.broadcast(catalog), "relid").select(
        F.concat_ws(".", F.lit(topic_prefix), "namespace", "relname").alias("topic"),
        "op",
        F.col("namespace").alias("source_schema"),
        F.col("relname").alias("source_table"),
        "lsn",
        "xid",
        "ts_ms",
        F.coalesce("new_uid", "key_uid").cast("long").alias("key_user_id"),
        F.col("key_uid").cast("long").alias("before_user_id"),
        F.col("new_uid").cast("long").alias("after_user_id"),
        F.col("after_cents_s").cast("long").alias("after_cents"),
        "after_props",
    )


# ---------------------------------------------------------------------------
# Replication-protocol control frames: primary keepalive ('k') and the
# standby status update the client computes in response.
#
# Reference semantics (file:line cited for parity):
# - replicationhandler.go:163-176 — the CopyData dispatch: 'k' frames
#   parse ServerWALEnd(8B BE) + ServerTime(8B BE, micros since the PG
#   epoch 2000-01-01) + ReplyRequested(1B); a set reply flag forces an
#   immediate status update (deadline zeroed).
# - replicationcontext.go:241-249 AcknowledgeReceived — the received
#   LSN advances to WALStart + len(WALData) after every XLogData frame.
# - replicationconnection.go:94-105 SendStatusUpdate — the standby
#   reply reports WALWritePosition = WALApplyPosition = processed
#   LSN + 1 (pglogrepl defaults the flush position to the write
#   position when unset).


def synthesize_copydata(events: DataFrame) -> DataFrame:
    """Render the simulated WAL as the raw CopyData frame mix a live
    replication connection delivers: XLogData 'w' frames carrying the
    props payload, with every 5th frame replaced by a primary
    keepalive 'k' (reply requested on every 3rd keepalive). One slot
    per relation (event_type) — the reference's one-slot-per-stream
    model, so downstream state keys on the slot.

    Only (slot, frame) survive into the output: the parse side runs
    from the wire hex alone."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle)
    lsn = F.col("event_id") * 4 + 2
    pg_us = F.unix_micros(F.col("ts")) - F.lit(PG_EPOCH_OFFSET_US)
    is_keepalive = F.col("event_id") % 5 == 0
    reply = F.when(F.col("event_id") % 15 == 0, "01").otherwise("00")

    keepalive = F.concat(F.lit("6B"), _h(lsn, 8), _h(pg_us, 8), reply)
    xlog = F.concat(
        F.lit("77"), _h(lsn, 8), _h(lsn, 8), _h(pg_us, 8), F.hex(F.col("props"))
    )
    return events.select(
        F.col("event_type").alias("slot"),
        F.when(is_keepalive, keepalive).otherwise(xlog).alias("frame"),
    )


def parse_standby_status(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Decode the CopyData control mix and fold it to the per-slot
    replication posture: frame counts by kind, reply-requested count,
    the received LSN (AcknowledgeReceived's WALStart + len(WALData)),
    the standby status reply positions (processed + 1, write == apply
    == flush), the keepalive high-water server WAL end, and the last
    server clock in unix millis.

    One projection + one groupBy on the slot key — per-slot state is a
    single row, so the aggregation is map-side-partial friendly and
    the shuffle is bounded by slot cardinality (metadata-sized), the
    same shape at any corpus scale."""
    h = F.upper(F.col(frame_col))
    kind = h.substr(F.lit(1), F.lit(2))
    is_k = kind == "6B"
    is_w = kind == "77"

    # 'w': walStart @3, walEnd @19, clock @35, payload @51
    # 'k': serverWalEnd @3, serverTime @19, replyRequested @35
    wal_start = F.when(is_w, _u(h, 3, 8))
    payload_bytes = F.when(is_w, (F.length(h) - 50) / 2).cast("long")
    received_lsn = wal_start + payload_bytes
    server_us = F.when(is_w, _u(h, 35, 8)).when(is_k, _u(h, 19, 8)) + F.lit(
        PG_EPOCH_OFFSET_US
    )
    keepalive_end = F.when(is_k, _u(h, 3, 8))
    reply_requested = is_k & (h.substr(F.lit(35), F.lit(2)) == "01")

    per_frame = frames.select(
        "slot",
        is_k.cast("int").alias("_k"),
        is_w.cast("int").alias("_w"),
        reply_requested.cast("int").alias("_r"),
        received_lsn.alias("_recv"),
        keepalive_end.alias("_kend"),
        server_us.alias("_us"),
    )
    agg = per_frame.groupBy("slot").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("_k").alias("n_keepalive"),
        F.sum("_w").alias("n_xlog"),
        F.sum("_r").alias("n_reply_requested"),
        F.max("_recv").alias("last_received_lsn"),
        F.max("_kend").alias("max_keepalive_wal_end"),
        F.floor(F.max("_us") / 1000).cast("long").alias("last_server_time_ms"),
    )
    write_lsn = (F.col("last_received_lsn") + 1).alias("standby_write_lsn")
    return agg.select(
        "slot",
        "n_frames",
        "n_keepalive",
        "n_xlog",
        "n_reply_requested",
        "last_received_lsn",
        write_lsn,
        (F.col("last_received_lsn") + 1).alias("standby_apply_lsn"),
        "max_keepalive_wal_end",
        "last_server_time_ms",
    )


# ---------------------------------------------------------------------------
# relation versioning: the reference's consumer relation cache is NOT
# static — every Relation ('R') frame that arrives mid-stream replaces
# the cached schema for its relid, and subsequent data frames decode
# under the NEW column set (replicationhandler.go dispatches Relation
# before data; internal/typemanager rebuilds the decoder plan on each
# registration). Batch form: version the R frames by LSN and resolve
# each data frame to the latest R at-or-before its LSN.


def synthesize_versioned_log(events: DataFrame) -> DataFrame:
    """The simulated WAL plus a mid-stream schema change: every
    relation re-announces itself at LSN = 2 * max(event_id) with a
    FOURTH column appended ('extra_col'), so data frames after that
    point decode under schema v2 (ncols 4), earlier ones under v1
    (ncols 3)."""
    base = synthesize_pgoutput(events)
    mx = events.agg(F.max("event_id").alias("mx"))
    v2 = _relation_frames(
        events.crossJoin(F.broadcast(mx)),
        cols=[*_TUPLE_COLS, "extra_col"],
        lsn=F.col("mx") * 2,
    )
    return base.unionByName(v2)


def relation_versions(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """All R frames decoded as (relid, relname, from_lsn, n_cols) with
    the validity interval closed by the NEXT version's LSN — the
    consumer cache's replacement rule as a table. Metadata-sized."""
    h = F.upper(F.col(frame_col))
    rel = frames.filter(h.substr(F.lit(51), F.lit(2)) == "52")
    ns_tail = h.substr(F.lit(61), F.octet_length(h))
    ns, ns_len = _cstr_at(ns_tail)
    rel2 = rel.select(
        _u(h, 3, 8).alias("from_lsn"),
        _u(h, 53, 4).alias("relid"),
        ns_tail.alias("_t"), ns_len.alias("_n"),
    )
    name_tail = F.col("_t").substr(F.col("_n") + 1, F.octet_length(F.col("_t")))
    relname, name_len = _cstr_at(name_tail)
    # within _t (1-indexed hex): namespace cstr spans 1.._n, relname
    # spans _n+1.._n+name_len, replident 2 chars, then ncols (2B)
    with_cols = rel2.select(
        "from_lsn", "relid", relname.alias("relname"),
        F.conv(
            F.col("_t").substr(F.col("_n") + name_len + 3, F.lit(4)), 16, 10
        ).cast("long").alias("n_cols"),
    )
    w = Window.partitionBy("relid").orderBy("from_lsn")
    return with_cols.select(
        "relid", "relname", "from_lsn", "n_cols",
        F.coalesce(
            F.lead("from_lsn").over(w), F.lit((1 << 62))
        ).alias("to_lsn"),
    )


def resolve_schema_versions(
    frames: DataFrame,
    frame_col: str = "frame",
    versions: DataFrame | None = None,
) -> DataFrame:
    """Per (table, schema version): how many data events decoded under
    each relation announcement, with the LSN span — the audit of a
    mid-stream schema change. The version table is metadata-sized and
    broadcasts; the data stream joins on (relid, LSN interval) with no
    shuffle of the stream itself.

    For a STREAMING frame input, pass ``versions`` pre-computed from a
    static frame set (relation_versions uses a lead() window, which
    cannot run on an unbounded stream) — the join below is then a
    stream-static broadcast interval join, proven in
    tests/test_pgoutput.py::test_relation_versioning_streaming_parity."""
    if versions is None and frames.isStreaming:
        raise ValueError(
            "streaming input needs a pre-computed static `versions` table"
        )
    if not frames.isStreaming:
        frames = _tracked_persist(frames)
    data = decode_frames(frames, frame_col).filter(F.col("op").isNotNull()).select(
        "relid", "lsn"
    )
    vers = versions if versions is not None else relation_versions(frames, frame_col)
    joined = data.join(
        F.broadcast(vers),
        (data["relid"] == vers["relid"])
        & (data["lsn"] >= vers["from_lsn"])
        & (data["lsn"] < vers["to_lsn"]),
    )
    return (
        joined.groupBy("relname", "n_cols")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
        )
        .select(
            F.col("relname").alias("source_table"),
            F.col("n_cols").alias("schema_version_cols"),
            "n_events", "first_lsn", "last_lsn",
        )
    )
