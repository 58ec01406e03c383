"""PostgreSQL streaming-replication HANDSHAKE codecs (hex wire form).

The reference opens its replication channel with three protocol steps
before any pgoutput frame flows
(internal/replication/replicationconnection/replicationconnection.go:36,
via pglogrepl):

  IDENTIFY_SYSTEM           -> RowDescription 'T' + DataRow 'D' +
                               CommandComplete 'C' carrying
                               (systemid, timeline, xlogpos, dbname)
  CREATE_REPLICATION_SLOT
    <slot> LOGICAL pgoutput
    EXPORT_SNAPSHOT         -> 'T'/'D'/'C' carrying (slot_name,
                               consistent_point, snapshot_name,
                               output_plugin)
                               (replicationconnection.go:156-183)
  START_REPLICATION SLOT ...-> CopyBothResponse 'W', after which the
                               CopyData stream is the pgoutput codec
                               (sources/pgoutput.py, J12-J14)

plus the restart-LSN decision (locateRestartLSN,
replicationconnection.go:216-290): start from the slot's
confirmed_flush_lsn, take the offset-storage LSN if it is further
ahead, and fall back to the server's current xlogpos when both are
absent.

This module implements the backend reply messages as pure hex codegen
(the same substr/conv technique as sources/pgoutput.py — zero Python
per row) and the restart rule as a Column expression. Wire layouts are
the public PostgreSQL frontend/backend protocol v3 message formats:

  every backend message:  type(1B) + length(4B, includes itself) + body
  RowDescription 'T':     nfields(2B) + per field: name\\0 +
                          tableoid(4B) + attnum(2B) + typoid(4B) +
                          typlen(2B) + typmod(4B) + format(2B)
  DataRow 'D':            ncols(2B) + per col: len(4B, -1 = NULL) +
                          bytes
  CommandComplete 'C':    tag\\0
  CopyBothResponse 'W':   overall format(1B) + ncols(2B) +
                          per-col format(2B)

What needs a live server (the TCP session itself, slot DDL execution)
is out of scope here and documented as the psycopg plug point in
CONNECTOR.md; everything byte-level is covered by golden-bytes tests
(tests/test_pg_replication.py) and the driver-certified
cdc_replication_handshake query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.sources.pgoutput import _cstr_at, _h, _u

#: 'len = -1' marker in a DataRow column (NULL value)
_NULL_LEN = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# LSN text form ("X/Y", both halves uppercase hex — pglogrepl.LSN.String)


def lsn_to_text(lsn: Column) -> Column:
    """Numeric LSN -> the wire text 'XLOGID/XRECOFF' (uppercase hex)."""
    return F.concat(
        F.hex(F.shiftrightunsigned(lsn.cast("long"), 32)),
        F.lit("/"),
        F.hex(lsn.cast("long") % F.lit(1 << 32)),
    )


def lsn_from_text(txt: Column) -> Column:
    """Wire text 'X/Y' -> numeric LSN (delegates to the canonical
    parser in sources/wal2json.py so corruption-hardening fixes land
    in one place)."""
    from timescaledb_event_streamer_spark.sources.wal2json import lsn_to_long

    return lsn_to_long(txt)


# ---------------------------------------------------------------------------
# encode (golden-reply synthesis — what a server would send back)


def _msg(type_hex: str, body: Column) -> Column:
    """Wrap a body in the v3 framing: type byte + int32 length that
    counts itself plus the body."""
    return F.concat(
        F.lit(type_hex), _h(F.octet_length(body) / 2 + 4, 4), body
    )


def _field_desc(name: Column, typoid: int) -> Column:
    """One RowDescription field entry (tableoid/attnum 0, typlen -1
    proxied as 0xFFFF, typmod -1, text format)."""
    return F.concat(
        F.hex(name), F.lit("00"),            # name\0
        F.lit("00000000"), F.lit("0000"),    # tableoid, attnum
        _h(F.lit(typoid), 4),
        F.lit("FFFF"), F.lit("FFFFFFFF"),    # typlen -1, typmod -1
        F.lit("0000"),                       # text format
    )


def _data_value(val: Column | None) -> Column:
    """One DataRow column entry: int32 byte length + bytes, -1 = NULL."""
    if val is None:
        return F.lit("FFFFFFFF")
    return F.concat(_h(F.octet_length(val), 4), F.hex(val))


def encode_query_reply(
    fields: list[tuple[Column, int]],
    values: list[Column | None],
    command_tag: str,
) -> Column:
    """Full single-row simple-query reply stream:
    RowDescription + DataRow + CommandComplete, concatenated hex."""
    t_body = F.concat(
        _h(F.lit(len(fields)), 2),
        *[_field_desc(name, oid) for name, oid in fields],
    )
    d_body = F.concat(
        _h(F.lit(len(values)), 2), *[_data_value(v) for v in values]
    )
    c_body = F.concat(F.hex(F.lit(command_tag)), F.lit("00"))
    return F.concat(_msg("54", t_body), _msg("44", d_body), _msg("43", c_body))


def encode_copy_both_response(ncols: int) -> Column:
    """CopyBothResponse 'W' for a START_REPLICATION accept: overall
    format 0 (text per the replication protocol), ncols text columns."""
    return _msg(
        "57",
        F.concat(
            F.lit("00"), _h(F.lit(ncols), 2),
            F.lit("".join(["0000"] * ncols)),
        ),
    )


# ---------------------------------------------------------------------------
# decode


def split_backend_messages(h: Column, max_msgs: int = 6) -> Column:
    """Split a concatenated backend-message stream into an array of
    (msg_type, body) structs by walking the length prefixes — a
    bounded fold (the JPEG segment-walk technique), pure codegen.
    Unknown tails / torn frames stop the walk via try_cast NULLs."""
    init = F.struct(
        F.lit(1).cast("long").alias("pos"),
        F.array().cast("array<struct<msg_type:string,body:string>>").alias("out"),
    )

    def step(acc: Column, _i: Column) -> Column:
        pos = acc.getField("pos")
        in_range = pos < F.length(h)
        mlen = _u(h, pos + 2, 4)  # includes itself, excludes type byte
        ok = in_range & mlen.isNotNull() & (mlen >= 4)
        entry = F.struct(
            F.decode(F.unhex(h.substr(pos, F.lit(2))), "UTF-8").alias("msg_type"),
            h.substr(pos + 10, (mlen - 4) * 2).alias("body"),
        )
        return F.when(
            ok,
            F.struct(
                (pos + 2 + mlen * 2).alias("pos"),
                F.concat(acc.getField("out"), F.array(entry)).alias("out"),
            ),
        ).otherwise(acc)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(max_msgs)), init, step
    ).getField("out")


def decode_data_row(body: Column, max_cols: int = 4) -> Column:
    """DataRow body -> array<string> of column values (NULL for -1
    lengths). Bounded sequential fold over the length prefixes."""
    ncols = _u(body, 1, 2)
    init = F.struct(
        F.lit(5).cast("long").alias("pos"),
        F.array().cast("array<string>").alias("vals"),
    )

    def step(acc: Column, i: Column) -> Column:
        pos = acc.getField("pos")
        clen = _u(body, pos, 4)
        is_null = clen == F.lit(_NULL_LEN)
        val = F.when(is_null, F.lit(None).cast("string")).otherwise(
            F.decode(F.unhex(body.substr(pos + 8, clen * 2)), "UTF-8")
        )
        nxt = F.when(is_null, pos + 8).otherwise(pos + 8 + clen * 2)
        return F.when(
            (i <= ncols) & clen.isNotNull(),
            F.struct(
                nxt.alias("pos"),
                F.concat(acc.getField("vals"), F.array(val)).alias("vals"),
            ),
        ).otherwise(acc)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(max_cols)), init, step
    ).getField("vals")


def decode_row_description(body: Column, max_fields: int = 4) -> Column:
    """RowDescription body -> struct(nfields, names array<string>,
    typoids array<long>): the declared result shape the client checks
    before reading DataRows. Name walk is the byte-pair terminator
    search (naive '00' substring match can span two hex pairs)."""
    nfields = _u(body, 1, 2)
    init = F.struct(
        F.lit(5).cast("long").alias("pos"),
        F.array().cast("array<string>").alias("names"),
        F.array().cast("array<long>").alias("typoids"),
    )

    def step(acc: Column, i: Column) -> Column:
        pos = acc.getField("pos")
        rest = body.substr(pos, F.length(body))
        name, consumed = _cstr_at(rest)
        typoid = _u(body, pos + consumed + 12, 4)
        # fixed tail after the name: tableoid(4)+attnum(2)+typoid(4)+
        # typlen(2)+typmod(4)+format(2) = 18 bytes = 36 hex
        return F.when(
            i <= nfields,
            F.struct(
                (pos + consumed + 36).alias("pos"),
                F.concat(acc.getField("names"), F.array(name)).alias("names"),
                F.concat(acc.getField("typoids"), F.array(typoid)).alias("typoids"),
            ),
        ).otherwise(acc)

    folded = F.aggregate(F.sequence(F.lit(1), F.lit(max_fields)), init, step)
    return F.struct(
        nfields.alias("nfields"),
        folded.getField("names").alias("names"),
        folded.getField("typoids").alias("typoids"),
    )


def decode_copy_both(body: Column) -> Column:
    """CopyBothResponse body -> struct(overall_format, ncols,
    col_formats array<long>)."""
    ncols = _u(body, 3, 2)
    formats = F.transform(
        F.sequence(F.lit(1), ncols.cast("int")),
        lambda i: _u(body, 7 + (i - 1) * 4, 2),
    )
    return F.struct(
        _u(body, 1, 1).alias("overall_format"),
        ncols.alias("ncols"),
        formats.alias("col_formats"),
    )


def _reply_values(stream: Column, max_cols: int = 4) -> Column:
    """Shortcut: the first DataRow's values out of a reply stream."""
    msgs = split_backend_messages(stream)
    d_body = F.filter(msgs, lambda m: m.getField("msg_type") == "D")[0].getField(
        "body"
    )
    return decode_data_row(d_body, max_cols)


def parse_identify_system(df: DataFrame, col: str = "reply") -> DataFrame:
    """Decode an IDENTIFY_SYSTEM reply stream into the
    pglogrepl.IdentifySystemResult fields (+ the numeric LSN and the
    declared field names as a decoder-honesty check)."""
    stream = F.col(col)
    msgs = split_backend_messages(stream)
    t_body = F.filter(msgs, lambda m: m.getField("msg_type") == "T")[0].getField(
        "body"
    )
    desc = decode_row_description(t_body)
    vals = _reply_values(stream)
    return df.withColumns(
        {
            "declared_fields": F.array_join(desc.getField("names"), ","),
            "system_id": vals[0],
            "timeline": vals[1].try_cast("long"),
            "xlogpos_text": vals[2],
            "xlogpos_lsn": lsn_from_text(vals[2]),
            "dbname": vals[3],
        }
    )


def parse_create_slot_reply(df: DataFrame, col: str = "reply") -> DataFrame:
    """Decode a CREATE_REPLICATION_SLOT reply stream into the
    pglogrepl.CreateReplicationSlotResult fields."""
    vals = _reply_values(F.col(col))
    return df.withColumns(
        {
            "slot_name": vals[0],
            "consistent_point_text": vals[1],
            "consistent_point_lsn": lsn_from_text(vals[1]),
            "snapshot_name": vals[2],
            "output_plugin": vals[3],
        }
    )


# ---------------------------------------------------------------------------
# restart-LSN decision (locateRestartLSN)


def restart_lsn(
    confirmed_flush: Column, offset_lsn: Column, xlog_pos: Column
) -> Column:
    """The reference's restart-point rule
    (replicationconnection.go:216-290): start from the slot's
    confirmed_flush_lsn; an offset-storage LSN further ahead wins;
    zero falls back to the server's current xlogpos. NULL offset =
    no offset stored (offset == nil)."""
    base = F.coalesce(confirmed_flush, F.lit(0))
    with_offset = F.when(
        offset_lsn.isNotNull() & (offset_lsn > base), offset_lsn
    ).otherwise(base)
    return F.when(with_offset == 0, xlog_pos).otherwise(with_offset)


def restart_source(
    confirmed_flush: Column, offset_lsn: Column, xlog_pos: Column
) -> Column:
    """Which restart point won — the reference's three log branches
    (confirmed flush / offset storage / current xlogpos), evaluated in
    the same order."""
    chosen = restart_lsn(confirmed_flush, offset_lsn, xlog_pos)
    return (
        F.when(chosen == F.coalesce(confirmed_flush, F.lit(0)), "confirmed_flush")
        .when(offset_lsn.isNotNull() & (chosen == offset_lsn), "offset")
        .otherwise(F.lit("xlog_pos"))
    )


# ---------------------------------------------------------------------------
# transport loop: the receive/ack pump the reference runs around these
# codecs (replicationhandler.go:115-190 receive loop + 5s standby
# cadence, replicationconnection.go:93-104 SendStatusUpdate with
# write == apply == processed + 1). Pure driver-side Python — it moves
# bytes between a socket/file-like and the landing directory the Spark
# file stream watches; every frame it lands is decoded by the SAME
# column codecs above (parse_pgoutput et al.), so the transport adds
# no byte knowledge of its own beyond protocol-v3 framing. psycopg is
# NOT required: any object with recv()/sendall() (a socket) or
# read()/write() (a file pair, a pipe) carries the session.


def _frame_reader(conn):
    """Adapt a socket or file-like to a pull-one-chunk callable."""
    if hasattr(conn, "recv"):
        return lambda n: conn.recv(n)
    return lambda n: conn.read(n)


def _frame_writer(conn):
    if hasattr(conn, "sendall"):
        return conn.sendall
    if hasattr(conn, "write"):
        return conn.write
    return lambda b: None  # read-only replay source: acks are logged


class ProtocolError(RuntimeError):
    """Backend sent an ErrorResponse or a malformed frame."""


#: the magic request code (1234 << 16 | 5679) of the pre-startup
#: SSLRequest packet — PostgreSQL protocol §55.2.10
SSL_REQUEST_CODE = 80877103


def negotiate_tls(sock, sslmode: str = "require", context=None,
                  server_hostname: str | None = None, verify: bool = True):
    """The pre-startup SSLRequest dance (reference: pgconn performs
    this inside Connect when sslmode asks for it): send the 8-byte
    SSLRequest, read the single-byte answer, and TLS-wrap the socket
    on 'S'. Returns the (possibly wrapped) socket ready for
    ``ReplicationFeeder.authenticate``.

    sslmode follows libpq semantics for the three modes a feeder
    deployment uses:

    - ``"require"``: the server MUST answer 'S'. Peer verification
      is ON by default (system CA bundle + hostname check — libpq's
      verify-full); pass an ``ssl.SSLContext`` with your own CA for
      verify-ca against a private CA, or ``verify=False`` to get
      libpq's literal sslmode=require (encrypt, do NOT authenticate
      the server — MITM-able, so it must be asked for explicitly);
    - ``"prefer"``: 'S' wraps, 'N' continues in cleartext;
    - ``"disable"``: no bytes sent, socket returned untouched.
    """
    import ssl as _ssl
    import struct as _struct

    if sslmode == "disable":
        return sock
    if sslmode not in ("require", "prefer"):
        raise ValueError(f"unsupported sslmode {sslmode!r}")
    sock.sendall(_struct.pack(">II", 8, SSL_REQUEST_CODE))
    answer = sock.recv(1)
    if answer == b"S":
        if context is None:
            if verify:
                context = _ssl.create_default_context()
            else:
                context = _ssl.SSLContext(_ssl.PROTOCOL_TLS_CLIENT)
                context.check_hostname = False
                context.verify_mode = _ssl.CERT_NONE
        return context.wrap_socket(
            sock, server_hostname=server_hostname or "postgres"
        )
    if answer == b"N":
        if sslmode == "require":
            raise ProtocolError("server refused TLS but sslmode=require")
        return sock
    raise ProtocolError(f"unexpected SSLRequest answer {answer!r}")


class ReplicationFeeder:
    """The live-session transport pump (VERDICT r6 item 3).

    Drives a `replication=database` conversation over any byte
    transport: sends the three handshake commands, decodes their
    replies (the same layouts `parse_identify_system` /
    `parse_create_slot_reply` / `decode_copy_both` cover — a pytest
    cross-checks this parser against those column codecs on the
    golden bytes), then pumps CopyData frames into `landing_dir` as
    hex lines while maintaining the standby-status cadence:

    - every `status_interval_s` (reference: 5s,
      replicationhandler.go:119) a StandbyStatusUpdate goes out with
      write == apply == flush == processed + 1, where processed is
      the AcknowledgeReceived position walStart + len(payload) —
      identical to parse_standby_status / cdc_keepalive_status (J14);
    - a primary keepalive with reply-requested forces the status out
      immediately (replicationhandler.go:174-176 zeroes the
      deadline);
    - frames land atomically (tmp + rename), one hex frame per line,
      so Spark's file source never sees a partial file.

    The clock is injected for determinism in tests; a live deployment
    passes nothing and gets wall time.
    """

    STATUS_INTERVAL_S = 5.0

    def __init__(
        self,
        conn,
        landing_dir=None,
        slot_name: str = "timescaledb_streamer",
        publication: str = "timescaledb_streamer",
        status_interval_s: float = STATUS_INTERVAL_S,
        frames_per_file: int = 64,
        clock=None,
        wallclock_us=None,
    ):
        import time as _time

        self._recv = _frame_reader(conn)
        self._send = _frame_writer(conn)
        self.landing_dir = landing_dir
        self.slot_name = slot_name
        self.publication = publication
        self.status_interval_s = status_interval_s
        self.frames_per_file = frames_per_file
        self._clock = clock or _time.monotonic
        self._wallclock_us = wallclock_us or (
            lambda: int(_time.time() * 1_000_000)
        )
        self._buf = b""
        self._pending: list[str] = []
        self._file_seq = 0
        #: AcknowledgeReceived position (walStart + payload length of
        #: the last XLogData) — what SendStatusUpdate acks + 1
        self.processed_lsn = 0
        self.server_wal_end = 0
        self.frames_landed = 0
        self.status_log: list[dict] = []
        self._next_status_at = self._clock() + status_interval_s

    # -- protocol-v3 framing ------------------------------------------------

    def _read_message(self):
        """One backend message (type byte, body bytes) or None on a
        clean EOF at a message boundary."""
        import struct

        while len(self._buf) < 5:
            chunk = self._recv(65536)
            if not chunk:
                if self._buf:
                    raise ProtocolError(
                        f"EOF mid-frame ({len(self._buf)} bytes buffered)"
                    )
                return None
            self._buf += chunk
        mtype = self._buf[0:1]
        (length,) = struct.unpack(">I", self._buf[1:5])
        total = 1 + length
        while len(self._buf) < total:
            chunk = self._recv(65536)
            if not chunk:
                raise ProtocolError("EOF mid-frame")
            self._buf += chunk
        body = self._buf[5:total]
        self._buf = self._buf[total:]
        if mtype == b"E":
            raise ProtocolError(f"backend ErrorResponse: {body!r}")
        return mtype.decode(), body

    def _query(self, sql: str) -> None:
        import struct

        body = sql.encode() + b"\x00"
        self._send(b"Q" + struct.pack(">I", len(body) + 4) + body)

    # -- authentication --------------------------------------------------------

    def authenticate(
        self,
        user: str,
        database: str,
        password: str | None = None,
        nonce: str | None = None,
        **startup_params: str,
    ) -> dict:
        """Startup packet + SCRAM-SHA-256 (r7 verdict item 3). The
        reference authenticates inside pgconn.Connect with
        `replication=database` (replicationconnection.go:36); this is
        the same first hop, pure stdlib: send StartupMessage, run the
        RFC 5802/7677 SCRAM exchange if the server demands SASL
        (trust/AuthenticationOk passes straight through), then drain
        ParameterStatus/BackendKeyData until ReadyForQuery. Returns
        {'auth': 'scram-sha-256'|'trust', 'parameters': {...},
        'backend_pid': int|None}. Mutual: the server's v= signature
        is VERIFIED, so a password-less impostor fails loudly.
        Unsupported auth demands (cleartext, md5) raise ProtocolError
        naming the method rather than silently sending secrets."""
        from timescaledb_event_streamer_spark.sources import pg_auth

        self._send(
            pg_auth.startup_packet(user, database, **startup_params)
        )
        mode = None
        while True:
            m = self._read_message()
            if m is None:
                raise ProtocolError("EOF during authentication")
            mtype, body = m
            if mtype != "R":
                raise ProtocolError(
                    f"expected authentication request, got {mtype!r}"
                )
            authtype, payload = pg_auth.parse_auth_request(body)
            if authtype == pg_auth.AUTH_OK:
                mode = mode or "trust"
                break
            if authtype == pg_auth.AUTH_SASL:
                mechs = pg_auth.parse_sasl_mechanisms(payload)
                if pg_auth.MECH not in mechs:
                    raise ProtocolError(
                        f"server offers {mechs}, need {pg_auth.MECH}"
                    )
                if password is None:
                    raise pg_auth.AuthError(
                        "server demands SCRAM but no password was given"
                    )
                scram = pg_auth.ScramClient(password, nonce=nonce)
                self._send(
                    pg_auth.sasl_initial_response(scram.client_first())
                )
                m = self._read_message()
                if m is None:
                    raise ProtocolError(
                        "server closed the connection during SCRAM "
                        "(often: invalid credentials)"
                    )
                authtype, payload = pg_auth.parse_auth_request(m[1])
                if authtype != pg_auth.AUTH_SASL_CONTINUE:
                    raise ProtocolError(
                        f"expected SASLContinue, got authtype {authtype}"
                    )
                client_final = scram.handle_server_first(payload.decode())
                self._send(pg_auth.sasl_response(client_final))
                m = self._read_message()
                if m is None:
                    raise ProtocolError(
                        "server closed the connection after the client "
                        "proof (often: invalid credentials)"
                    )
                authtype, payload = pg_auth.parse_auth_request(m[1])
                if authtype != pg_auth.AUTH_SASL_FINAL:
                    raise ProtocolError(
                        f"expected SASLFinal, got authtype {authtype}"
                    )
                scram.verify_server_final(payload.decode())
                mode = "scram-sha-256"
                continue  # AuthenticationOk follows
            raise ProtocolError(
                f"unsupported authentication method {authtype} "
                "(only trust and SCRAM-SHA-256 are implemented)"
            )
        parameters: dict[str, str] = {}
        backend_pid = None
        while True:
            m = self._read_message()
            if m is None:
                raise ProtocolError("EOF before ReadyForQuery")
            mtype, body = m
            if mtype == "S":
                key, _, val = body.rstrip(b"\x00").partition(b"\x00")
                parameters[key.decode()] = val.decode()
            elif mtype == "K":
                import struct as _struct

                backend_pid = _struct.unpack(">I", body[:4])[0]
            elif mtype == "Z":
                break
        return {
            "auth": mode,
            "parameters": parameters,
            "backend_pid": backend_pid,
        }

    # -- handshake ------------------------------------------------------------

    @staticmethod
    def _simple_reply(messages) -> dict:
        """Fold a RowDescription + DataRow reply into {field: text} —
        the same layout parse_identify_system/parse_create_slot_reply
        decode column-side (cross-checked in pytest)."""
        import struct

        fields: list[str] = []
        values: list = []
        for mtype, body in messages:
            if mtype == "T":
                (nf,) = struct.unpack(">h", body[:2])
                pos = 2
                for _ in range(nf):
                    end = body.index(b"\x00", pos)
                    fields.append(body[pos:end].decode())
                    pos = end + 1 + 18  # fixed per-field descriptor
            elif mtype == "D":
                (nc,) = struct.unpack(">h", body[:2])
                pos = 2
                for _ in range(nc):
                    (ln,) = struct.unpack(">i", body[pos : pos + 4])
                    pos += 4
                    if ln < 0:
                        values.append(None)
                    else:
                        values.append(body[pos : pos + ln].decode())
                        pos += ln
        return dict(zip(fields, values))

    def _read_simple_reply(self) -> dict:
        msgs = []
        while True:
            m = self._read_message()
            if m is None:
                raise ProtocolError("EOF during simple-query reply")
            msgs.append(m)
            if m[0] == "C":  # CommandComplete ends the reply
                return self._simple_reply(msgs)

    def handshake(self, restart_lsn_text: str | None = None) -> dict:
        """IDENTIFY_SYSTEM -> CREATE_REPLICATION_SLOT ->
        START_REPLICATION, returning the decoded session facts. The
        start point defaults to the slot's consistent point (fresh
        slot, the restart rule's confirmed-flush branch)."""
        self._query("IDENTIFY_SYSTEM")
        ident = self._read_simple_reply()
        self._query(
            f"CREATE_REPLICATION_SLOT {self.slot_name} LOGICAL pgoutput "
            "EXPORT_SNAPSHOT"
        )
        slot = self._read_simple_reply()
        start_at = restart_lsn_text or slot.get(
            "consistent_point", ident.get("xlogpos", "0/0")
        )
        self._query(
            f"START_REPLICATION SLOT {self.slot_name} LOGICAL {start_at} "
            f"(proto_version '1', publication_names '{self.publication}')"
        )
        m = self._read_message()
        if m is None or m[0] != "W":
            raise ProtocolError(f"expected CopyBothResponse, got {m!r}")
        return {
            "system_id": ident.get("systemid"),
            "timeline": int(ident["timeline"]) if ident.get("timeline") else None,
            "xlogpos_text": ident.get("xlogpos"),
            "slot_name": slot.get("slot_name"),
            "consistent_point_text": slot.get("consistent_point"),
            "snapshot_name": slot.get("snapshot_name"),
            "output_plugin": slot.get("output_plugin"),
            "start_lsn_text": start_at,
        }

    # -- standby status -------------------------------------------------------

    def send_status(self, reply_requested: bool = False) -> dict:
        """StandbyStatusUpdate with write == flush == apply ==
        processed + 1 (replicationconnection.go:96-101; pglogrepl
        copies write into flush when unset)."""
        import struct

        pos = self.processed_lsn + 1
        client_us = self._wallclock_us() - 946_684_800_000_000  # PG epoch
        body = b"r" + struct.pack(
            ">QQQQb", pos, pos, pos, client_us, 1 if reply_requested else 0
        )
        self._send(b"d" + struct.pack(">I", len(body) + 4) + body)
        rec = {
            "write_lsn": pos,
            "flush_lsn": pos,
            "apply_lsn": pos,
            "reply_requested": bool(reply_requested),
        }
        self.status_log.append(rec)
        self._next_status_at = self._clock() + self.status_interval_s
        return rec

    # -- landing ---------------------------------------------------------------

    def _land(self, frame: bytes) -> None:
        self._pending.append(frame.hex().upper())
        self.frames_landed += 1
        if self.landing_dir and len(self._pending) >= self.frames_per_file:
            self.flush_landing()

    def flush_landing(self) -> int:
        """Write pending frames as one atomically-renamed text file
        (one hex frame per line) — the contract the Spark file
        stream consumes."""
        import os

        if not self._pending or not self.landing_dir:
            return 0
        os.makedirs(self.landing_dir, exist_ok=True)
        n = len(self._pending)
        final = os.path.join(
            self.landing_dir, f"frames-{self._file_seq:08d}.txt"
        )
        tmp = final + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("\n".join(self._pending) + "\n")
        os.rename(tmp, final)
        self._file_seq += 1
        self._pending = []
        return n

    # -- receive loop -----------------------------------------------------------

    def pump(self, max_frames: int | None = None) -> int:
        """The replicationhandler.go receive loop: land XLogData,
        track keepalives, keep the status cadence. Returns the number
        of CopyData frames landed this call; ends on EOF or after
        max_frames."""
        import struct

        landed = 0
        while max_frames is None or landed < max_frames:
            if self._clock() >= self._next_status_at:
                self.send_status()
            m = self._read_message()
            if m is None:
                break
            mtype, body = m
            if mtype != "d":
                continue  # reference warns + skips non-CopyData
            kind = body[0:1]
            if kind == b"k":
                wal_end, _server_us, reply = struct.unpack(">QQb", body[1:18])
                self.server_wal_end = max(self.server_wal_end, wal_end)
                if reply:
                    self.send_status(reply_requested=False)
            elif kind == b"w":
                wal_start, _wal_end, _us = struct.unpack(">QQQ", body[1:25])
                payload_len = len(body) - 25
                self.processed_lsn = max(
                    self.processed_lsn, wal_start + payload_len
                )
                self._land(body)
                landed += 1
        self.flush_landing()
        return landed


def lsn_text(lsn: int) -> str:
    """Integer LSN -> PostgreSQL XXX/XXX text form."""
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


def run_resilient(
    connect,
    *,
    max_reconnects: int = 5,
    backoff_base_s: float = 0.5,
    backoff_cap_s: float = 30.0,
    sleep=None,
    **feeder_kwargs,
) -> dict:
    """Supervised feeder loop (H16) — the deployment form of the
    reference's reconnect-and-retry (replicationconnection.go:126
    reconnects and re-issues START_REPLICATION when the stream
    drops; locateRestartLSN resumes from the slot position). This
    supervisor generalizes that single retry to capped exponential
    backoff and carries the ACK position across sessions, so every
    new session starts at processed + 1 — acknowledged WAL is never
    replayed, unacknowledged WAL is re-delivered (at-least-once,
    the landing layer's LSN idempotence absorbs re-sends).

    `connect` dials and returns a fresh authenticated byte transport
    (socket post negotiate_tls/authenticate, or any conn the feeder
    accepts). A clean EOF at a frame boundary ends the run; mid-frame
    EOFs / ProtocolErrors / OSErrors trigger reconnection. Returns a
    summary dict. `sleep` is injectable for tests.
    """
    import time as _time

    sleep = sleep or _time.sleep
    acked = 0
    frames_total = 0
    sessions = 0
    failures = 0
    backoffs: list[float] = []
    while True:
        try:
            conn = connect()
        except OSError:
            failures += 1
            if failures > max_reconnects:
                raise
            delay = min(backoff_base_s * 2 ** (failures - 1), backoff_cap_s)
            backoffs.append(delay)
            sleep(delay)
            continue
        feeder = ReplicationFeeder(conn, **feeder_kwargs)
        try:
            feeder.processed_lsn = acked
            feeder.handshake(
                restart_lsn_text=lsn_text(acked + 1) if acked else None
            )
            sessions += 1
            n = feeder.pump()
            frames_total += n
            return {
                "sessions": sessions,
                "reconnects": failures,
                "frames_landed": frames_total,
                "processed_lsn": feeder.processed_lsn,
                "backoffs": backoffs,
            }
        except (ProtocolError, OSError):
            if feeder.frames_landed:
                failures = 0  # progress resets the failure budget
            frames_total += feeder.frames_landed
            acked = max(acked, feeder.processed_lsn)
            feeder.flush_landing()
            failures += 1
            if failures > max_reconnects:
                raise
            delay = min(backoff_base_s * 2 ** (failures - 1), backoff_cap_s)
            backoffs.append(delay)
            sleep(delay)
        finally:
            close = getattr(conn, "close", None)
            if close:
                try:
                    close()
                except OSError:
                    pass
