"""Author the golden replication-session byte files.

Writes tests/golden/*.bin: the byte-for-byte conversations a live
PostgreSQL sends over a `replication=database` connection — the
IDENTIFY_SYSTEM and CREATE_REPLICATION_SLOT simple-query replies,
the START_REPLICATION CopyBothResponse, and a CopyData stream of
XLogData-wrapped pgoutput v1 frames (R, B, I, U, D, C) for one
committed transaction on public.metrics.

INDEPENDENCE RULE: this generator uses ONLY struct.pack and the
documented PostgreSQL wire layouts (protocol v3 message framing,
logical-streaming-replication pgoutput message formats) — never the
repo's encoders — so a decoder bug cannot be cancelled by a matching
encoder bug. The decode chain under test mirrors
internal/replication/replicationconnection/replicationconnection.go
(handshake) and replicationhandler.go (stream dispatch).

Run: python tools/make_golden_replication.py  (idempotent)
"""

from __future__ import annotations

import datetime
import struct
from pathlib import Path

GOLDEN = Path(__file__).resolve().parents[1] / "tests" / "golden"

PG_EPOCH = datetime.datetime(2000, 1, 1, tzinfo=datetime.timezone.utc)

# -- scenario constants (asserted verbatim by the pytest) ----------------
SYSTEM_ID = "7284066390163781250"
TIMELINE = 1
XLOGPOS_TEXT = "0/100FAB"
DBNAME = "postgres"
SLOT_NAME = "timescaledb_metrics"
CONSISTENT_POINT = "0/100FAB"
SNAPSHOT_NAME = "00000003-000004D2-1"
PLUGIN = "pgoutput"
RELID = 51234
XID = 777
COMMIT_TS = datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=datetime.timezone.utc)
B_LSN, I_LSN, U_LSN, D_LSN, C_LSN = 1000, 1002, 1006, 1010, 1011


def msg(mtype: bytes, body: bytes) -> bytes:
    """Protocol v3 framing: type byte + int32 length (incl. itself)."""
    return mtype + struct.pack(">I", len(body) + 4) + body


def cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def row_description(fields: list[tuple[str, int]]) -> bytes:
    body = struct.pack(">h", len(fields))
    for name, typoid in fields:
        body += cstr(name)
        #        tableoid  attnum  typoid  typlen  typmod  format
        body += struct.pack(">ihihih", 0, 0, typoid, -1, -1, 0)
    return msg(b"T", body)


def data_row(values: list[str | None]) -> bytes:
    body = struct.pack(">h", len(values))
    for v in values:
        if v is None:
            body += struct.pack(">i", -1)
        else:
            body += struct.pack(">I", len(v.encode())) + v.encode()
    return msg(b"D", body)


def command_complete(tag: str) -> bytes:
    return msg(b"C", cstr(tag))


def pg_micros(ts: datetime.datetime) -> int:
    return int((ts - PG_EPOCH).total_seconds() * 1_000_000)


def xlogdata(wal_start: int, payload: bytes) -> bytes:
    return b"w" + struct.pack(">QQQ", wal_start, wal_start, 0) + payload


def copydata(payload: bytes) -> bytes:
    return msg(b"d", payload)


def tuple_data(values: list[str | None]) -> bytes:
    out = struct.pack(">h", len(values))
    for v in values:
        if v is None:
            out += b"n"
        else:
            out += b"t" + struct.pack(">I", len(v.encode())) + v.encode()
    return out


def main() -> None:
    GOLDEN.mkdir(parents=True, exist_ok=True)

    # -- IDENTIFY_SYSTEM reply (RowDescription + DataRow + Complete)
    ident = (
        row_description(
            [("systemid", 25), ("timeline", 23), ("xlogpos", 3220), ("dbname", 25)]
        )
        + data_row([SYSTEM_ID, str(TIMELINE), XLOGPOS_TEXT, DBNAME])
        + command_complete("IDENTIFY_SYSTEM")
    )
    (GOLDEN / "identify_system.bin").write_bytes(ident)

    # -- CREATE_REPLICATION_SLOT reply
    slot = (
        row_description(
            [
                ("slot_name", 25),
                ("consistent_point", 3220),
                ("snapshot_name", 25),
                ("output_plugin", 25),
            ]
        )
        + data_row([SLOT_NAME, CONSISTENT_POINT, SNAPSHOT_NAME, PLUGIN])
        + command_complete("CREATE_REPLICATION_SLOT")
    )
    (GOLDEN / "create_slot.bin").write_bytes(slot)

    # -- START_REPLICATION accept: CopyBothResponse, textual, 0 cols
    (GOLDEN / "copy_both.bin").write_bytes(msg(b"W", struct.pack(">bh", 0, 0)))

    # -- CopyData stream: R, B, I, U, D, C for one transaction
    commit_us = pg_micros(COMMIT_TS)
    r_payload = (
        b"R"
        + struct.pack(">I", RELID)
        + cstr("public")
        + cstr("metrics")
        + b"d"  # replica identity default
        + struct.pack(">h", 3)
        # columns: flags(key?) + name + typoid + typmod
        + struct.pack(">b", 1) + cstr("user_id") + struct.pack(">Ii", 20, -1)
        + struct.pack(">b", 0) + cstr("cents") + struct.pack(">Ii", 20, -1)
        + struct.pack(">b", 0) + cstr("props") + struct.pack(">Ii", 25, -1)
    )
    b_payload = b"B" + struct.pack(">QQI", C_LSN, commit_us, XID)
    i_payload = (
        b"I" + struct.pack(">I", RELID) + b"N"
        + tuple_data(["7", "2050", "pr"])
    )
    u_payload = (
        b"U" + struct.pack(">I", RELID)
        + b"K" + tuple_data(["8", None, None])
        + b"N" + tuple_data(["8", "125", "qx"])
    )
    d_payload = (
        b"D" + struct.pack(">I", RELID) + b"K" + tuple_data(["9", None, None])
    )
    c_payload = b"C" + b"\x00" + struct.pack(">QQQ", C_LSN, C_LSN, commit_us)

    frames = [
        (0, r_payload),
        (B_LSN, b_payload),
        (I_LSN, i_payload),
        (U_LSN, u_payload),
        (D_LSN, d_payload),
        (C_LSN, c_payload),
    ]
    stream = b"".join(copydata(xlogdata(lsn, p)) for lsn, p in frames)
    (GOLDEN / "copydata_stream.bin").write_bytes(stream)

    # the same stream with primary keepalives interleaved — the mix a
    # live session actually delivers ('k' frames between XLogData;
    # the second requests a standby status reply)
    def keepalive(wal_end: int, reply: int) -> bytes:
        return copydata(
            b"k" + struct.pack(">QQb", wal_end, pg_micros(COMMIT_TS), reply)
        )

    # order: R, B, k(no reply), I, U, k(reply requested), D, C
    mixed = b"".join(
        [
            copydata(xlogdata(0, r_payload)),
            copydata(xlogdata(B_LSN, b_payload)),
            keepalive(I_LSN - 1, 0),
            copydata(xlogdata(I_LSN, i_payload)),
            copydata(xlogdata(U_LSN, u_payload)),
            keepalive(D_LSN - 1, 1),
            copydata(xlogdata(D_LSN, d_payload)),
            copydata(xlogdata(C_LSN, c_payload)),
        ]
    )
    (GOLDEN / "copydata_stream_keepalive.bin").write_bytes(mixed)
    for f in sorted(GOLDEN.glob("*.bin")):
        print(f"{f.name}: {f.stat().st_size} bytes")


if __name__ == "__main__":
    main()
