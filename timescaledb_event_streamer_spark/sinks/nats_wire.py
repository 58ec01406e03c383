"""NATS client wire protocol (H18) — the byte layer under the
reference's NATS sink (`internal/eventing/sink/nats/nats.go`). The
reference delegates to nats.go's client; here the public NATS
protocol (text framing: INFO/CONNECT/SUB/PUB/HPUB/MSG/HMSG/PING/
PONG/+OK/-ERR) is implemented directly so the delivery loop can
speak to a broker socket with no client library.

Covers the three authorization modes the reference wires up
(nats.go:46-64):

- ``userinfo``   — user/pass fields in CONNECT
- ``jwt``        — user JWT + NKey seed: the server's INFO nonce is
  ed25519-signed and sent as base64url ``sig``
- ``credentials``— a .creds file carrying the JWT and seed blocks

NKey seeds are the public base32+CRC16 format (prefix 'SU' for user
seeds); ed25519 signing rides the ``cryptography`` package when
importable and raises a clear error otherwise (userinfo needs no
crypto at all).
"""

from __future__ import annotations

import base64
import json

# -- CRC16 (CCITT/XModem, poly 0x1021 init 0) — the NKey checksum ----


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


# -- NKey seed handling ----------------------------------------------

#: seed prefix byte (base32 'S') and user prefix byte (base32 'U')
_PREFIX_SEED = 18 << 3
_PREFIX_USER = 20 << 3


def decode_nkey_seed(seed: str) -> bytes:
    """'SU...' base32 NKey seed -> 32-byte raw ed25519 seed; verifies
    the trailing CRC16 and the S/U prefix pair."""
    pad = "=" * (-len(seed) % 8)
    raw = base64.b32decode(seed + pad, casefold=True)
    if len(raw) < 4:
        raise ValueError("NKey seed too short")
    body, crc = raw[:-2], int.from_bytes(raw[-2:], "little")
    if crc16(body) != crc:
        raise ValueError("NKey seed CRC mismatch")
    b1 = body[0] & 0xF8
    b2 = ((body[0] & 0x07) << 5) | ((body[1] & 0xF8) >> 3)
    if b1 != _PREFIX_SEED or b2 != _PREFIX_USER:
        raise ValueError("not a user NKey seed (want 'SU' prefix)")
    return body[2:34]


def encode_nkey_seed(raw32: bytes) -> str:
    """32-byte raw ed25519 seed -> 'SU...' NKey seed (the inverse,
    for tests that mint their own identities)."""
    if len(raw32) != 32:
        raise ValueError("raw seed must be 32 bytes")
    body = bytes(
        [_PREFIX_SEED | (_PREFIX_USER >> 5), (_PREFIX_USER << 3) & 0xFF]
    ) + raw32
    crc = crc16(body).to_bytes(2, "little")
    return base64.b32encode(body + crc).decode().rstrip("=")


def sign_nonce(seed_raw32: bytes, nonce: bytes) -> str:
    """ed25519-sign the INFO nonce; returns base64url (no padding),
    exactly what the CONNECT ``sig`` field carries."""
    try:
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PrivateKey,
        )
    except ImportError as e:  # pragma: no cover - env without cryptography
        raise RuntimeError(
            "NKey signing needs the 'cryptography' package; "
            "use authorization='userinfo' without it"
        ) from e
    key = Ed25519PrivateKey.from_private_bytes(seed_raw32)
    return base64.urlsafe_b64encode(key.sign(nonce)).decode().rstrip("=")


def parse_creds_file(text: str) -> tuple[str, str]:
    """The .creds format: '-----BEGIN NATS USER JWT-----' block and
    a seed block -> (jwt, seed)."""
    jwt, seed = None, None
    lines = iter(text.splitlines())
    for line in lines:
        mark = line.strip()
        if mark.startswith("-----BEGIN NATS USER JWT"):
            jwt = next(lines).strip()
        elif mark.startswith("-----BEGIN USER NKEY SEED"):
            seed = next(lines).strip()
    if not jwt or not seed:
        raise ValueError("creds file missing JWT or seed block")
    return jwt, seed


# -- CONNECT assembly (nats.go:46-64 authorization switch) -----------

#: reference nats.go:95 — client connection name
CLIENT_NAME = "event-stream-prototype"

AUTH_TYPES = ("userinfo", "jwt", "credentials")


def connect_options(
    authorization: str = "userinfo",
    *,
    username: str = "",
    password: str = "",
    jwt: str = "",
    seed: str = "",
    creds_text: str = "",
    nonce: bytes = b"",
) -> dict:
    """The CONNECT payload for one of the reference's three auth
    modes; anything else is a LOUD config error (the reference's
    \"NATS AuthorizationType '%s' doesn't exist\")."""
    opts = {
        "verbose": False,
        "pedantic": False,
        "name": CLIENT_NAME,
        "lang": "python",
        "version": "0.1.0",
        "protocol": 1,
        "headers": True,
    }
    if authorization == "userinfo":
        opts["user"] = username
        opts["pass"] = password
    elif authorization in ("jwt", "credentials"):
        if authorization == "credentials":
            jwt, seed = parse_creds_file(creds_text)
        opts["jwt"] = jwt
        opts["sig"] = sign_nonce(decode_nkey_seed(seed), nonce)
    else:
        raise ValueError(
            f"NATS AuthorizationType {authorization!r} doesn't exist"
        )
    return opts


# -- protocol framing ------------------------------------------------


def encode_connect(opts: dict) -> bytes:
    return b"CONNECT " + json.dumps(opts).encode() + b"\r\n"


def encode_sub(subject: str, sid: str) -> bytes:
    return f"SUB {subject} {sid}\r\n".encode()


def encode_hpub(
    subject: str,
    headers: dict[str, str],
    payload: bytes,
    reply_to: str | None = None,
) -> bytes:
    """HPUB frame: version line + MIME headers + payload (the form
    PublishMsg uses when the message carries a Header)."""
    hdr = b"NATS/1.0\r\n"
    for k, v in headers.items():
        hdr += f"{k}: {v}\r\n".encode()
    hdr += b"\r\n"
    reply = f" {reply_to}" if reply_to else ""
    head = (
        f"HPUB {subject}{reply} {len(hdr)} {len(hdr) + len(payload)}\r\n"
    ).encode()
    return head + hdr + payload + b"\r\n"


def encode_pub(subject: str, payload: bytes, reply_to: str | None = None) -> bytes:
    reply = f" {reply_to}" if reply_to else ""
    return (
        f"PUB {subject}{reply} {len(payload)}\r\n".encode() + payload + b"\r\n"
    )


class NatsReader:
    """Incremental protocol reader over a socket-like object with
    ``recv``: yields (op, fields, headers, payload) tuples for the
    server->client ops a publisher sees (INFO, MSG, HMSG, PING,
    +OK, -ERR)."""

    def __init__(self, sock) -> None:
        self._sock = sock
        self._buf = b""

    def _fill(self) -> None:
        chunk = self._sock.recv(65536)
        if not chunk:
            raise ConnectionError("nats: server closed the connection")
        self._buf += chunk

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            self._fill()
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def next_op(self):
        line = self._read_line()
        if not line:
            return self.next_op()
        op, _, rest = line.partition(b" ")
        op = op.upper()
        if op == b"INFO":
            return ("INFO", json.loads(rest), None, None)
        if op == b"PING":
            return ("PING", None, None, None)
        if op == b"PONG":
            return ("PONG", None, None, None)
        if op == b"+OK":
            return ("+OK", None, None, None)
        if op == b"-ERR":
            return ("-ERR", rest.decode(), None, None)
        if op == b"MSG":
            parts = rest.decode().split()
            # subject sid [reply] nbytes
            nbytes = int(parts[-1])
            payload = self._read_exact(nbytes)
            self._read_exact(2)  # trailing CRLF
            return ("MSG", parts, None, payload)
        if op == b"HMSG":
            parts = rest.decode().split()
            hdr_len, total = int(parts[-2]), int(parts[-1])
            blob = self._read_exact(total)
            self._read_exact(2)
            return ("HMSG", parts, blob[:hdr_len], blob[hdr_len:])
        raise ValueError(f"unexpected NATS op {line[:40]!r}")


def parse_headers(hdr: bytes) -> dict[str, str]:
    """'NATS/1.0\\r\\nK: v\\r\\n\\r\\n' -> {k: v}."""
    out: dict[str, str] = {}
    for line in hdr.split(b"\r\n")[1:]:
        if not line:
            continue
        k, _, v = line.partition(b":")
        out[k.decode().strip()] = v.decode().strip()
    return out
