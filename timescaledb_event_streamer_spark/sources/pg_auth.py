"""PostgreSQL startup + SCRAM-SHA-256 authentication (pure stdlib).

The reference authenticates inside ``pgconn.Connect`` with a
``replication=database`` connection string
(internal/replication/replicationconnection/replicationconnection.go:36
— pgconn performs the startup packet and SASL exchange internally).
``ReplicationFeeder`` previously pumped a pre-authenticated byte
transport; this module supplies the missing first hop so the feeder
can reach a real server demanding SCRAM: the v3 StartupMessage and the
RFC 5802 / RFC 7677 SCRAM-SHA-256 client exchange, implemented with
hashlib/hmac/secrets only.

Wire shapes (public PostgreSQL frontend/backend protocol v3):

  StartupMessage (no type byte): int32 len + int32 196608 +
      (key\\0 value\\0)* + \\0
  AuthenticationSASL        'R', int32 10 + mech\\0 ... \\0
  SASLInitialResponse       'p', mech\\0 + int32 n + client-first
  AuthenticationSASLContinue'R', int32 11 + server-first
  SASLResponse              'p', client-final
  AuthenticationSASLFinal   'R', int32 12 + "v=<b64 ServerSignature>"
  AuthenticationOk          'R', int32 0

SCRAM-SHA-256 (RFC 5802 framework, RFC 7677 hash binding):

  SaltedPassword = Hi(Normalize(password), salt, i)   # PBKDF2, dkLen 32
  ClientKey  = HMAC(SaltedPassword, "Client Key")
  StoredKey  = H(ClientKey)
  AuthMessage = client-first-bare + "," + server-first +
                "," + client-final-without-proof
  ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage)
  ServerSignature = HMAC(HMAC(SaltedPassword, "Server Key"), AuthMessage)

The RFC 7677 section-3 exchange (user "user", password "pencil",
nonce "rOprNGfwEbeRWgbNEkqO") is pinned as a golden test vector in
tests/test_pg_auth.py. Channel binding is not negotiated (gs2 header
"n,,", mechanism SCRAM-SHA-256 — not -PLUS); PostgreSQL ignores the
SCRAM-level username and takes the user from the startup packet, so
the client-first bare sends "n=" like libpq does.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets
import struct
import unicodedata

PROTOCOL_V3 = 196608  # (3 << 16) | 0
AUTH_OK = 0
AUTH_CLEARTEXT = 3
AUTH_MD5 = 5
AUTH_SASL = 10
AUTH_SASL_CONTINUE = 11
AUTH_SASL_FINAL = 12

MECH = "SCRAM-SHA-256"
_GS2_HEADER = "n,,"


class AuthError(RuntimeError):
    """Authentication failed or the server violated the SCRAM flow."""


def saslprep(password: str) -> str:
    """Minimal RFC 4013 normalization: NFKC, map non-ASCII spaces to
    space, reject prohibited control characters. ASCII passwords pass
    through unchanged (the common case); anything the subset cannot
    express fails loudly rather than silently mis-hashing."""
    out = []
    for ch in password:
        if unicodedata.category(ch) == "Zs":
            out.append(" ")
        elif unicodedata.category(ch) in ("Cc", "Cf"):
            raise AuthError(
                f"control character {ch!r} in password is prohibited by SASLprep"
            )
        else:
            out.append(ch)
    return unicodedata.normalize("NFKC", "".join(out))


def hi(password: str, salt: bytes, iterations: int) -> bytes:
    """RFC 5802 Hi() — PBKDF2-HMAC-SHA-256 with dkLen = 32."""
    return hashlib.pbkdf2_hmac(
        "sha256", saslprep(password).encode(), salt, iterations, dklen=32
    )


def parse_scram_attrs(msg: str) -> dict[str, str]:
    """'r=...,s=...,i=...' -> {'r': ..., 's': ..., 'i': ...}. SCRAM
    attribute values may contain '=' (base64), so split on the FIRST
    '=' only."""
    attrs: dict[str, str] = {}
    for part in msg.split(","):
        if not part:
            continue
        if len(part) < 2 or part[1] != "=":
            raise AuthError(f"malformed SCRAM attribute: {part!r}")
        attrs[part[0]] = part[2:]
    return attrs


class ScramClient:
    """One SCRAM-SHA-256 exchange: client_first() ->
    handle_server_first(...) -> verify_server_final(...)."""

    def __init__(
        self, password: str, nonce: str | None = None, username: str = ""
    ):
        # PostgreSQL ignores the SCRAM-level username (startup packet
        # wins), so the default is libpq's empty "n=". The RFC 7677
        # test vector sets username="user" to pin the exact exchange.
        # Kafka DOES authenticate on this field, so the username is
        # saslprep'd and RFC 5802 §5.1-escaped ('=' -> '=3D' first,
        # then ',' -> '=2C') — a ',' or '=' in a real username must
        # not produce a malformed/misparsed client-first-bare.
        self.password = password
        self.nonce = nonce or base64.b64encode(secrets.token_bytes(18)).decode()
        escaped = saslprep(username).replace("=", "=3D").replace(",", "=2C")
        self.client_first_bare = f"n={escaped},r={self.nonce}"
        self._auth_message: str | None = None
        self._salted: bytes | None = None

    def client_first(self) -> str:
        return _GS2_HEADER + self.client_first_bare

    def handle_server_first(self, server_first: str) -> str:
        """Compute the client-final-message (with proof)."""
        attrs = parse_scram_attrs(server_first)
        if not all(k in attrs for k in "rsi"):
            raise AuthError(f"server-first missing attributes: {server_first!r}")
        if not attrs["r"].startswith(self.nonce):
            raise AuthError("server nonce does not extend the client nonce")
        if len(attrs["r"]) <= len(self.nonce):
            raise AuthError("server added no nonce entropy")
        salt = base64.b64decode(attrs["s"])
        iterations = int(attrs["i"])
        if iterations < 1:
            raise AuthError(f"non-positive iteration count {iterations}")
        self._salted = hi(self.password, salt, iterations)
        client_key = hmac.digest(self._salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        channel = base64.b64encode(_GS2_HEADER.encode()).decode()  # 'biws'
        without_proof = f"c={channel},r={attrs['r']}"
        self._auth_message = ",".join(
            [self.client_first_bare, server_first, without_proof]
        )
        signature = hmac.digest(
            stored_key, self._auth_message.encode(), "sha256"
        )
        proof = bytes(a ^ b for a, b in zip(client_key, signature))
        return f"{without_proof},p={base64.b64encode(proof).decode()}"

    def verify_server_final(self, server_final: str) -> None:
        """Check v=ServerSignature — MUTUAL authentication: a server
        that does not know the password (or a MITM replay) cannot
        produce it."""
        if self._auth_message is None or self._salted is None:
            raise AuthError("verify_server_final before handle_server_first")
        attrs = parse_scram_attrs(server_final)
        if "e" in attrs:
            raise AuthError(f"server rejected authentication: {attrs['e']}")
        if "v" not in attrs:
            raise AuthError(f"server-final missing v=: {server_final!r}")
        server_key = hmac.digest(self._salted, b"Server Key", "sha256")
        expected = hmac.digest(
            server_key, self._auth_message.encode(), "sha256"
        )
        if not hmac.compare_digest(
            base64.b64decode(attrs["v"]), expected
        ):
            raise AuthError("server signature mismatch — not the real server")


def startup_packet(user: str, database: str, **params: str) -> bytes:
    """v3 StartupMessage for a logical-replication session: always
    sends replication=database (the reference's connection mode —
    replicationconnection.go:36) unless overridden via params."""
    kv = {"user": user, "database": database, "replication": "database"}
    kv.update(params)
    body = b"".join(
        k.encode() + b"\x00" + v.encode() + b"\x00" for k, v in kv.items()
    )
    payload = struct.pack(">I", PROTOCOL_V3) + body + b"\x00"
    return struct.pack(">I", len(payload) + 4) + payload


def sasl_initial_response(client_first: str, mechanism: str = MECH) -> bytes:
    data = client_first.encode()
    body = mechanism.encode() + b"\x00" + struct.pack(">I", len(data)) + data
    return b"p" + struct.pack(">I", len(body) + 4) + body


def sasl_response(client_final: str) -> bytes:
    data = client_final.encode()
    return b"p" + struct.pack(">I", len(data) + 4) + data


def parse_auth_request(body: bytes) -> tuple[int, bytes]:
    """'R' message body -> (authtype, payload)."""
    if len(body) < 4:
        raise AuthError(f"short authentication message: {body!r}")
    (authtype,) = struct.unpack(">I", body[:4])
    return authtype, body[4:]


def parse_sasl_mechanisms(payload: bytes) -> list[str]:
    """AuthenticationSASL payload: NUL-terminated mechanism names,
    ending with an empty string."""
    mechs = []
    pos = 0
    while pos < len(payload):
        end = payload.index(b"\x00", pos)
        if end == pos:
            break
        mechs.append(payload[pos:end].decode())
        pos = end + 1
    return mechs
