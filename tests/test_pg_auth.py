"""Startup + SCRAM-SHA-256 authentication (r7 verdict item 3).

Golden anchor: the RFC 7677 §3 example exchange (public test vector —
user "user", password "pencil", client nonce "rOprNGfwEbeRWgbNEkqO"),
checked byte-for-byte against our client. The end-to-end test runs a
local TCP server that implements the SERVER side of SCRAM the way a
real PostgreSQL does — from stored (salt, i, StoredKey, ServerKey),
verifying the client proof by reversing it against the auth message —
then replays the existing golden replication session, proving the
feeder reaches the CopyBoth pump through a SCRAM-demanding server.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import socketserver
import struct
import threading
from pathlib import Path

import pytest

from timescaledb_event_streamer_spark.sources import pg_auth
from timescaledb_event_streamer_spark.sources.pg_auth import (
    AuthError,
    ScramClient,
    parse_sasl_mechanisms,
    parse_scram_attrs,
    saslprep,
    startup_packet,
)
from timescaledb_event_streamer_spark.sources.pg_replication import (
    ProtocolError,
    ReplicationFeeder,
)

GOLDEN = Path(__file__).resolve().parent / "golden"

# RFC 7677 section 3 (public test vector)
RFC_USER = "user"
RFC_PASS = "pencil"
RFC_CNONCE = "rOprNGfwEbeRWgbNEkqO"
RFC_CLIENT_FIRST = "n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
RFC_SERVER_FIRST = (
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
    "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
)
RFC_CLIENT_FINAL = (
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
    "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
)
RFC_SERVER_FINAL = "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="


def test_rfc7677_client_exchange_exact():
    c = ScramClient(RFC_PASS, nonce=RFC_CNONCE, username=RFC_USER)
    assert c.client_first() == RFC_CLIENT_FIRST
    assert c.handle_server_first(RFC_SERVER_FIRST) == RFC_CLIENT_FINAL
    c.verify_server_final(RFC_SERVER_FINAL)  # must not raise


def test_rfc7677_wrong_server_signature_rejected():
    c = ScramClient(RFC_PASS, nonce=RFC_CNONCE, username=RFC_USER)
    c.handle_server_first(RFC_SERVER_FIRST)
    with pytest.raises(AuthError, match="signature mismatch"):
        c.verify_server_final("v=" + base64.b64encode(b"\x00" * 32).decode())
    with pytest.raises(AuthError, match="rejected"):
        c.verify_server_final("e=invalid-proof")


def test_server_nonce_must_extend_client_nonce():
    c = ScramClient("pw", nonce="abc")
    with pytest.raises(AuthError, match="extend"):
        c.handle_server_first("r=zzz123,s=c2FsdA==,i=4096")
    c2 = ScramClient("pw", nonce="abc")
    with pytest.raises(AuthError, match="entropy"):
        c2.handle_server_first("r=abc,s=c2FsdA==,i=4096")


def test_scram_attr_parsing():
    attrs = parse_scram_attrs("r=a%b,s=AA==,i=4096")
    assert attrs == {"r": "a%b", "s": "AA==", "i": "4096"}
    # base64 '=' padding must survive (split on FIRST '=' only)
    assert parse_scram_attrs("v=ab==")["v"] == "ab=="
    with pytest.raises(AuthError, match="malformed"):
        parse_scram_attrs("junk")


def test_saslprep():
    assert saslprep("pencil") == "pencil"
    assert saslprep("pa ss") == "pa ss"  # non-ASCII space -> space
    assert saslprep("Ⅸ") == "IX"  # NFKC compatibility mapping
    with pytest.raises(AuthError, match="prohibited"):
        saslprep("pa\x00ss")


def test_startup_packet_layout():
    pkt = startup_packet("alice", "db1", application_name="feeder")
    (length,) = struct.unpack(">I", pkt[:4])
    assert length == len(pkt)
    (proto,) = struct.unpack(">I", pkt[4:8])
    assert proto == 196608
    body = pkt[8:]
    assert body.endswith(b"\x00\x00")  # last value NUL + terminator
    pairs = body[:-1].split(b"\x00")[:-1]
    kv = dict(zip(pairs[0::2], pairs[1::2]))
    assert kv == {
        b"user": b"alice",
        b"database": b"db1",
        b"replication": b"database",
        b"application_name": b"feeder",
    }


def test_parse_sasl_mechanisms():
    assert parse_sasl_mechanisms(
        b"SCRAM-SHA-256\x00SCRAM-SHA-256-PLUS\x00\x00"
    ) == ["SCRAM-SHA-256", "SCRAM-SHA-256-PLUS"]


# ---------------------------------------------------------------------------
# end-to-end over a real socket: SCRAM server -> golden replication


def _auth_msg(authtype: int, payload: bytes = b"") -> bytes:
    body = struct.pack(">I", authtype) + payload
    return b"R" + struct.pack(">I", len(body) + 4) + body


class _ScramServer(socketserver.BaseRequestHandler):
    """Server-side SCRAM from STORED verifiers only (salt, i,
    StoredKey, ServerKey) — the shape a real PostgreSQL keeps in
    pg_authid. The client proof is verified by the server algorithm:
    ClientSignature = HMAC(StoredKey, AuthMessage); ClientKey =
    proof XOR ClientSignature; check H(ClientKey) == StoredKey. No
    reuse of the client module's code paths."""

    PASSWORD = "s3kret"
    SALT = b"0123456789abcdef"
    ITERATIONS = 4096

    def _recv_exact(self, n: int) -> bytes:
        buf = getattr(self, "_buf", b"")
        while len(buf) < n:
            chunk = self.request.recv(4096)
            if not chunk:
                raise AssertionError("client hung up")
            buf += chunk
        self._buf = buf[n:]
        return buf[:n]

    def _read_frontend(self, typed: bool):
        if typed:
            head = self._recv_exact(5)
            mtype = head[0:1]
            (length,) = struct.unpack(">I", head[1:5])
            return mtype, self._recv_exact(length - 4)
        head = self._recv_exact(4)
        (length,) = struct.unpack(">I", head)
        return None, self._recv_exact(length - 4)

    def handle(self):
        salted = hashlib.pbkdf2_hmac(
            "sha256", self.PASSWORD.encode(), self.SALT, self.ITERATIONS, dklen=32
        )
        stored_key = hashlib.sha256(
            hmac.digest(salted, b"Client Key", "sha256")
        ).digest()
        server_key = hmac.digest(salted, b"Server Key", "sha256")

        # startup packet (untyped)
        _, body = self._read_frontend(typed=False)
        assert struct.unpack(">I", body[:4])[0] == 196608
        pairs = body[4:-1].split(b"\x00")[:-1]
        kv = dict(zip(pairs[0::2], pairs[1::2]))
        assert kv[b"replication"] == b"database"
        self.server.startup_user = kv[b"user"].decode()

        # demand SASL
        self.request.sendall(
            _auth_msg(10, b"SCRAM-SHA-256\x00SCRAM-SHA-256-PLUS\x00\x00")
        )
        mtype, body = self._read_frontend(typed=True)
        assert mtype == b"p"
        mech_end = body.index(b"\x00")
        assert body[:mech_end].decode() == "SCRAM-SHA-256"
        (ilen,) = struct.unpack(">I", body[mech_end + 1 : mech_end + 5])
        client_first = body[mech_end + 5 : mech_end + 5 + ilen].decode()
        assert client_first.startswith("n,,")
        client_first_bare = client_first[3:]
        client_nonce = parse_scram_attrs(client_first_bare)["r"]

        full_nonce = client_nonce + "SERVERNONCE123"
        server_first = (
            f"r={full_nonce},"
            f"s={base64.b64encode(self.SALT).decode()},i={self.ITERATIONS}"
        )
        self.request.sendall(_auth_msg(11, server_first.encode()))

        mtype, body = self._read_frontend(typed=True)
        assert mtype == b"p"
        client_final = body.decode()
        attrs = parse_scram_attrs(client_final)
        assert attrs["r"] == full_nonce and attrs["c"] == "biws"
        without_proof = client_final[: client_final.rindex(",p=")]
        auth_message = ",".join([client_first_bare, server_first, without_proof])
        client_sig = hmac.digest(stored_key, auth_message.encode(), "sha256")
        proof = base64.b64decode(attrs["p"])
        client_key = bytes(a ^ b for a, b in zip(proof, client_sig))
        assert hashlib.sha256(client_key).digest() == stored_key, (
            "client proof invalid"
        )
        server_sig = hmac.digest(server_key, auth_message.encode(), "sha256")
        self.request.sendall(
            _auth_msg(12, b"v=" + base64.b64encode(server_sig))
        )
        self.request.sendall(_auth_msg(0))
        # ParameterStatus, BackendKeyData, ReadyForQuery
        ps = b"server_version\x0016.3\x00"
        self.request.sendall(b"S" + struct.pack(">I", len(ps) + 4) + ps)
        kd = struct.pack(">II", 4242, 7)
        self.request.sendall(b"K" + struct.pack(">I", len(kd) + 4) + kd)
        self.request.sendall(b"Z" + struct.pack(">I", 5) + b"I")

        # now the golden replication conversation
        def read_query() -> str:
            mtype, body = self._read_frontend(typed=True)
            assert mtype == b"Q"
            return body.decode().rstrip("\x00")

        assert read_query() == "IDENTIFY_SYSTEM"
        self.request.sendall((GOLDEN / "identify_system.bin").read_bytes())
        assert read_query().startswith("CREATE_REPLICATION_SLOT")
        self.request.sendall((GOLDEN / "create_slot.bin").read_bytes())
        assert read_query().startswith("START_REPLICATION SLOT")
        self.request.sendall((GOLDEN / "copy_both.bin").read_bytes())


@pytest.fixture()
def scram_server():
    srv = socketserver.TCPServer(("127.0.0.1", 0), _ScramServer)
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    yield srv
    srv.server_close()


def test_feeder_authenticates_via_scram_then_handshakes(scram_server, tmp_path):
    import socket

    host, port = scram_server.server_address
    with socket.create_connection((host, port), timeout=10) as conn:
        feeder = ReplicationFeeder(conn, landing_dir=str(tmp_path))
        session = feeder.authenticate(
            "repl_user", "postgres", password=_ScramServer.PASSWORD
        )
        assert session["auth"] == "scram-sha-256"
        assert session["parameters"]["server_version"] == "16.3"
        assert session["backend_pid"] == 4242
        # the feeder reaches the existing CopyBoth pump post-auth
        facts = feeder.handshake()
        assert facts["slot_name"] is not None
    assert scram_server.startup_user == "repl_user"


def test_feeder_wrong_password_fails_proof(tmp_path):
    """A wrong password must produce an invalid proof — the server
    asserts, the connection dies, and the feeder surfaces an error
    instead of limping on."""
    import socket

    srv = socketserver.TCPServer(("127.0.0.1", 0), _ScramServer)
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        with socket.create_connection((host, port), timeout=10) as conn:
            feeder = ReplicationFeeder(conn)
            with pytest.raises((ProtocolError, AuthError, OSError)):
                feeder.authenticate(
                    "repl_user", "postgres", password="wrong-password"
                )
    finally:
        srv.server_close()


def test_feeder_rejects_unsupported_auth(tmp_path):
    """An md5 demand (authtype 5) is refused loudly — the feeder
    never sends secrets over a method it does not implement."""

    class Md5Demand:
        def __init__(self):
            self.sent = b""
            self.reply = _auth_msg(5, b"\x01\x02\x03\x04")
            self.pos = 0

        def sendall(self, b):
            self.sent += b

        def recv(self, n):
            chunk = self.reply[self.pos : self.pos + n]
            self.pos += len(chunk)
            return chunk

    feeder = ReplicationFeeder(Md5Demand())
    with pytest.raises(ProtocolError, match="unsupported authentication"):
        feeder.authenticate("u", "db", password="pw")


def test_feeder_requires_password_for_sasl():
    class SaslDemand:
        def __init__(self):
            self.reply = _auth_msg(10, b"SCRAM-SHA-256\x00\x00")
            self.pos = 0

        def sendall(self, b):
            pass

        def recv(self, n):
            chunk = self.reply[self.pos : self.pos + n]
            self.pos += len(chunk)
            return chunk

    feeder = ReplicationFeeder(SaslDemand())
    with pytest.raises(AuthError, match="no password"):
        feeder.authenticate("u", "db")
