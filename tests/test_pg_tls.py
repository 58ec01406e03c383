"""TLS negotiation for the replication feeder (H14): the pre-startup
SSLRequest dance + stdlib TLS wrap, driven end-to-end against a local
TLS server that runs the SAME stored-verifier SCRAM exchange over the
encrypted channel — SCRAM-over-TLS is exactly what a production
`sslmode=require` PostgreSQL demands."""

from __future__ import annotations

import socket
import socketserver
import ssl
import struct
import subprocess
import threading

import pytest

from tests.test_pg_auth import _ScramServer
from timescaledb_event_streamer_spark.sources.pg_replication import (
    SSL_REQUEST_CODE,
    ProtocolError,
    ReplicationFeeder,
    negotiate_tls,
)


@pytest.fixture(scope="module")
def certpair(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    key, cert = d / "key.pem", d / "cert.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", str(key), "-out", str(cert),
            "-days", "1", "-nodes", "-subj", "/CN=localhost",
        ],
        check=True,
        capture_output=True,
    )
    return str(key), str(cert)


class _TlsScramServer(_ScramServer):
    """SSLRequest -> 'S' -> server-side TLS wrap -> the stock SCRAM
    exchange over the encrypted channel."""

    def handle(self):
        head = b""
        while len(head) < 8:
            chunk = self.request.recv(8 - len(head))
            assert chunk, "client hung up before SSLRequest"
            head += chunk
        length, code = struct.unpack(">II", head)
        assert (length, code) == (8, SSL_REQUEST_CODE)
        self.request.sendall(b"S")
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(self.server.cert, self.server.key)
        self.request = ctx.wrap_socket(self.request, server_side=True)
        try:
            super().handle()
        finally:
            self.request.close()


class _QuietTCPServer(socketserver.TCPServer):
    """Clients that deliberately abort the TLS handshake (the
    verify-rejects-self-signed test) kill the handler with an SSL
    error — expected, keep it off the pytest stream."""

    def handle_error(self, request, client_address):
        pass


@pytest.fixture()
def tls_scram_server(certpair):
    key, cert = certpair
    srv = _QuietTCPServer(("127.0.0.1", 0), _TlsScramServer)
    srv.key, srv.cert = key, cert
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    yield srv
    srv.server_close()


def test_feeder_scram_over_tls_end_to_end(tls_scram_server, tmp_path):
    host, port = tls_scram_server.server_address
    with socket.create_connection((host, port), timeout=10) as raw:
        conn = negotiate_tls(
            raw, "require", server_hostname="localhost", verify=False
        )
        assert isinstance(conn, ssl.SSLSocket)
        feeder = ReplicationFeeder(conn, landing_dir=str(tmp_path))
        session = feeder.authenticate(
            "repl_user", "postgres", password=_ScramServer.PASSWORD
        )
        assert session["auth"] == "scram-sha-256"
        facts = feeder.handshake()
        assert facts["slot_name"] is not None
    assert tls_scram_server.startup_user == "repl_user"


def test_verifying_context_accepts_own_ca(tls_scram_server, certpair):
    """verify-ca behavior: a context that trusts the server cert
    completes the handshake with verification ON."""
    key, cert = certpair
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cert)
    ctx.check_hostname = True
    host, port = tls_scram_server.server_address
    with socket.create_connection((host, port), timeout=10) as raw:
        conn = negotiate_tls(
            raw, "require", context=ctx, server_hostname="localhost"
        )
        assert conn.getpeercert() is not None
        feeder = ReplicationFeeder(conn)
        session = feeder.authenticate(
            "repl_user", "postgres", password=_ScramServer.PASSWORD
        )
        assert session["auth"] == "scram-sha-256"


def test_default_verify_rejects_self_signed(tls_scram_server):
    """The secure-by-default contract: with no caller context and no
    explicit verify=False, negotiate_tls authenticates the server
    (system CA bundle + hostname), so a self-signed cert FAILS the
    handshake instead of silently encrypting to an unauthenticated
    peer."""
    host, port = tls_scram_server.server_address
    with socket.create_connection((host, port), timeout=10) as raw:
        with pytest.raises(ssl.SSLCertVerificationError):
            negotiate_tls(raw, "require", server_hostname="localhost")


class _RefusingServer(socketserver.BaseRequestHandler):
    def handle(self):
        head = self.request.recv(8)
        assert struct.unpack(">II", head) == (8, SSL_REQUEST_CODE)
        self.request.sendall(b"N")
        # keep the connection open long enough for the client to act
        self.request.recv(1)


@pytest.fixture()
def refusing_server():
    srv = socketserver.TCPServer(("127.0.0.1", 0), _RefusingServer)
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    yield srv
    srv.server_close()


def test_require_rejects_tls_refusal(refusing_server):
    host, port = refusing_server.server_address
    with socket.create_connection((host, port), timeout=10) as raw:
        with pytest.raises(ProtocolError, match="refused TLS"):
            negotiate_tls(raw, "require")


def test_prefer_continues_plain_on_refusal(refusing_server):
    host, port = refusing_server.server_address
    with socket.create_connection((host, port), timeout=10) as raw:
        conn = negotiate_tls(raw, "prefer")
        assert conn is raw  # untouched cleartext socket


def test_disable_sends_nothing():
    class Recorder:
        sent = b""

        def sendall(self, b):
            self.sent += b

    r = Recorder()
    assert negotiate_tls(r, "disable") is r
    assert r.sent == b""
    with pytest.raises(ValueError, match="sslmode"):
        negotiate_tls(r, "verify-full-typo")
