"""Sink-side TLS (r10) — the counterpart of the reference's
`tls.Config{InsecureSkipVerify, ClientAuth}` blocks on its Kafka
(kafka.go:67-78), Redis (redis.go:86-95) and HTTP sinks
(constants.go:72-74, 98-99, 124-125).

Unlike the PostgreSQL source (STARTTLS via SSLRequest,
sources/pg_replication.py::negotiate_tls), broker sinks speak TLS
from byte 0 on a dedicated port — so this is one wrap, no
negotiation preamble. NATS is the exception: its handshake starts in
cleartext, the server's INFO advertises `tls_required`, and the
client upgrades BEFORE sending CONNECT — the nats.go `secure` path.
Both shapes share this context builder.

Verification defaults ON (system CA bundle + hostname check); pass
``skip_verify=True`` to get the reference's ``InsecureSkipVerify``
(encrypt, do NOT authenticate — must be asked for explicitly), or a
``cafile`` for a private CA. ``certfile``/``keyfile`` enable mutual
TLS (the reference's ClientAuth option).
"""

from __future__ import annotations

import socket
import ssl


def sink_tls_context(
    *,
    skip_verify: bool = False,
    cafile: str | None = None,
    certfile: str | None = None,
    keyfile: str | None = None,
) -> ssl.SSLContext:
    if skip_verify:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    else:
        ctx = ssl.create_default_context(cafile=cafile)
    if certfile:
        ctx.load_cert_chain(certfile, keyfile)
    return ctx


def wrap_sink_tls(
    sock: socket.socket,
    host: str,
    *,
    context: ssl.SSLContext | None = None,
    skip_verify: bool = False,
    cafile: str | None = None,
    certfile: str | None = None,
    keyfile: str | None = None,
) -> ssl.SSLSocket:
    """TLS-wrap a freshly connected sink socket (client side)."""
    ctx = context or sink_tls_context(
        skip_verify=skip_verify,
        cafile=cafile,
        certfile=certfile,
        keyfile=keyfile,
    )
    return ctx.wrap_socket(sock, server_hostname=host)
