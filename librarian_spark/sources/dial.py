"""Real-socket dialing for the three wire clients (PG / Mongo / Kafka).

Every wire client in this package is transport-agnostic: it speaks its
public protocol over whatever connected socket it is handed (tests hand it
a socketpair to an in-process mock). This module is the LIVE half: turn a
``host:port`` DSN into a connected TCP socket, and read the conventional
environment variables that gate live integration:

    LIBRARIAN_LIVE_PG_DSN     e.g. ``localhost:5432``
    LIBRARIAN_LIVE_MONGO_DSN  e.g. ``localhost:27017``
    LIBRARIAN_LIVE_KAFKA_DSN  e.g. ``localhost:9092``

The sandbox this engine is built in has no live services (evidence in
SURVEY §2A #23), so nothing in the default test suite dials out; the
``live``-marked tests skip unless the matching env var is set. Switching a
client from mock to live is a constructor call, not a refactor:

    ReplicationSlotClient.dial("pg:5432", slot="s", publication="p", ...)

TLS: postgres connections upgrade via the protocol-level SSLRequest dance
(:func:`..pgrepl_client.start_tls` — sslmode require / verify-full),
proven live against the auto-provisioned ssl=on cluster. Kafka/Mongo TLS
remains unimplemented (those services have no live instance to build it
against honestly; their cleartext wire clients are mock-verified).
"""

from __future__ import annotations

import os
import socket

__all__ = ["dial", "host_of", "live_dsn"]

_ENV_PREFIX = "LIBRARIAN_LIVE_"


def _split_host_port(dsn: str) -> tuple[str, str]:
    """``host:port`` / ``[v6-literal]:port`` -> (host, port-string). The
    single bracket-aware parse both :func:`dial` and TLS SNI derivation
    use — a naive ``rsplit(':', 1)`` turns a bare ``::1`` into host ``:``."""
    if dsn.startswith("["):  # [v6-literal]:port
        host, _, port = dsn.rpartition(":")
        host = host.strip("[]")
    else:
        host, _, port = dsn.rpartition(":")
    return host, port


def host_of(dsn: str) -> str:
    """The hostname part of a DSN, bracket-aware — what TLS SNI /
    verify-full hostname checks must use."""
    host, _ = _split_host_port(dsn)
    return host


def dial(dsn: str, timeout: float = 10.0) -> socket.socket:
    """``host:port`` -> connected TCP socket (TCP_NODELAY, blocking with the
    given timeout). IPv6 literals use ``[::1]:9092`` bracket form."""
    host, port = _split_host_port(dsn)
    if not host or not port.isdigit():
        raise ValueError(f"DSN must be host:port, got {dsn!r}")
    sock = socket.create_connection((host, int(port)), timeout=timeout)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return sock


def live_dsn(service: str) -> str | None:
    """The live DSN for ``service`` in {"pg", "mongo", "kafka"} from the
    environment, or None when live integration is not configured."""
    return os.environ.get(_ENV_PREFIX + service.upper() + "_DSN") or None
