"""Self-provisioning live PostgreSQL for the ``-m live`` tests.

The sandbox ships PostgreSQL 15 binaries (``/usr/lib/postgresql/15``) but no
running server. This module turns the live-pg tests from
skipped-by-default into actually-running: ``ensure_running()`` starts (or
reuses) a throwaway logical-replication-enabled cluster under /tmp and
exports ``LIBRARIAN_LIVE_PG_DSN`` so ``tests/test_live.py`` dials a REAL
walsender. Degrades to None (→ skip, the old behavior) when the binaries
are missing, we aren't root (postgres refuses root, so the server runs via
``su postgres``), or startup fails for any reason.

The cluster intentionally mirrors a production replication source:
``wal_level=logical``, host auth scram-sha-256 (exercising the client's
RFC 7677 SCRAM path against a real server), a publication, and a table
with a primary key (REPLICA IDENTITY DEFAULT → delete images carry the
key only, which the live E2E test asserts).
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess

PGBIN = "/usr/lib/postgresql/15/bin"
PGDATA = "/tmp/librarian_live_pgdata"
PORT = 55432
DSN = f"127.0.0.1:{PORT}"

_SCHEMA_SQL = """
CREATE TABLE IF NOT EXISTS live_test(
  id int primary key, name text, ts timestamptz default now());
SELECT 'CREATE PUBLICATION librarian_pub FOR TABLE live_test'
WHERE NOT EXISTS (SELECT 1 FROM pg_publication WHERE pubname = 'librarian_pub')
\\gexec
"""


def _su(cmd: str, stdin: str | None = None) -> subprocess.CompletedProcess:
    # run as the postgres user from /tmp (root's cwd is unreadable to it);
    # SQL travels via stdin — inlining it in bash -c mangles $$ into the PID
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        cwd="/tmp",
        input=stdin,
        capture_output=True,
        text=True,
        timeout=60,
    )


def _listening() -> bool:
    try:
        with socket.create_connection(("127.0.0.1", PORT), timeout=1):
            return True
    except OSError:
        return False


def _psql_tcp(sql: str) -> subprocess.CompletedProcess | None:
    """Run SQL over TCP as the postgres superuser (scram credentials)."""
    if not os.path.exists(f"{PGBIN}/psql"):
        return None
    try:
        return subprocess.run(
            [f"{PGBIN}/psql", "-h", "127.0.0.1", "-p", str(PORT),
             "-U", "postgres", "-v", "ON_ERROR_STOP=1", "-f", "-"],
            input=sql,
            capture_output=True,
            text=True,
            timeout=60,
            env={**os.environ, "PGPASSWORD": "postgres"},
        )
    except (OSError, subprocess.TimeoutExpired):
        return None


def _ensure_ssl() -> None:
    """Best-effort: turn ssl=on with a self-signed cert. ``ssl`` is a
    sighup-context GUC since PG 10, so a reload (no restart) suffices —
    the running cluster gains TLS in place. The TLS live test skips when
    this fails (server answers 'N' to SSLRequest)."""
    crt, key = f"{PGDATA}/server.crt", f"{PGDATA}/server.key"
    san_marker = f"{PGDATA}/.cert_has_san"  # v2: cert carries an IP SAN
    try:
        if not os.path.exists(crt) or not os.path.exists(san_marker):
            # the IP subjectAltName is what lets sslmode=verify-full pass:
            # Python's default context ignores CN for hostname matching
            r = subprocess.run(
                ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
                 "-keyout", key, "-out", crt, "-days", "2",
                 "-subj", "/CN=127.0.0.1",
                 "-addext", "subjectAltName=IP:127.0.0.1"],
                capture_output=True, text=True, timeout=60,
            )
            if r.returncode != 0:
                return
            shutil.chown(crt, "postgres", "postgres")
            shutil.chown(key, "postgres", "postgres")
            os.chmod(key, 0o600)
            with open(san_marker, "w", encoding="utf-8") as fh:
                fh.write("")
        _psql_tcp("ALTER SYSTEM SET ssl = on;\nSELECT pg_reload_conf();")
    except Exception:  # noqa: BLE001 — ssl is additive; its test skips
        return


def _probe_schema() -> bool:
    """Verify a listener on PORT is OUR provisioned cluster (not a stale or
    foreign process) by running the idempotent schema SQL over TCP — it
    re-creates live_test/librarian_pub if missing and fails cleanly on
    anything that is not a postgres superuser accepting our credentials."""
    r = _psql_tcp(_SCHEMA_SQL)
    return r is not None and r.returncode == 0


def ensure_running() -> str | None:
    """Return a live pg DSN, provisioning a local server if needed."""
    if os.environ.get("LIBRARIAN_LIVE_PG_DSN"):
        return os.environ["LIBRARIAN_LIVE_PG_DSN"]
    if _listening():  # a previous run's server — reuse ONLY if it answers
        # as ours (schema probe); a foreign listener would otherwise turn
        # every live test into a confusing auth/catalog failure
        if _probe_schema():
            _ensure_ssl()
            os.environ["LIBRARIAN_LIVE_PG_DSN"] = DSN
            return DSN
        return None
    if not os.path.exists(f"{PGBIN}/pg_ctl") or os.geteuid() != 0:
        return None
    try:
        if not os.path.isdir(os.path.join(PGDATA, "base")):
            shutil.rmtree(PGDATA, ignore_errors=True)
            os.makedirs(PGDATA)
            shutil.chown(PGDATA, "postgres", "postgres")
            r = _su(
                f"{PGBIN}/initdb -D {PGDATA} -U postgres "
                "--auth-host=scram-sha-256 --auth-local=trust "
                "--pwfile=<(echo postgres)"
            )
            if r.returncode != 0:
                shutil.rmtree(PGDATA, ignore_errors=True)
                return None
            with open(f"{PGDATA}/postgresql.conf", "a", encoding="utf-8") as fh:
                fh.write(
                    "\nwal_level = logical\n"
                    "listen_addresses = '127.0.0.1'\n"
                    f"port = {PORT}\n"
                    f"unix_socket_directories = '{PGDATA}'\n"
                )
            with open(f"{PGDATA}/pg_hba.conf", "w", encoding="utf-8") as fh:
                fh.write(
                    "host all all 127.0.0.1/32 scram-sha-256\n"
                    "host replication all 127.0.0.1/32 scram-sha-256\n"
                    "local all all trust\n"
                    "local replication all trust\n"
                )
            shutil.chown(f"{PGDATA}/pg_hba.conf", "postgres", "postgres")
        r = _su(f"{PGBIN}/pg_ctl -D {PGDATA} -l {PGDATA}/server.log -w start")
        if r.returncode != 0 and not _listening():
            return None
        r = _su(
            f"{PGBIN}/psql -h {PGDATA} -p {PORT} -U postgres "
            "-v ON_ERROR_STOP=1 -f -",
            stdin=_SCHEMA_SQL,
        )
        if r.returncode != 0:
            return None
        _ensure_ssl()
        os.environ["LIBRARIAN_LIVE_PG_DSN"] = DSN
        return DSN
    except Exception:  # noqa: BLE001 — provisioning is best-effort; skip beats error
        return None
