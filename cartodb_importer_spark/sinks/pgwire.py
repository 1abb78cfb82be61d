"""Minimal PostgreSQL v3 wire-protocol executor (driver-side DDL path).

Why this exists: the reference publishes to Postgres (importer.rb:45,
231, 367 — staging table + atomic rename + spatial index), and
``JdbcCatalog`` reproduces that protocol over JDBC. In environments that
have a PostgreSQL *server* but no org.postgresql JDBC jar on Spark's
classpath (this build container is one), the JVM cannot open the
connection — so the catalog's DDL/publish logic would stay
integration-untested. This module provides the missing transport: a
dependency-free implementation of the public PostgreSQL frontend/backend
protocol (v3, simple-query flow), enough to run DDL, catalog queries,
and bounded test-sized INSERTs.

Scope by design:

* trust / cleartext / MD5 auth (SCRAM is deliberately out — test servers
  here run ``--auth=trust``);
* the simple-query message flow (Q -> RowDescription/DataRow/
  CommandComplete/ErrorResponse -> ReadyForQuery), text result format;
* one short-lived connection per statement, mirroring
  ``JdbcCatalog._execute``'s connection discipline.

This is NOT a bulk-load path: 100 TB writes stay on ``df.write.jdbc``
(executor-parallel, batched) the moment a real driver jar is present.
Protocol reference: PostgreSQL documentation, "Frontend/Backend
Protocol" chapter (public specification).
"""

from __future__ import annotations

import hashlib
import socket
import struct


class PgError(RuntimeError):
    """Server-reported error (severity, SQLSTATE code, message)."""

    def __init__(self, fields: dict[str, str]):
        self.severity = fields.get("S", "ERROR")
        self.code = fields.get("C", "")
        self.message = fields.get("M", "")
        super().__init__(f"{self.severity} {self.code}: {self.message}")


class PgWireExecutor:
    """Executes SQL over a fresh socket per call (DDL cadence, not OLTP).

    Satisfies the executor contract ``JdbcCatalog(sql_executor=...)``
    expects: ``execute(sql)`` and ``query_strings(sql)``.
    """

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        password: str = "",
        timeout: float = 10.0,
    ):
        self.host = host
        self.port = port
        self.user = user
        self.database = database
        self.password = password
        self.timeout = timeout

    # ------------------------------------------------------------ framing

    def _send(self, sock: socket.socket, type_byte: bytes, payload: bytes):
        sock.sendall(type_byte + struct.pack("!I", len(payload) + 4) + payload)

    def _recv_exact(self, sock: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("postgres closed the connection")
            buf += chunk
        return buf

    def _read_message(self, sock: socket.socket) -> tuple[bytes, bytes]:
        head = self._recv_exact(sock, 5)
        mtype = head[:1]
        (length,) = struct.unpack("!I", head[1:5])
        return mtype, self._recv_exact(sock, length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return fields

    # ------------------------------------------------------------ session

    def _connect(self) -> socket.socket:
        sock = socket.create_connection((self.host, self.port), self.timeout)
        params = (
            b"user\x00" + self.user.encode() + b"\x00"
            b"database\x00" + self.database.encode() + b"\x00\x00"
        )
        payload = struct.pack("!I", 196608) + params  # protocol 3.0
        sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        while True:
            mtype, body = self._read_message(sock)
            if mtype == b"R":
                (auth,) = struct.unpack("!I", body[:4])
                if auth == 0:  # AuthenticationOk
                    continue
                if auth == 3:  # cleartext password
                    self._send(
                        sock, b"p", self.password.encode() + b"\x00"
                    )
                    continue
                if auth == 5:  # MD5: md5(md5(password+user)+salt)
                    salt = body[4:8]
                    inner = hashlib.md5(
                        (self.password + self.user).encode()
                    ).hexdigest()
                    digest = hashlib.md5(
                        inner.encode() + salt
                    ).hexdigest()
                    self._send(
                        sock, b"p", b"md5" + digest.encode() + b"\x00"
                    )
                    continue
                sock.close()
                raise PgError(
                    {"M": f"unsupported auth method {auth} (use trust/md5)"}
                )
            elif mtype == b"E":
                fields = self._error_fields(body)
                sock.close()
                raise PgError(fields)
            elif mtype == b"Z":  # ReadyForQuery
                return sock
            # ParameterStatus (S), BackendKeyData (K), NoticeResponse (N)
            # carry no decisions here

    # ------------------------------------------------------------ queries

    def _simple_query(self, sql: str) -> list[list[str | None]]:
        sock = self._connect()
        try:
            self._send(sock, b"Q", sql.encode() + b"\x00")
            rows: list[list[str | None]] = []
            error: dict[str, str] | None = None
            while True:
                try:
                    mtype, body = self._read_message(sock)
                except ConnectionError:
                    if error is not None:
                        # FATAL path: the backend sends ErrorResponse and
                        # closes without ReadyForQuery — surface the
                        # captured diagnostics, not the raw socket EOF
                        raise PgError(error) from None
                    raise
                if mtype == b"D":
                    (ncols,) = struct.unpack("!H", body[:2])
                    pos = 2
                    row: list[str | None] = []
                    for _ in range(ncols):
                        (ln,) = struct.unpack("!i", body[pos : pos + 4])
                        pos += 4
                        if ln == -1:
                            row.append(None)
                        else:
                            row.append(
                                body[pos : pos + ln].decode("utf-8")
                            )
                            pos += ln
                    rows.append(row)
                elif mtype == b"E":
                    error = self._error_fields(body)
                elif mtype == b"Z":
                    if error is not None:
                        raise PgError(error)
                    return rows
                # T (RowDescription), C (CommandComplete), N (Notice),
                # S (ParameterStatus), I (EmptyQueryResponse): no action
        finally:
            sock.close()

    def execute(self, sql: str) -> None:
        self._simple_query(sql)

    def query_strings(self, sql: str) -> list[str]:
        return [r[0] for r in self._simple_query(sql) if r and r[0] is not None]

    def query_rows(self, sql: str) -> list[list[str | None]]:
        """Full result rows in the text wire format (None for NULL)."""
        return self._simple_query(sql)

    # ------------------------------------------------------------- COPY

    @staticmethod
    def copy_escape(v: str) -> str:
        """Escape one value for the COPY text format."""
        return (
            v.replace("\\", "\\\\")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )

    def copy_in(self, sql: str, lines: list[str]) -> None:
        """COPY ... FROM STDIN with pre-escaped text-format lines
        (tab-separated columns, ``\\N`` for NULL, no trailing newline per
        line) — the protocol the reference's loader (ogr2ogr -> COPY)
        actually used, and ~10x the throughput of batched INSERTs on
        this transport."""
        sock = self._connect()
        try:
            self._send(sock, b"Q", sql.encode() + b"\x00")
            error: dict[str, str] | None = None
            sent = False
            while True:
                try:
                    mtype, body = self._read_message(sock)
                except ConnectionError:
                    if error is not None:
                        raise PgError(error) from None
                    raise
                if mtype == b"G":  # CopyInResponse
                    payload = ("".join(f"{ln}\n" for ln in lines)).encode()
                    self._send(sock, b"d", payload)
                    self._send(sock, b"c", b"")  # CopyDone
                    sent = True
                elif mtype == b"E":
                    error = self._error_fields(body)
                    if not sent:
                        # server aborted before CopyIn began; it still
                        # sends ReadyForQuery next
                        sent = True
                elif mtype == b"Z":
                    if error is not None:
                        raise PgError(error)
                    return
        finally:
            sock.close()
