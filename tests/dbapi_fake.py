"""A behavioral PEP-249 (DB-API 2.0) fake of a MySQL driver
connection — drives DbApiExecutor (the REAL live adapter in
sinks/mysql_sink.py) the way pymysql would, so the whole applier path
including paramstyle conversion, errno normalization, and tx framing
is exercised without a server.

Modeled semantics:

- ``format`` paramstyle: parameterized SQL must arrive with ``%s``
  placeholders and a matching arg tuple — a leftover ``?`` in a
  parameterized statement raises (the driver would send it to the
  server verbatim and fail there; here it fails loudly at the fake).
- driver-shaped errors: failures raise an exception whose
  ``args[0]`` is the MySQL errno (pymysql.err.* shape), which
  DbApiExecutor must normalize to MySQLError for the sink's
  A12/A13 policy.
- transaction visibility: executed statements buffer in the open
  transaction; ``commit()`` appends them to the durable log,
  ``rollback()`` discards them — so tests assert what a MySQL server
  would have DURABLY applied, not what was merely sent.
- cursors are real objects that must be closed; ``closed_cursors``
  counts leaks.
"""

from __future__ import annotations


class FakeDriverError(Exception):
    """pymysql.err.MySQLError shape: args = (errno, message)."""


class FakeCursor:
    def __init__(self, conn: "FakeDbApiConnection"):
        self._conn = conn
        self.closed = False

    def execute(self, sql: str, params=None) -> None:
        if self.closed:
            raise FakeDriverError(2014, "cursor already closed")
        self._conn._execute(sql, params)

    def close(self) -> None:
        self.closed = True
        self._conn.closed_cursors += 1


class FakeDbApiConnection:
    """One 'server session': a durable statement log plus an open-tx
    buffer, with scriptable per-statement failures."""

    def __init__(self):
        self.durable: list[tuple[str, tuple | None]] = []
        self.tx: list[tuple[str, tuple | None]] = []
        self.in_tx = False
        self.closed_cursors = 0
        self.cursors_opened = 0
        self._fail_when = []  # (predicate(sql), errno, once)

    # -- scripting ---------------------------------------------------------

    def fail_matching(self, needle: str, errno: int, once: bool = True):
        self._fail_when.append([needle, errno, once])

    # -- PEP-249 surface -----------------------------------------------------

    def cursor(self) -> FakeCursor:
        self.cursors_opened += 1
        return FakeCursor(self)

    def commit(self) -> None:
        self.durable.extend(self.tx)
        self.tx = []
        self.in_tx = False

    def rollback(self) -> None:
        self.tx = []
        self.in_tx = False

    # -- execution ----------------------------------------------------------

    def _execute(self, sql: str, params) -> None:
        for rule in list(self._fail_when):
            needle, errno, once = rule
            if needle in sql:
                if once:
                    self._fail_when.remove(rule)
                raise FakeDriverError(errno, f"injected for {needle!r}")
        if params is not None:
            n = sql.count("%s")
            if "?" in sql:
                raise FakeDriverError(
                    1064, "syntax error: '?' placeholder reached the "
                    "driver (MySQL drivers use %s)"
                )
            if n != len(params):
                raise FakeDriverError(
                    1064, f"placeholder/arg mismatch: {n} vs {len(params)}"
                )
        if sql.strip().upper() == "BEGIN":
            if self.in_tx:
                # MySQL: BEGIN implicitly commits the open tx; the
                # sink must never rely on that — fail loud instead
                raise FakeDriverError(1064, "BEGIN inside an open tx")
            self.in_tx = True
            return
        target = self.tx if self.in_tx else self.durable
        target.append((sql, tuple(params) if params is not None else None))
