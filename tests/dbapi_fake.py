"""A behavioral PEP-249 (DB-API 2.0) fake of a MySQL driver
connection — drives DbApiExecutor (the REAL live adapter in
sinks/mysql_sink.py) the way pymysql would, so the whole applier path
including paramstyle conversion, errno normalization, and tx framing
is exercised without a server.

Modeled semantics:

- ``format`` paramstyle: parameterized SQL must arrive with ``%s``
  placeholders and a matching arg tuple. Placeholders are counted the
  way the driver's %-interpolation would see them (``%%`` is a literal
  percent, any other ``%<x>`` raises), and a leftover UNQUOTED ``?``
  raises (the driver would send it to the server verbatim and fail
  there; here it fails loudly at the fake) — while a ``?`` inside a
  quoted string/identifier is legal SQL and passes, exactly what a
  real server accepts.
- driver-shaped errors: failures raise FakeDriverError, rooted at a
  class NAMED ``MySQLError`` like pymysql.err's hierarchy root, whose
  ``args[0]`` is the MySQL errno — DbApiExecutor must normalize it
  (and must NOT normalize OS-level exceptions) for the sink's
  A12/A13 policy.
- transaction visibility: executed statements buffer in the open
  transaction; ``commit()`` appends them to the durable log,
  ``rollback()`` discards them — so tests assert what a MySQL server
  would have DURABLY applied, not what was merely sent.
- cursors are real objects that must be closed; ``closed_cursors``
  counts leaks.
"""

from __future__ import annotations


class MySQLError(Exception):
    """Analog of pymysql.err.MySQLError — the driver-hierarchy ROOT.
    Distinct from the sink's own MySQLError class, like the real
    driver's is; the executor recognizes it structurally (PEP-249
    taxonomy name), never by import."""


class FakeDriverError(MySQLError):
    """pymysql.err shape: args = (errno, message)."""


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

    @staticmethod
    def _count_placeholders(sql: str) -> int:
        """Count %s placeholders the way the driver's %-interpolation
        would: %% is a literal percent, any other %<x> is unsupported
        format syntax (the driver would raise), and an UNQUOTED ? is a
        qmark placeholder that never got converted — both loud. A ?
        inside a quoted string/identifier is plain SQL and passes.
        Independent scanner, deliberately NOT the executor's own
        rewrite helper — the fake must catch the executor lying."""
        n = 0
        quote = None
        i, ln = 0, len(sql)
        while i < ln:
            ch = sql[i]
            # %-interpolation is QUOTE-UNAWARE (it's plain string
            # formatting): check directives everywhere, even inside
            # SQL string literals — a real driver would choke on an
            # undoubled literal % no matter where it sits
            if ch == "%":
                nxt = sql[i + 1] if i + 1 < ln else ""
                if nxt == "s":
                    n += 1
                elif nxt != "%":
                    raise FakeDriverError(
                        1064, f"unsupported format directive %{nxt!r} "
                        "(literal % must arrive doubled)"
                    )
                i += 2
                continue
            if quote:
                if ch == "\\" and quote in ("'", '"'):
                    i += 2
                    continue
                if ch == quote and i + 1 < ln and sql[i + 1] == quote:
                    i += 2
                    continue
                if ch == quote:
                    quote = None
                i += 1
                continue
            if ch in ("'", '"', "`"):
                quote = ch
            elif ch == "?":
                # the SERVER-side rule, so quote-aware: a quoted '?'
                # is data, an unquoted one is a qmark placeholder the
                # adapter failed to convert
                raise FakeDriverError(
                    1064, "syntax error: unquoted '?' placeholder "
                    "reached the driver (MySQL drivers use %s)"
                )
            i += 1
        return n

    def _execute(self, sql: str, params) -> None:
        for rule in list(self._fail_when):
            needle, errno, once = rule
            if needle in sql:
                if once:
                    self._fail_when.remove(rule)
                raise FakeDriverError(errno, f"injected for {needle!r}")
        if params is not None:
            n = self._count_placeholders(sql)
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
