"""MySQL applier sink: drains the golden-tested DML builder through a
pluggable executor — completing K1 end-to-end with the live JDBC/driver
connection as the ONE remaining seam.

The reference executes built statements transaction-by-transaction
(driver/mysql/applier_incr.go:532-860 ApplyBinlogEvent): optional
``set gtid_next``, ``begin`` (skipped for one-stmt DDL — MySQL DDL
auto-commits), per-event DML through the builder with prepared
statements, then the applied-gtid bookkeeping row into
``dtle.gtid_executed_v4`` (prepared at applier_incr.go:154-157:
``replace into dtle.gtid_executed_v4 (job_name,source_uuid,gtid,
gtid_set) values (?, ?, ?, null)``) and ``commit`` — position and data
land in ONE destination transaction (the A6/A10 contract). Ignorable
errors (IgnoreError, driver/mysql/sql/errcode.go:897-913) warn and
continue; deadlocks/lock-timeouts retry the whole tx (A13).

This module reproduces that statement flow against any executor obeying
a 4-method protocol (``begin/execute/commit/rollback``).
:class:`DbApiExecutor` is the live adapter: any PEP-249 MySQL
connection (pymysql/mysql-connector) plugs in — paramstyle conversion,
driver-errno normalization, and tx framing included — leaving only the
client library itself absent from this container. The tests drive the
SAME adapter over a behavioral DB-API fake (tests/dbapi_fake.py:
cursors, format paramstyle, driver-shaped exceptions, commit/rollback
visibility), so everything between "binlog entry" and "wire bytes",
including the adapter, is exercised.
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass, field
from typing import Callable, Protocol

from dtle_spark.sinks.mysql_dml import Column, escape_name, statements_for_changes
from dtle_spark.sources.gtid import GtidSet

DTLE_SCHEMA = "dtle"
GTID_TABLE = "gtid_executed_v4"
JOB_NAME_LEN_LIMIT = 64

# IgnoreError set (errcode.go:903-909): DML/DDL errors the applier
# tolerates — schema drift and duplicate effects of at-least-once
# delivery, never data corruption.
IGNORABLE_ERRNOS = frozenset(
    {1007, 1049, 1008, 1050, 1146, 1051, 1060, 1054, 1061,
     1831, 1091, 1022, 1062, 1032, 1787}
)
# tx-level retry set (A13): deadlock victim / lock wait timeout
RETRYABLE_ERRNOS = frozenset({1213, 1205})


class MySQLError(Exception):
    """Executor-raised error carrying the MySQL errno (the fake and any
    real adapter normalize driver exceptions to this)."""

    def __init__(self, errno: int, msg: str = ""):
        super().__init__(f"({errno}) {msg}")
        self.errno = errno


class Executor(Protocol):
    def begin(self) -> None: ...
    def execute(self, sql: str, args: list) -> None: ...
    def commit(self) -> None: ...
    def rollback(self) -> None: ...


def create_gtid_table_sql(
    dtle_schema: str = DTLE_SCHEMA, gtid_table: str = GTID_TABLE
) -> list[str]:
    """The bookkeeping-table bootstrap (createTableGtidExecutedV4,
    applier_gtid_executed.go:17-25 + createTableGtidExecutedV4Query)."""
    return [
        f"CREATE SCHEMA IF NOT EXISTS {escape_name(dtle_schema)}",
        (
            f"CREATE TABLE IF NOT EXISTS {escape_name(dtle_schema)}."
            f"{escape_name(gtid_table)} (\n"
            f"job_name varchar({JOB_NAME_LEN_LIMIT}) NOT NULL,\n"
            "source_uuid binary(16) NOT NULL "
            "COMMENT 'uuid of the source where the transaction was originally executed.',\n"
            "gtid bigint NOT NULL COMMENT 'single TX. 0 means the row is for gtid_set',\n"
            "gtid_set longtext NULL COMMENT 'Meanful when gtid=0. Summary of all GTIDs',\n"
            "primary key (job_name, source_uuid, gtid))"
        ),
    ]


@dataclass
class TableSpec:
    """Destination-side table metadata the builder needs."""

    columns: list[Column]
    column_map_to: list[str] = field(default_factory=list)


class MySQLApplierSink:
    """Transaction-atomic statement drain (the applier_incr.go loop).

    ``apply_tx(sid, gno, changes)`` executes one source transaction:

    1. A10 idempotence — a (sid, gno) already in the applied set is a
       silent no-op (redelivery after crash replays harmlessly).
    2. ``begin`` (skipped when the tx is a single DDL statement, which
       MySQL auto-commits — applier_incr.go:565).
    3. DML changes run through :func:`statements_for_changes` in
       contiguous same-table runs (preserving the multi-row REPLACE
       batching AND the cross-table event order inside the tx); DDL
       changes execute their query text directly, with
       ``CREATE SCHEMA IF NOT EXISTS`` / ``USE`` preambles as flagged.
    4. the gtid bookkeeping REPLACE (position lands in the same tx).
    5. ``commit``; the in-memory applied set advances only on success.

    Ignorable statement errors warn-and-continue (A12); deadlock /
    lock-timeout rolls the tx back and retries up to ``retries`` times
    (A13); any other error rolls back and raises.

    Change dict shape (the wire form the pipeline produces):
    ``{"op": "i"|"u"|"d", "schema_name", "table_name",
    "before": [...], "after": [...]}`` or
    ``{"op": "ddl", "schema_name", "table_name", "query": "..."}``.
    """

    def __init__(
        self,
        executor: Executor,
        job_name: str,
        tables: dict[tuple[str, str], TableSpec],
        dtle_schema: str = DTLE_SCHEMA,
        gtid_table: str = GTID_TABLE,
        skip_gtid_executed_table: bool = False,
        set_gtid_next: bool = False,
        retries: int = 5,
        on_warn: Callable[[str], None] | None = None,
    ):
        if len(job_name) > JOB_NAME_LEN_LIMIT:
            raise ValueError(f"job_name exceeds {JOB_NAME_LEN_LIMIT} chars")
        self.executor = executor
        self.job_name = job_name
        self.tables = tables
        self.dtle_schema = dtle_schema
        self.gtid_table = gtid_table
        self.skip_gtid_executed_table = skip_gtid_executed_table
        self.set_gtid_next = set_gtid_next
        self.retries = retries
        self.on_warn = on_warn or (lambda msg: None)
        self.applied = GtidSet()
        self._gtid_insert_sql = (
            f"replace into {escape_name(dtle_schema)}.{escape_name(gtid_table)} "
            "(job_name,source_uuid,gtid,gtid_set) values (?, ?, ?, null)"
        )

    # -- bootstrap ---------------------------------------------------------

    def ensure_gtid_table(self) -> None:
        for sql in create_gtid_table_sql(self.dtle_schema, self.gtid_table):
            self._exec_tolerant(sql, [])

    def seed_applied(self, gtid_set: GtidSet) -> None:
        """SelectAllGtidExecuted analogue: start from the destination's
        recorded position (the caller reads gtid_executed_v4 rows — or
        the checkpoint-adjacent JSON — into a GtidSet)."""
        self.applied.union(gtid_set)

    # -- per-transaction apply ---------------------------------------------

    def apply_tx(self, sid: str, gno: int, changes: list[dict]) -> bool:
        """Apply one source transaction; returns False when skipped by
        the idempotence check, True when committed."""
        sid = str(_uuid.UUID(sid))  # canonicalize
        if self.applied.contains(sid, gno):
            return False
        attempt = 0
        while True:
            try:
                self._apply_tx_once(sid, gno, changes)
                break
            except MySQLError as e:
                self.executor.rollback()
                if e.errno in RETRYABLE_ERRNOS and attempt < self.retries:
                    attempt += 1
                    self.on_warn(f"retryable ({e.errno}), attempt {attempt}")
                    continue
                raise
            except Exception:
                self.executor.rollback()
                raise
        self.applied.add(sid, gno)
        return True

    def _apply_tx_once(self, sid: str, gno: int, changes: list[dict]) -> None:
        one_stmt_ddl = len(changes) == 1 and changes[0]["op"] == "ddl"
        if self.set_gtid_next:
            # destination preserves the source GTID (applier_incr.go:
            # 546-548); must run before `begin` — gtid_next cannot be
            # set inside an ongoing transaction
            self.executor.execute(
                f"set gtid_next = '{sid}:{gno}' /*dtle*/", []
            )
        if not one_stmt_ddl:
            self.executor.begin()
        for schema_name, table_name, run in _contiguous_runs(changes):
            if run[0]["op"] == "ddl":
                for ch in run:
                    if ch.get("create_schema_if_not_exists"):
                        self._exec_tolerant(
                            f"CREATE SCHEMA IF NOT EXISTS {escape_name(schema_name)}",
                            [],
                        )
                    if ch.get("current_schema"):
                        self._exec_tolerant(
                            f"USE {escape_name(ch['current_schema'])}", []
                        )
                    self._exec_tolerant(ch["query"], [])
                continue
            spec = self.tables.get((schema_name, table_name))
            if spec is None:
                raise KeyError(f"no TableSpec for {schema_name}.{table_name}")
            for sql, args in statements_for_changes(
                schema_name, table_name, spec.columns, run, spec.column_map_to
            ):
                self._exec_tolerant(sql, args)
        if one_stmt_ddl and self.set_gtid_next:
            # the auto-committed DDL already CONSUMED the pinned GTID;
            # real MySQL rejects any further statement under the same
            # gtid_next (ER 1837), so restore BEFORE the bookkeeping
            # REPLACE (applier_incr.go:815-819 does exactly this)
            self.executor.execute("set gtid_next = 'automatic' /*dtle*/", [])
        if not self.skip_gtid_executed_table:
            self.executor.execute(
                self._gtid_insert_sql,
                [self.job_name, _uuid.UUID(sid).bytes, gno],
            )
        self.executor.commit()
        if self.set_gtid_next and not one_stmt_ddl:
            # restore after the tx commits (SetGtidNextAutomatic,
            # sqlutils.go:133-136 — byte-identical statement)
            self.executor.execute("set gtid_next = 'automatic' /*dtle*/", [])

    def apply_batch(self, txs: list[tuple[str, int, list[dict]]]) -> int:
        """Apply transactions in order; returns how many committed (vs
        skipped as already-applied)."""
        return sum(self.apply_tx(sid, gno, chs) for sid, gno, chs in txs)

    # -- internals ---------------------------------------------------------

    def _exec_tolerant(self, sql: str, args: list) -> None:
        try:
            self.executor.execute(sql, args)
        except MySQLError as e:
            if e.errno in IGNORABLE_ERRNOS:
                self.on_warn(f"ignored ({e.errno}): {sql[:60]}")
                return
            raise


def _contiguous_runs(changes: list[dict]):
    """Group event-ordered changes into contiguous same-(table, kind)
    runs so REPLACE batching applies within a run while the tx's
    cross-table statement order is preserved."""
    run: list[dict] = []
    key: tuple[str, str, bool] | None = None
    for ch in changes:
        k = (ch["schema_name"], ch["table_name"], ch["op"] == "ddl")
        if key is not None and k != key:
            yield key[0], key[1], run
            run = []
        key = k
        run.append(ch)
    if run:
        yield key[0], key[1], run


def _qmark_to_format(sql: str) -> str:
    """Rewrite qmark placeholders to the ``format`` paramstyle MySQL
    drivers use, QUOTE-AWARE: only a ``?`` OUTSIDE string literals and
    backtick-quoted identifiers is a placeholder — a literal ``?``
    inside ``'...'``/``"..."``/`` `...` `` survives (a blanket
    ``replace`` would corrupt it AND desync the arg count). Literal
    ``%`` doubles to ``%%`` everywhere (quoted or not): the driver's
    interpolation is plain %-formatting, unaware of SQL quotes.
    Backslash escapes inside string quotes and doubled closing quotes
    (``''``/``""``/`` `` `` — MySQL's own escape) are honored."""
    out: list[str] = []
    quote: str | None = None
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if quote is None:
            if ch == "?":
                out.append("%s")
            elif ch == "%":
                out.append("%%")
            else:
                if ch in ("'", '"', "`"):
                    quote = ch
                out.append(ch)
            i += 1
        else:
            if ch == "\\" and quote in ("'", '"') and i + 1 < n:
                nxt = sql[i + 1]
                out.append(ch)
                out.append("%%" if nxt == "%" else nxt)
                i += 2
                continue
            if ch == quote and i + 1 < n and sql[i + 1] == quote:
                out.append(ch * 2)
                i += 2
                continue
            if ch == quote:
                quote = None
            out.append("%%" if ch == "%" else ch)
            i += 1
    return "".join(out)


# the PEP-249 exception taxonomy (pymysql.err and mysql.connector.errors
# both follow it; pymysql roots it at MySQLError) — the names the errno
# normalization accepts. Everything else, notably OSError/socket errors
# whose args[0] is an OS errno, must NOT alias into the server-errno
# ignorable/retry policy.
_DBAPI_EXC_NAMES = frozenset({
    "MySQLError", "Warning", "Error", "InterfaceError", "DatabaseError",
    "DataError", "OperationalError", "IntegrityError", "InternalError",
    "ProgrammingError", "NotSupportedError",
})


class DbApiExecutor:
    """PEP-249 connection -> Executor protocol: the adapter a REAL
    MySQL driver (pymysql / mysql-connector, both DB-API 2.0) plugs in
    through — the live half of the K1 seam (reference
    applier_incr.go:532-860 executes over database/sql the same way).

    - tx framing maps to the connection's own transaction: ``begin``
      opens one explicitly (``BEGIN`` statement — DB-API starts
      transactions implicitly, but the sink's framing is explicit and
      a stray earlier autocommit must not fold into our tx),
      ``commit``/``rollback`` delegate to the connection.
    - MySQL drivers use the ``format`` paramstyle (%s), the builder
      emits ``?`` (the reference's prepared-statement style):
      parameterized statements convert via :func:`_qmark_to_format`
      (quote-aware — a literal ``?`` inside a quoted identifier or
      string survives, literal ``%`` doubles for the driver's
      %-interpolation). Statements with no args (DDL query text) pass
      through UNTOUCHED.
    - DRIVER exceptions normalize to :class:`MySQLError`: both pymysql
      and mysql-connector carry the server errno as ``exc.args[0]`` /
      ``exc.errno`` — the sink's A12/A13 policy (ignorable errnos
      warn-and-continue, deadlock retries) then works unchanged over a
      live connection. Normalization is restricted to the driver's own
      exception hierarchy (PEP-249 taxonomy names, OSError explicitly
      rejected): an OS errno in ``OSError.args[0]`` must never alias
      into the server-errno policy (errno 1062 the server means
      "duplicate key — ignorable"; errno 1062 from the OS would be
      nonsense to ignore).
    """

    def __init__(self, connection):
        self.connection = connection

    @staticmethod
    def _is_driver_error(exc) -> bool:
        if isinstance(exc, OSError):
            return False
        return any(
            k.__module__ != "builtins" and k.__name__ in _DBAPI_EXC_NAMES
            for k in type(exc).__mro__
        )

    @classmethod
    def _errno(cls, exc) -> int | None:
        if not cls._is_driver_error(exc):
            return None
        errno = getattr(exc, "errno", None)
        if isinstance(errno, int):
            return errno
        args = getattr(exc, "args", ())
        if args and isinstance(args[0], int):
            return args[0]
        return None

    def _run(self, sql: str, args: list) -> None:
        cur = self.connection.cursor()
        try:
            if args:
                cur.execute(_qmark_to_format(sql), tuple(args))
            else:
                cur.execute(sql)
        except Exception as exc:  # noqa: BLE001 - normalize driver errors
            errno = self._errno(exc)
            if errno is None:
                raise
            raise MySQLError(errno, str(exc)) from exc
        finally:
            try:
                cur.close()
            except Exception:  # pragma: no cover - close is best-effort
                pass

    def begin(self) -> None:
        self._run("BEGIN", [])

    def execute(self, sql: str, args: list) -> None:
        self._run(sql, args)

    def commit(self) -> None:
        self.connection.commit()

    def rollback(self) -> None:
        self.connection.rollback()


def mysql_executor(**connect_kwargs) -> DbApiExecutor:
    """Construct the live executor over pymysql (absent in this image;
    the tests drive DbApiExecutor with a behavioral DB-API fake
    instead — tests/dbapi_fake.py)."""
    try:
        import pymysql
    except ImportError as e:
        raise NotImplementedError(
            "pymysql not installed; wrap any PEP-249 MySQL connection "
            "in DbApiExecutor instead"
        ) from e
    return DbApiExecutor(pymysql.connect(**connect_kwargs))


class RecordingExecutor:
    """Test double: records (sql, args) with tx framing markers; can be
    armed to raise a given errno on the Nth execute."""

    def __init__(self):
        self.log: list[tuple[str, list]] = []
        self.committed: list[list[tuple[str, list]]] = []
        self._tx: list[tuple[str, list]] = []
        self._fail_at: int | None = None
        self._fail_errno: int = 0
        self._ncalls = 0

    def fail_on_call(self, n: int, errno: int) -> None:
        self._fail_at, self._fail_errno = n, errno

    def begin(self) -> None:
        self.log.append(("begin", []))
        self._tx = []

    def execute(self, sql: str, args: list) -> None:
        self._ncalls += 1
        if self._fail_at is not None and self._ncalls == self._fail_at:
            self._fail_at = None
            raise MySQLError(self._fail_errno, "injected")
        self.log.append((sql, list(args)))
        self._tx.append((sql, list(args)))

    def commit(self) -> None:
        self.log.append(("commit", []))
        self.committed.append(self._tx)
        self._tx = []

    def rollback(self) -> None:
        self.log.append(("rollback", []))
        self._tx = []


#: A9 flow-control ceiling for the driver-collected MySQL lane. The
#: reference bounds in-flight bytes/events before the applier
#: (extractor.go:650-658); here the bound is rows-per-micro-batch, and
#: exceeding it is a configuration error (trigger bounds too loose for
#: a single ordered connection), reported loudly instead of silently
#: collecting an unbounded batch onto the driver.
MAX_WIRE_BATCH_ROWS = 100_000


def drain_wire_batch(
    batch, sink: MySQLApplierSink, max_rows: int = MAX_WIRE_BATCH_ROWS
) -> int:
    """foreachBatch body for a real-MySQL destination: drain one
    wire-form micro-batch (streaming/wire.WIRE_SCHEMA rows) through the
    sink, transaction by transaction in seq order.

    Driver-side by design: a MySQL applier is ONE ordered connection —
    the reference's applier is exactly this shape (single applier
    goroutine per job, applier_incr.go) — so the batch is collected.
    Batch size is bounded by the trigger bounds (A9 flow control) and
    ENFORCED here: collection stops at ``max_rows + 1`` rows and raises
    rather than pulling an unbounded batch onto the driver. This lane is
    for an actual MySQL downstream at MySQL-sized change rates; the
    data-scale path remains the distributed lake targets.
    Returns the number of transactions committed (skips replays)."""
    rows = batch.orderBy("seq").limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise RuntimeError(
            f"wire micro-batch exceeds the A9 flow-control bound "
            f"({max_rows} rows); tighten the trigger bounds "
            f"(maxOffsetsPerTrigger / maxFilesPerTrigger) for the MySQL lane"
        )
    txs: dict[tuple[str, int], list[dict]] = {}
    order: list[tuple[str, int]] = []
    for r in rows:
        k = (r["sid"], r["gno"])
        if k not in txs:
            txs[k] = []
            order.append(k)
        txs[k].append(_wire_row_to_change(r, sink))
    return sink.apply_batch([(sid, gno, txs[(sid, gno)]) for sid, gno in order])


def _wire_row_to_change(r, sink: MySQLApplierSink) -> dict:
    import json

    if r["op"] == "ddl":
        return {
            "op": "ddl",
            "schema_name": r["schema_name"],
            "table_name": r["table_name"],
            "query": r["query"],
        }
    spec = sink.tables.get((r["schema_name"], r["table_name"]))
    if spec is None:
        raise KeyError(f"no TableSpec for {r['schema_name']}.{r['table_name']}")
    names = [c.name for c in spec.columns]

    def ordinals(img: str | None) -> list:
        if not img:
            return []
        d = json.loads(img)
        return [d.get(n) for n in names]

    return {
        "op": r["op"],
        "schema_name": r["schema_name"],
        "table_name": r["table_name"],
        "before": ordinals(r["before"]),
        "after": ordinals(r["after"]),
    }
