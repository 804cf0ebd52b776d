"""MySQLApplierSink: the reference's per-tx statement flow
(applier_incr.go:532-860) through the pluggable executor — begin,
builder DML in event order, gtid bookkeeping in the SAME tx, commit;
A10 idempotence, A12 ignorable errors, A13 deadlock retry."""

from __future__ import annotations

import re

import pytest

from dtle_spark.sinks.mysql_dml import Column
from dtle_spark.sinks.mysql_sink import (
    MySQLApplierSink,
    MySQLError,
    RecordingExecutor,
    TableSpec,
    create_gtid_table_sql,
)
from dtle_spark.sources.gtid import GtidSet

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
SID2 = "11111111-2222-3333-4444-555555555555"


def norm(q: str) -> str:
    return re.sub(r"[ \t\n\r]+", " ", q.replace("`", "")).strip()


def cols(pks=("id",)):
    return [Column(n, is_pk=(n in pks)) for n in ["id", "name"]]


def mk_sink(executor=None, **kw):
    ex = executor or RecordingExecutor()
    sink = MySQLApplierSink(
        ex,
        "job1",
        {
            ("mydb", "tbl"): TableSpec(cols()),
            ("mydb", "tb2"): TableSpec(cols()),
        },
        **kw,
    )
    return sink, ex


def changes_basic():
    return [
        {"op": "i", "schema_name": "mydb", "table_name": "tbl",
         "before": [], "after": [1, "a"]},
        {"op": "i", "schema_name": "mydb", "table_name": "tbl",
         "before": [], "after": [2, "b"]},
        {"op": "u", "schema_name": "mydb", "table_name": "tbl",
         "before": [1, "a"], "after": [1, "a2"]},
        {"op": "d", "schema_name": "mydb", "table_name": "tbl",
         "before": [2, "b"], "after": []},
    ]


def test_tx_statement_sequence_golden():
    """One tx drains as: begin, batched REPLACE (contiguous inserts),
    update, PK delete, gtid REPLACE, commit — the applier_incr order
    with builder_test.go statement shapes."""
    sink, ex = mk_sink()
    assert sink.apply_tx(SID, 5, changes_basic()) is True
    kinds = [s for s, _ in ex.log]
    assert kinds[0] == "begin" and kinds[-1] == "commit"
    sqls = [norm(s) for s, _ in ex.log]
    assert sqls[1] == "replace into mydb.tbl values (?,?),(?,?)"
    assert ex.log[1][1] == [1, "a", 2, "b"]
    assert sqls[2].startswith("update mydb.tbl set id=?, name=? where")
    assert "limit 1" in sqls[2]
    assert sqls[3].startswith("delete from mydb.tbl where")
    assert "limit 1" in sqls[3]
    # gtid bookkeeping INSIDE the tx, before commit (A6/A10)
    assert sqls[4] == (
        "replace into dtle.gtid_executed_v4 (job_name,source_uuid,gtid,gtid_set) "
        "values (?, ?, ?, null)"
    )
    import uuid

    assert ex.log[4][1] == ["job1", uuid.UUID(SID).bytes, 5]
    assert len(ex.committed) == 1 and len(ex.committed[0]) == 4


def test_idempotence_skips_applied_gno():
    sink, ex = mk_sink()
    assert sink.apply_tx(SID, 5, changes_basic()) is True
    n = len(ex.log)
    assert sink.apply_tx(SID, 5, changes_basic()) is False  # redelivery
    assert len(ex.log) == n  # not a single statement executed
    # canonicalization: uppercase sid is the same source
    assert sink.apply_tx(SID.upper(), 5, changes_basic()) is False
    assert sink.apply_batch([(SID, 5, changes_basic()), (SID, 6, changes_basic())]) == 1


def test_seed_applied_from_destination_position():
    sink, ex = mk_sink()
    sink.seed_applied(GtidSet.from_str(f"{SID}:1-10"))
    assert sink.apply_tx(SID, 7, changes_basic()) is False
    assert sink.apply_tx(SID, 11, changes_basic()) is True


def test_deadlock_retries_whole_tx_then_succeeds():
    sink, ex = mk_sink()
    ex.fail_on_call(3, 1213)  # deadlock on the update
    warns = []
    sink.on_warn = warns.append
    assert sink.apply_tx(SID, 5, changes_basic()) is True
    # first attempt rolled back, second attempt committed the FULL tx
    assert ("rollback", []) in ex.log
    assert len(ex.committed) == 1 and len(ex.committed[0]) == 4
    assert any("1213" in w for w in warns)


def test_deadlock_exhausts_retries_and_raises():
    sink, ex = mk_sink(retries=2)
    calls = {"n": 0}
    real = ex.execute

    def always_deadlock(sql, args):
        calls["n"] += 1
        raise MySQLError(1213, "deadlock")

    ex.execute = always_deadlock
    with pytest.raises(MySQLError):
        sink.apply_tx(SID, 5, changes_basic())
    assert calls["n"] == 3  # initial + 2 retries
    assert not sink.applied.contains(SID, 5)  # position did NOT advance


def test_ignorable_error_warns_and_tx_commits():
    """A12: dup-entry (1062) on one statement is tolerated; the tx
    still commits and the position advances."""
    sink, ex = mk_sink()
    ex.fail_on_call(1, 1062)
    warns = []
    sink.on_warn = warns.append
    assert sink.apply_tx(SID, 5, changes_basic()) is True
    assert any("1062" in w for w in warns)
    assert len(ex.committed) == 1 and len(ex.committed[0]) == 3  # insert swallowed
    assert sink.applied.contains(SID, 5)


def test_non_ignorable_error_rolls_back_no_position_advance():
    sink, ex = mk_sink()
    ex.fail_on_call(2, 1064)  # syntax error: not ignorable, not retryable
    with pytest.raises(MySQLError):
        sink.apply_tx(SID, 5, changes_basic())
    assert ex.log[-1] == ("rollback", [])
    assert not sink.applied.contains(SID, 5)
    assert ex.committed == []


def test_one_stmt_ddl_no_begin_still_bookkeeps():
    """applier_incr.go:565: a single-DDL tx skips `begin` (MySQL DDL
    auto-commits) but still records its gtid and commits."""
    sink, ex = mk_sink()
    sink.apply_tx(SID, 9, [
        {"op": "ddl", "schema_name": "mydb", "table_name": "tbl",
         "query": "alter table mydb.tbl add column c int",
         "create_schema_if_not_exists": True, "current_schema": "mydb"},
    ])
    sqls = [norm(s) for s, _ in ex.log]
    assert "begin" not in sqls
    assert sqls[0] == "CREATE SCHEMA IF NOT EXISTS mydb"
    assert sqls[1] == "USE mydb"
    assert sqls[2] == "alter table mydb.tbl add column c int"
    assert sqls[3].startswith("replace into dtle.gtid_executed_v4")
    assert sqls[4] == "commit"


def test_cross_table_event_order_preserved_with_batching():
    """Inserts batch only within contiguous same-table runs — an
    interleaved tx keeps its statement order."""
    sink, ex = mk_sink()
    chs = [
        {"op": "i", "schema_name": "mydb", "table_name": "tbl",
         "before": [], "after": [1, "a"]},
        {"op": "i", "schema_name": "mydb", "table_name": "tb2",
         "before": [], "after": [7, "x"]},
        {"op": "i", "schema_name": "mydb", "table_name": "tbl",
         "before": [], "after": [2, "b"]},
    ]
    sink.apply_tx(SID, 5, chs)
    sqls = [norm(s) for s, _ in ex.log]
    assert sqls[1] == "replace into mydb.tbl values (?,?)"
    assert sqls[2] == "replace into mydb.tb2 values (?,?)"
    assert sqls[3] == "replace into mydb.tbl values (?,?)"


def test_ensure_gtid_table_bootstrap_tolerates_exists():
    sink, ex = mk_sink()
    ex.fail_on_call(1, 1007)  # schema exists
    sink.ensure_gtid_table()
    sqls = [s for s, _ in ex.log]
    assert any(s.startswith("CREATE TABLE IF NOT EXISTS `dtle`.`gtid_executed_v4`") for s in sqls)
    ddls = create_gtid_table_sql()
    assert "primary key (job_name, source_uuid, gtid)" in ddls[1]


def test_unknown_table_raises():
    sink, ex = mk_sink()
    with pytest.raises(KeyError):
        sink.apply_tx(SID, 1, [
            {"op": "i", "schema_name": "nope", "table_name": "t",
             "before": [], "after": [1]},
        ])


def test_drain_wire_batch_end_to_end(spark):
    """E2E: a wire-form micro-batch (the pipeline's streaming shape)
    drains through the sink as per-tx reference statement sequences,
    replay-idempotent."""
    from dtle_spark.sinks.mysql_sink import drain_wire_batch
    from dtle_spark.streaming.wire import WIRE_SCHEMA

    rows = [
        (SID, 5, 1, None, "i", None, "mydb", "tbl", None, '{"id":1,"name":"a"}', None),
        (SID, 5, 2, None, "i", None, "mydb", "tbl", None, '{"id":2,"name":"b"}', None),
        (SID, 6, 3, None, "u", None, "mydb", "tbl",
         '{"id":1,"name":"a"}', '{"id":1,"name":"a2"}', None),
        (SID2, 1, 4, None, "d", None, "mydb", "tb2", '{"id":9,"name":"z"}', None, None),
    ]
    batch = spark.createDataFrame(rows, WIRE_SCHEMA)
    sink, ex = mk_sink()
    assert drain_wire_batch(batch, sink) == 3
    sqls = [norm(s) for s, _ in ex.log]
    # tx1: batched replace; tx2: update; tx3: delete — each with its own
    # begin/gtid/commit framing
    assert sqls.count("begin") == 3 and sqls.count("commit") == 3
    assert sqls[1] == "replace into mydb.tbl values (?,?),(?,?)"
    assert ex.log[1][1] == [1, "a", 2, "b"]
    assert len(ex.committed) == 3
    # replay: the same batch is a complete no-op
    n = len(ex.log)
    assert drain_wire_batch(batch, sink) == 0
    assert len(ex.log) == n


def test_set_gtid_next_framing():
    """set_gtid_next mode: `set gtid_next = '<sid>:<gno>' /*dtle*/`
    before begin (gtid_next cannot change inside a tx,
    applier_incr.go:546-548), `set gtid_next = 'automatic' /*dtle*/`
    after commit (sqlutils.go:133-136)."""
    sink, ex = mk_sink(set_gtid_next=True)
    sink.apply_tx(SID, 5, changes_basic())
    sqls = [s for s, _ in ex.log]
    assert sqls[0] == f"set gtid_next = '{SID}:5' /*dtle*/"
    assert sqls[1] == "begin"
    assert sqls[-1] == "set gtid_next = 'automatic' /*dtle*/"
    assert sqls[-2] == "commit"


def test_one_stmt_ddl_with_set_gtid_next_restores_before_bookkeeping():
    """A one-statement DDL auto-commits and CONSUMES the pinned GTID;
    real MySQL rejects the bookkeeping REPLACE while gtid_next is still
    pinned (ER 1837). The reference restores gtid_next='automatic'
    before the insert for one-stmt DDL (applier_incr.go:815-819)."""
    sink, ex = mk_sink(set_gtid_next=True)
    sink.apply_tx(SID, 9, [
        {"op": "ddl", "schema_name": "mydb", "table_name": "tbl",
         "query": "alter table mydb.tbl add column c int"},
    ])
    sqls = [norm(s) for s, _ in ex.log]
    assert sqls[0] == f"set gtid_next = '{SID}:9' /*dtle*/"
    assert "begin" not in sqls
    assert sqls[1] == "alter table mydb.tbl add column c int"
    # automatic restored BETWEEN the auto-committed DDL and the REPLACE
    assert sqls[2] == "set gtid_next = 'automatic' /*dtle*/"
    assert sqls[3].startswith("replace into dtle.gtid_executed_v4")
    assert sqls[4] == "commit"
    # exactly one restore — not a second one after commit
    assert sqls.count("set gtid_next = 'automatic' /*dtle*/") == 1


def test_drain_wire_batch_enforces_a9_bound(spark):
    """A9 flow control is enforced, not assumed: a micro-batch above
    max_rows fails loudly instead of collecting unbounded rows onto the
    driver (reference bounds in-flight size at extractor.go:650-658)."""
    from dtle_spark.sinks.mysql_sink import drain_wire_batch
    from dtle_spark.streaming.wire import WIRE_SCHEMA

    rows = [
        (SID, 5, i, None, "i", None, "mydb", "tbl", None,
         '{"id":%d,"name":"a"}' % i, None)
        for i in range(1, 8)
    ]
    batch = spark.createDataFrame(rows, WIRE_SCHEMA)
    sink, ex = mk_sink()
    with pytest.raises(RuntimeError, match="flow-control bound"):
        drain_wire_batch(batch, sink, max_rows=5)
    # under the bound the same batch drains fine
    assert drain_wire_batch(batch, sink, max_rows=100) == 1


# ---------------------------------------------------------------------------
# DbApiExecutor: the LIVE adapter (PEP-249 -> Executor protocol) over a
# behavioral DB-API fake — paramstyle conversion, errno normalization,
# tx framing, and rollback visibility all exercised through the real
# adapter code a pymysql connection would ride (tests/dbapi_fake.py).
# ---------------------------------------------------------------------------


def mk_dbapi_sink(**kw):
    from dtle_spark.sinks.mysql_sink import DbApiExecutor
    from tests.dbapi_fake import FakeDbApiConnection

    conn = FakeDbApiConnection()
    sink = MySQLApplierSink(
        DbApiExecutor(conn), "job1",
        {("mydb", "tbl"): TableSpec(cols()),
         ("mydb", "tb2"): TableSpec(cols())},
        **kw,
    )
    return sink, conn


def test_dbapi_adapter_durable_tx_and_paramstyle():
    """The full applier flow through the real adapter: placeholders
    arrive at the 'driver' as %s with matching tuples (never '?'),
    the whole tx (DML + gtid row) lands durably only at commit, no
    cursor leaks, and redelivery is a no-op."""
    sink, conn = mk_dbapi_sink()
    assert sink.apply_tx(SID, 5, changes_basic()) is True
    assert not conn.in_tx and not conn.tx
    sqls = [norm(s) for s, _ in conn.durable]
    assert sqls[0] == "replace into mydb.tbl values (%s,%s),(%s,%s)"
    assert conn.durable[0][1] == (1, "a", 2, "b")
    assert sqls[1].startswith("update mydb.tbl set id=%s, name=%s where")
    assert sqls[3].startswith("replace into dtle.gtid_executed_v4")
    import uuid as _u

    assert conn.durable[3][1] == ("job1", _u.UUID(SID).bytes, 5)
    assert all("?" not in s for s, a in conn.durable if a is not None)
    assert conn.closed_cursors == conn.cursors_opened > 0
    # redelivery: nothing new reaches the connection
    n = len(conn.durable)
    assert sink.apply_tx(SID, 5, changes_basic()) is False
    assert len(conn.durable) == n


def test_dbapi_adapter_normalizes_errno_for_a12_tolerance():
    """A driver-shaped exception (args[0] = errno) must normalize to
    MySQLError so the sink's ignorable-errno policy works over a live
    connection: a 1062 on one statement warns, the rest of the tx
    still commits durably."""
    warns = []
    sink, conn = mk_dbapi_sink(on_warn=warns.append)
    conn.fail_matching("update", 1062)
    assert sink.apply_tx(SID, 6, changes_basic()) is True
    sqls = [norm(s) for s, _ in conn.durable]
    assert any(s.startswith("replace into mydb.tbl") for s in sqls)
    assert any(s.startswith("delete from mydb.tbl") for s in sqls)
    assert not any(s.startswith("update") for s in sqls)  # the victim
    assert warns and "1062" in warns[0]


def test_dbapi_adapter_deadlock_retry_rolls_back_cleanly():
    """A13 through the adapter: a deadlock (1213) on the first attempt
    rolls the connection's open tx back (nothing partial becomes
    durable) and the retry commits the full tx exactly once."""
    sink, conn = mk_dbapi_sink()
    conn.fail_matching("delete from", 1213, once=True)
    assert sink.apply_tx(SID, 7, changes_basic()) is True
    sqls = [norm(s) for s, _ in conn.durable]
    # exactly one durable copy of each statement — attempt 1 was
    # rolled back wholesale, not half-kept
    assert sqls.count("replace into mydb.tbl values (%s,%s),(%s,%s)") == 1
    assert sum(1 for s in sqls if s.startswith("delete from")) == 1
    assert not conn.in_tx


def test_dbapi_adapter_ddl_passthrough_keeps_literal_qmark():
    """Statements with no args (DDL query text) must pass through
    UNCONVERTED: a '?' inside a DDL string literal is data, not a
    placeholder."""
    sink, conn = mk_dbapi_sink()
    ddl = [{"op": "ddl", "schema_name": "mydb", "table_name": "tbl",
            "query": "ALTER TABLE `mydb`.`tbl` COMMENT 'what?'"}]
    assert sink.apply_tx(SID, 8, ddl) is True
    assert any(s == "ALTER TABLE `mydb`.`tbl` COMMENT 'what?'"
               for s, _ in conn.durable)


def test_qmark_rewrite_is_quote_aware():
    """The placeholder rewrite must not corrupt a literal '?' inside
    backtick-quoted identifiers or string literals of PARAMETERIZED
    DML, and must double literal '%' for the driver's %-interpolation
    (quoted or not — %-formatting is unaware of SQL quotes)."""
    from dtle_spark.sinks.mysql_sink import _qmark_to_format

    assert _qmark_to_format("INSERT INTO t VALUES (?,?)") == \
        "INSERT INTO t VALUES (%s,%s)"
    # '?' inside a backtick identifier and a string literal is data
    assert _qmark_to_format("UPDATE `is?` SET a=? WHERE b='c?d'") == \
        "UPDATE `is?` SET a=%s WHERE b='c?d'"
    # literal % doubles everywhere; placeholders stay single
    assert _qmark_to_format("SELECT '10%' WHERE a LIKE ? ESCAPE '%'") == \
        "SELECT '10%%' WHERE a LIKE %s ESCAPE '%%'"
    # MySQL doubled-quote escape keeps the quote region open
    assert _qmark_to_format("SET a='it''s?' , b=?") == \
        "SET a='it''s?' , b=%s"
    # backslash escape inside string quotes honored
    assert _qmark_to_format(r"SET a='\'?' , b=?") == r"SET a='\'?' , b=%s"


def test_dbapi_adapter_literal_qmark_in_parameterized_dml():
    """End-to-end through the fake: a parameterized statement whose
    quoted literal contains '?' executes with the right arg count —
    the blanket-replace bug would have turned the literal into a
    placeholder and desynced the args (fake raises loud)."""
    from dtle_spark.sinks.mysql_sink import DbApiExecutor
    from tests.dbapi_fake import FakeDbApiConnection

    conn = FakeDbApiConnection()
    ex = DbApiExecutor(conn)
    ex.execute("UPDATE `q?tbl` SET name=? WHERE name='who?'", ["x"])
    sql, params = conn.durable[-1]
    assert sql == "UPDATE `q?tbl` SET name=%s WHERE name='who?'"
    assert params == ("x",)


def test_dbapi_adapter_os_errors_do_not_alias_into_errno_policy():
    """An OSError with an int args[0] (an OS errno, e.g. 104
    ECONNRESET — or even one that collides with an ignorable server
    errno) must NOT normalize to MySQLError: the A12/A13 policy is
    about SERVER errnos, and treating an OS failure as 'duplicate key,
    ignorable' would silently drop statements. Driver-hierarchy errors
    (PEP-249 taxonomy) still normalize."""
    from dtle_spark.sinks.mysql_sink import DbApiExecutor, MySQLError

    class _BoomConn:
        def __init__(self, exc):
            self._exc = exc

        def cursor(self):
            conn = self

            class _Cur:
                def execute(self, *a):
                    raise conn._exc

                def close(self):
                    pass

            return _Cur()

    # 1062 is in IGNORABLE_ERRNOS — the worst-case alias
    for exc in (OSError(1062, "reset"), ConnectionResetError(1062, "x"),
                TimeoutError(1062, "t")):
        ex = DbApiExecutor(_BoomConn(exc))
        with pytest.raises(type(exc)):
            ex.execute("UPDATE t SET a=?", [1])
    from tests.dbapi_fake import FakeDriverError

    ex = DbApiExecutor(_BoomConn(FakeDriverError(1213, "deadlock")))
    with pytest.raises(MySQLError) as ei:
        ex.execute("UPDATE t SET a=?", [1])
    assert ei.value.errno == 1213


def test_mysql_executor_constructor_gated():
    from dtle_spark.sinks.mysql_sink import mysql_executor

    with pytest.raises(NotImplementedError, match="pymysql"):
        mysql_executor(host="h", user="u")


# ---------------------------------------------------------------------------
# Contract tests: the PEP-249 grammar the adapter speaks must be exactly
# what a live pymysql connection would receive — pinned as an ordered
# method-level transcript (connection.cursor / cursor.execute(sql,
# params) / cursor.close / connection.commit / connection.rollback).
# The fake only proves anything if its surface equals the live library's;
# these pins are written from pymysql's public DB-API semantics (format
# paramstyle, explicit tx framing, errno in exc.args[0]) so a real-
# library run can later replay the same transcript assertions verbatim.
# ---------------------------------------------------------------------------


class _CallLog:
    """Wraps any PEP-249 connection, recording every surface call in
    order — the grammar transcript the contract pins."""

    def __init__(self, inner):
        self.inner = inner
        self.calls: list[tuple] = []

    def cursor(self):
        self.calls.append(("cursor",))
        inner_cur = self.inner.cursor()
        log = self

        class _Cur:
            def execute(self, sql, params=None):
                log.calls.append(("execute", sql, params))
                return inner_cur.execute(sql, params)

            def close(self):
                log.calls.append(("close",))
                return inner_cur.close()

        return _Cur()

    def commit(self):
        self.calls.append(("commit",))
        return self.inner.commit()

    def rollback(self):
        self.calls.append(("rollback",))
        return self.inner.rollback()


def mk_contract_sink(**kw):
    from dtle_spark.sinks.mysql_sink import DbApiExecutor
    from tests.dbapi_fake import FakeDbApiConnection

    conn = FakeDbApiConnection()
    log = _CallLog(conn)
    sink = MySQLApplierSink(
        DbApiExecutor(log), "job1",
        {("mydb", "tbl"): TableSpec(cols())}, **kw,
    )
    return sink, log, conn


def test_contract_happy_path_transcript():
    """Full-lifecycle grammar, happy path: every statement rides its
    own cursor (open -> execute -> close, no leaks), BEGIN is an
    explicit statement, commit/rollback are CONNECTION methods (never
    statements), parameterized SQL arrives in format paramstyle with
    tuple args, and the gtid row is inside the same tx."""
    sink, log, conn = mk_contract_sink()
    assert sink.apply_tx(SID, 5, changes_basic()) is True
    kinds = [c[0] for c in log.calls]
    # 5 statements (BEGIN + 3 DML + gtid), each: cursor/execute/close
    assert kinds == ["cursor", "execute", "close"] * 5 + ["commit"]
    stmts = [c for c in log.calls if c[0] == "execute"]
    assert stmts[0][1] == "BEGIN" and stmts[0][2] is None
    for _, sql, params in stmts[1:]:
        assert "?" not in sql.replace("'", "")  # format paramstyle
        assert isinstance(params, tuple)
    assert "COMMIT" not in {s for _, s, _ in stmts}  # method, not stmt
    assert conn.closed_cursors == conn.cursors_opened == 5


def test_contract_deadlock_retry_transcript():
    """A13 grammar: the deadlock attempt ends in connection.rollback()
    (never a ROLLBACK statement), the retry replays the FULL tx from
    BEGIN, and exactly one commit lands."""
    sink, log, conn = mk_contract_sink()
    conn.fail_matching("delete from", 1213, once=True)
    assert sink.apply_tx(SID, 7, changes_basic()) is True
    kinds = [c[0] for c in log.calls]
    assert kinds.count("commit") == 1 and kinds.count("rollback") == 1
    assert kinds.index("rollback") < kinds.index("commit")
    begins = [i for i, c in enumerate(log.calls)
              if c[0] == "execute" and c[1] == "BEGIN"]
    assert len(begins) == 2  # attempt + retry, each explicitly framed
    # the failing execute still closes its cursor (no leak on error)
    assert conn.closed_cursors == conn.cursors_opened
    # durable state holds exactly one copy of each statement
    sqls = [norm(s) for s, _ in conn.durable]
    assert sqls.count("replace into mydb.tbl values (%s,%s),(%s,%s)") == 1


def test_contract_ignorable_errno_transcript():
    """A12 grammar: an ignorable server errno (1062) on one statement
    warns and the tx CONTINUES on the same connection — no rollback,
    one commit, subsequent statements unaffected."""
    warns = []
    sink, log, conn = mk_contract_sink(on_warn=warns.append)
    conn.fail_matching("update", 1062)
    assert sink.apply_tx(SID, 6, changes_basic()) is True
    kinds = [c[0] for c in log.calls]
    assert kinds.count("rollback") == 0 and kinds.count("commit") == 1
    assert warns and "1062" in warns[0]


def test_contract_fake_enforces_driver_grammar():
    """The rules a real driver/server enforces, verified to fire in the
    fake (a fake that accepts what the live library rejects proves
    nothing): unquoted '?' reaching the driver, placeholder/arg count
    mismatch, unsupported %-directives, BEGIN inside an open tx, and
    execute on a closed cursor all raise driver-shaped errors."""
    from tests.dbapi_fake import FakeDbApiConnection, FakeDriverError

    conn = FakeDbApiConnection()
    cur = conn.cursor()
    with pytest.raises(FakeDriverError, match="unquoted '\\?'"):
        cur.execute("UPDATE t SET a=? WHERE b=%s", ("x",))
    with pytest.raises(FakeDriverError, match="mismatch"):
        cur.execute("UPDATE t SET a=%s, b=%s", ("x",))
    with pytest.raises(FakeDriverError, match="format directive"):
        cur.execute("SELECT '100%' WHERE a=%s", ("x",))  # undoubled %
    cur.execute("BEGIN")
    with pytest.raises(FakeDriverError, match="BEGIN inside"):
        cur.execute("BEGIN")
    cur.close()
    with pytest.raises(FakeDriverError, match="closed"):
        cur.execute("SELECT 1")
