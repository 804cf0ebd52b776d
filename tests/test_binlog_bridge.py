"""Binlog-event translation goldens (reference S6): canned event dicts
-> wire rows, mirroring the reference's table-driven tests
(binlog_reader_test.go:304 resolveQuery, :451 matchTable, :560
skipQueryDDL) plus tx assembly, GTID bookkeeping, and the end-to-end
bridge -> FileBridge -> ReplicationJob path."""

from __future__ import annotations

import json

import pytest

from dtle_spark.sources.binlog_events import (
    BinlogEventTranslator,
    SchemaPattern,
    TablePattern,
    TableSelector,
    ddl_target,
    resolve_drop_table,
)
from dtle_spark.sources.gtid import GtidSet

SID = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"


def _gtid(gno, lc=0, seqno=0, sid=SID):
    return {"type": "gtid", "sid": sid, "gno": gno,
            "last_committed": lc, "sequence_number": seqno}


def _q(query, schema="db1", pos=None, ts=1600000000):
    return {"type": "query", "schema": schema, "query": query,
            "log_pos": pos, "timestamp": ts}


def _rows(op, rows, schema="db1", table="t1", pos=None, ts=1600000000):
    return {"type": "rows", "op": op, "schema": schema, "table": table,
            "rows": rows, "log_pos": pos, "timestamp": ts}


class TestGtidSet:
    def test_add_merges_and_compacts(self):
        g = GtidSet()
        for n in [1, 2, 3, 7, 5, 4, 10]:
            g.add(SID, n)
        assert g.to_str() == f"{SID}:1-5:7:10"
        assert g.contains(SID, 4) and not g.contains(SID, 6)
        assert g.interval_count() == 3

    def test_round_trip_and_union(self):
        a = GtidSet.from_str(f"{SID}:1-30:32-33")
        b = GtidSet.from_str(f"{SID}:31,11111111-2222-3333-4444-555555555555:1-7")
        a.union(b)
        assert a.to_str() == (
            "11111111-2222-3333-4444-555555555555:1-7," + f"{SID}:1-33"
        )
        assert GtidSet.from_str(a.to_str()).to_str() == a.to_str()

    def test_contains_set(self):
        big = GtidSet.from_str(f"{SID}:1-100")
        small = GtidSet.from_str(f"{SID}:5-10:50")
        assert big.contains_set(small) and not small.contains_set(big)

    def test_save_load(self, tmp_path):
        g = GtidSet.from_str(f"{SID}:1-9")
        p = str(tmp_path / "pos" / "gtid.json")
        g.save(p)
        assert GtidSet.load(p).to_str() == g.to_str()

    def test_idempotent_add(self):
        g = GtidSet()
        g.add(SID, 5)
        g.add(SID, 5)
        assert g.to_str() == f"{SID}:5"


class TestMatchTable:
    """Goldens from Test_matchTable (binlog_reader_test.go:451)."""

    SEL = TableSelector(do=[
        SchemaPattern("db1", tables=[TablePattern(name="tb1"),
                                     TablePattern(regex=r"(\w*)tb_rex")]),
        SchemaPattern("db2"),
        SchemaPattern(schema_regex=r"(\w*)db_rex1"),
    ])

    @pytest.mark.parametrize("schema,table,want", [
        ("db1", None, True),          # match_schema
        ("db2", "", True),            # match_schema
        ("testdb_rex1", "", True),    # match_schema_rex
        ("db1", "tb1", True),         # match_table
        ("db1", "testtb_rex", True),  # match_table_rex
        ("db2", "testtb", True),      # schema-level: all tables
        ("db_not_match", None, False),
        ("db1", "tb2", False),
    ])
    def test_golden(self, schema, table, want):
        assert self.SEL.replicates(schema, table) is want

    def test_system_schemas_never_replicate(self):
        assert not TableSelector().replicates("mysql", "user")
        assert not TableSelector().replicates("dtle", "gtid_executed_v4")

    def test_ignore_list(self):
        sel = TableSelector(ignore=[SchemaPattern("db2", tables=[TablePattern("tb-skip")])])
        assert not sel.replicates("db2", "tb-skip")
        assert sel.replicates("db2", "other")


class TestResolveQuery:
    """Goldens from TestBinlogReader_resolveQuery (binlog_reader_test.go:304):
    skipFunc skips schema=='skip' or table=='skip'."""

    @staticmethod
    def skip(schema, table):
        return schema == "skip" or table == "skip"

    def test_drop_table_1(self):
        assert resolve_drop_table("drop table a.b, skip.c, d", self.skip, "") == (
            "DROP TABLE `a`.`b`, `d`"
        )

    def test_drop_table_2_all_skipped_keeps_first(self):
        assert resolve_drop_table(
            "drop table if exists skip.b, skip.c", self.skip, ""
        ) == "DROP TABLE IF EXISTS `skip`.`b`"

    def test_non_drop_passthrough(self):
        sql = "alter table t add column c int"
        assert resolve_drop_table(sql, self.skip) == sql

    @pytest.mark.parametrize("sql,schema,table", [
        ("ALTER TABLE db2.t2 ADD COLUMN x INT", "db2", "t2"),
        ("alter table `t3` drop column y", "cur", "t3"),
        ("CREATE TABLE IF NOT EXISTS db4.n (id INT)", "db4", "n"),
        ("truncate table t5", "cur", "t5"),
        ("RENAME TABLE a TO b", "cur", "a"),
        ("CREATE DATABASE foo", "cur", None),
    ])
    def test_ddl_target(self, sql, schema, table):
        assert ddl_target(sql, "cur") == (schema, table)


class TestTxAssembly:
    def test_insert_update_delete_tx(self):
        tr = BinlogEventTranslator()
        out = tr.feed_all([
            _gtid(7, lc=3),
            _q("BEGIN", pos=100),
            _rows("insert", [{"id": 1, "v": "a"}, {"id": 2, "v": None}], pos=120),
            _rows("update", [({"id": 1, "v": "a"}, {"id": 1, "v": "b"})], pos=140),
            _rows("delete", [{"id": 2, "v": None}], pos=160),
            {"type": "xid", "xid": 9, "log_pos": 180},
        ])
        assert [r["op"] for r in out] == ["i", "i", "u", "d"]
        assert all(r["sid"] == SID and r["gno"] == 7 and r["lc"] == 3 for r in out)
        assert [r["seq"] for r in out] == [120, 121, 140, 160]  # strict monotone: same-event rows nudge +1
        u = out[2]
        assert json.loads(u["before"]) == {"id": 1, "v": "a"}
        assert json.loads(u["after"]) == {"id": 1, "v": "b"}
        assert json.loads(out[1]["after"])["v"] is None and out[1]["before"] is None
        assert out[3]["after"] is None and json.loads(out[3]["before"])["id"] == 2
        assert tr.gtid_executed.to_str() == f"{SID}:7"

    def test_rows_buffered_until_commit(self):
        tr = BinlogEventTranslator()
        assert tr.feed(_gtid(1)) == []
        assert tr.feed(_q("BEGIN")) == []
        assert tr.feed(_rows("insert", [{"id": 1}])) == []
        # nothing emitted yet; COMMIT query (non-XID engines) flushes
        out = tr.feed(_q("COMMIT"))
        assert len(out) == 1 and out[0]["op"] == "i"

    def test_ddl_is_auto_commit_own_entry(self):
        tr = BinlogEventTranslator()
        out = tr.feed_all([
            _gtid(5),
            _q("ALTER TABLE db1.t1 ADD COLUMN c INT", pos=300),
        ])
        assert len(out) == 1
        r = out[0]
        assert r["op"] == "ddl" and r["schema_name"] == "db1" and r["table_name"] == "t1"
        assert r["query"].startswith("ALTER TABLE")
        assert tr.gtid_executed.contains(SID, 5)

    def test_redelivery_skipped_via_resume_set(self):
        done = GtidSet.from_str(f"{SID}:1-10")
        tr = BinlogEventTranslator(resume_from=done)
        out = tr.feed_all([
            _gtid(7),  # already executed
            _q("BEGIN"),
            _rows("insert", [{"id": 1}]),
            {"type": "xid", "xid": 1},
            _gtid(11),  # new
            _q("BEGIN"),
            _rows("insert", [{"id": 2}]),
            {"type": "xid", "xid": 2},
        ])
        assert len(out) == 1 and json.loads(out[0]["after"])["id"] == 2
        assert tr.gtid_executed.to_str() == f"{SID}:1-11"

    def test_selector_filters_rows_and_ddl(self):
        sel = TableSelector(do=[SchemaPattern("db1", tables=[TablePattern("keep")])])
        tr = BinlogEventTranslator(selector=sel)
        out = tr.feed_all([
            _gtid(1),
            _q("BEGIN"),
            _rows("insert", [{"id": 1}], table="keep"),
            _rows("insert", [{"id": 2}], table="drop_me"),
            {"type": "xid", "xid": 1},
            _gtid(2),
            _q("CREATE TABLE db9.x (id INT)"),  # schema not replicated
        ])
        assert len(out) == 1 and out[0]["table_name"] == "keep"

    def test_trigger_ddl_skipped(self):
        tr = BinlogEventTranslator()
        out = tr.feed_all([
            _gtid(1),
            _q("CREATE TRIGGER trg BEFORE INSERT ON t1 FOR EACH ROW SET @x=1"),
        ])
        assert out == []

    def test_rotate_tracks_log_file(self):
        tr = BinlogEventTranslator()
        tr.feed({"type": "rotate", "next_log": "mysql-bin.000042", "position": 4})
        assert tr.log_file == "mysql-bin.000042"

    def test_multi_table_drop_rewritten_in_wire_query(self):
        sel = TableSelector(do=[SchemaPattern("a"), SchemaPattern("d")])
        tr = BinlogEventTranslator(selector=sel)
        out = tr.feed_all([
            _gtid(1),
            _q("drop table a.b, skip.c, d", schema="d"),
        ])
        assert len(out) == 1
        assert out[0]["query"] == "DROP TABLE `a`.`b`, `d`.`d`"


def test_bridge_to_replication_job_end_to_end(spark, tmp_path):
    """Canned binlog events -> MySQLBinlogBridge.publish (FileBridge
    spool) -> ReplicationJob merge: the full S6->S7->apply path with
    only the socket faked."""
    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.sources.cdc_bridge import FileBridge, MySQLBinlogBridge
    from dtle_spark.streaming.pipeline import ParquetTableTarget, ReplicationJob
    from pyspark.sql import types as T

    row_t = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    bridge = FileBridge(str(tmp_path / "spool"))
    mysql = MySQLBinlogBridge()
    mysql.publish(spark, bridge, [
        _gtid(1), _q("BEGIN", pos=10),
        _rows("insert", [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], pos=20),
        {"type": "xid", "xid": 1, "log_pos": 30},
    ])
    mysql.publish(spark, bridge, [
        _gtid(2), _q("BEGIN", pos=40),
        _rows("update", [({"id": 1, "v": "a"}, {"id": 1, "v": "z"})], pos=50),
        _rows("delete", [{"id": 2, "v": "b"}], pos=60),
        {"type": "xid", "xid": 2, "log_pos": 70},
    ])
    assert mysql.position() == f"{SID}:1-2"

    cat = SchemaCatalog()
    cat.register("db1", "t1", row_t, ["id"])
    cfg = TableConfig("db1", "t1", unique_key=["id"])
    target = ParquetTableTarget(str(tmp_path / "tgt"))
    rj = ReplicationJob(
        spark, JobConfig("bl", [cfg]), str(tmp_path / "spool") + "/*",
        str(tmp_path / "tgt"), str(tmp_path / "ckpt"), cat,
    ).start()
    rj.process_available()
    rj.pause()

    rows = {r["id"]: r["v"] for r in target.read(spark, "db1", "t1").collect()}
    assert rows == {1: "z"}


class TestQueryEventFlags:
    """Wire-level QUERY-event status-vars parsing, pinned against the
    reference's OWN hex goldens (common/binlog_test.go:18-48)."""

    def test_reference_goldens(self):
        from dtle_spark.sources.binlog_events import parse_query_event_flags

        bs1 = bytes.fromhex(
            "0000000000012000a0550000000006037374640302000100042d002d002d00"
            "0c01706d5f69616d5f6964656e746974795f6462001000"
        )
        r1 = parse_query_event_flags(bs1)
        assert r1["no_foreign_key_checks"] is False
        assert r1["character_set_client"] == "utf8mb4"
        assert r1["collation_connection"] == "utf8mb4_general_ci"
        assert r1["collation_server"] == "utf8mb4_general_ci"
        # beyond the reference: the updated-db-names block is CAPTURED
        # (multi-schema DDL routing hint), not just skipped
        assert r1["updated_db_names"] == ["pm_iam_identity_db"]

        bs2 = bytes.fromhex(
            "0000000000012000a055000000000603737464042d002d0008000cfe"
        )
        r2 = parse_query_event_flags(bs2)
        assert r2["no_foreign_key_checks"] is False
        assert r2["character_set_client"] == "utf8mb4"
        assert r2["collation_connection"] == "utf8mb4_general_ci"
        assert r2["collation_server"] == "latin1_swedish_ci"
        assert r2["updated_db_names"] == []  # 0xfe = over-max sentinel

    def test_fk_checks_bit_and_unknown_code(self):
        import pytest as _p

        from dtle_spark.sources.binlog_events import parse_query_event_flags

        # Q_FLAGS2 with OPTION_NO_FOREIGN_KEY_CHECKS set
        flags2 = bytes([0x00]) + (0x04000000).to_bytes(4, "little")
        assert parse_query_event_flags(flags2)["no_foreign_key_checks"] is True
        with _p.raises(ValueError, match="unknown status-var"):
            parse_query_event_flags(bytes([0xEE]))


def test_compare_file_pos_reference_goldens():
    """Ordering table from base/binlog_test.go TestBinlogCoordinates."""
    from dtle_spark.sources.binlog_events import compare_file_pos

    c1 = ("mysql-bin.00017", 104)
    c3 = ("mysql-bin.00017", 5000)
    c4 = ("mysql-bin.00099", 104)
    c5 = ("mysql-bin.00012", 5000)
    c6 = ("mysql-bin.00012", 104)
    assert compare_file_pos(*c1, *c1) == 0
    assert compare_file_pos(*c1, *c3) == -1
    assert compare_file_pos(*c6, *c3) == -1
    assert compare_file_pos(*c5, *c3) == -1
    assert compare_file_pos(*c5, *c1) == -1
    assert compare_file_pos(*c3, *c1) == 1
    assert compare_file_pos(*c4, *c3) == 1
    assert compare_file_pos(*c4, *c1) == 1
    assert compare_file_pos(*c3, *c6) == 1
