"""Transport contract harness (VERDICT r5 item 3): a RECORDED binlog
wire session — event objects with python-mysql-replication's public
attribute surface — drives MySQLBinlogBridge.tail() end-to-end through
the FileBridge spool into MySQLApplierSink, and the resulting SQL/args
sequence is asserted against the builder_test.go statement shapes.

This is the helper/binlogcmp-style verification the reference used
(driver/mysql/binlog/binlog_reader.go:242-415 consumes the socket;
applier_incr.go:532-860 executes): a framing or ordering break anywhere
between "binlog event" and "wire bytes" fails here without a live
MySQL. Only BinlogStreamReader construction itself stays untested (the
library is absent in this image)."""

from __future__ import annotations

import re

import pytest

from dtle_spark.sinks.mysql_dml import Column
from dtle_spark.sinks.mysql_sink import (
    MySQLApplierSink,
    RecordingExecutor,
    TableSpec,
    drain_wire_batch,
)
from dtle_spark.sources.cdc_bridge import (
    FileBridge,
    MySQLBinlogBridge,
    binlog_event_object_to_dict,
)
from dtle_spark.sources.gtid import GtidSet
from dtle_spark.streaming.wire import WIRE_SCHEMA

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def norm(q: str) -> str:
    return re.sub(r"[ \t\n\r]+", " ", q.replace("`", "")).strip()


class _Packet:
    def __init__(self, log_pos):
        self.log_pos = log_pos


def _ev(name: str, log_pos: int | None = None, **attrs):
    """Build an event object whose CLASS NAME and attributes mirror
    python-mysql-replication's public surface."""
    ev = type(name, (), {})()
    if log_pos is not None:
        ev.packet = _Packet(log_pos)
    for k, v in attrs.items():
        setattr(ev, k, v)
    return ev


def recorded_session() -> list:
    """Three transactions as the socket would deliver them:
    tx1 = two inserts, tx2 = update + delete, tx3 = auto-commit DDL.
    Includes events the loop must SKIP (rotate, table-map, begin)."""
    return [
        _ev("RotateEvent", next_binlog="mysql-bin.000003", position=4),
        _ev("FormatDescriptionEvent", log_pos=120),        # skipped
        # -- tx1 ----------------------------------------------------------
        _ev("GtidEvent", log_pos=200, gtid=f"{SID}:1",
            last_committed=0, sequence_number=1),
        _ev("QueryEvent", log_pos=240, schema=b"db1", query="BEGIN",
            timestamp=1700000001),
        _ev("TableMapEvent", log_pos=260, schema="db1", table="tbl"),  # skipped
        _ev("WriteRowsEvent", log_pos=300, schema="db1", table="tbl",
            timestamp=1700000001,
            rows=[{"values": {"id": 1, "name": "a"}},
                  {"values": {"id": 2, "name": "b"}}]),
        _ev("XidEvent", log_pos=340, xid=77),
        # -- tx2 ----------------------------------------------------------
        _ev("GtidEvent", log_pos=400, gtid=f"{SID}:2",
            last_committed=1, sequence_number=2),
        _ev("QueryEvent", log_pos=440, schema=b"db1", query="BEGIN",
            timestamp=1700000002),
        _ev("UpdateRowsEvent", log_pos=500, schema="db1", table="tbl",
            timestamp=1700000002,
            rows=[{"before_values": {"id": 1, "name": "a"},
                   "after_values": {"id": 1, "name": "a2"}}]),
        _ev("DeleteRowsEvent", log_pos=540, schema="db1", table="tbl",
            timestamp=1700000002,
            rows=[{"values": {"id": 2, "name": "b"}}]),
        _ev("XidEvent", log_pos=580, xid=78),
        # -- tx3: DDL (auto-commit, no XID) -------------------------------
        _ev("GtidEvent", log_pos=600, gtid=f"{SID}:3",
            last_committed=2, sequence_number=3),
        _ev("QueryEvent", log_pos=660, schema=b"db1",
            query="ALTER TABLE db1.tbl ADD INDEX ix (name)",
            timestamp=1700000003),
    ]


def test_event_object_adapter_shapes():
    d = binlog_event_object_to_dict(
        _ev("GtidEvent", gtid=f"{SID}:9", last_committed=4, sequence_number=5))
    assert d == {"type": "gtid", "sid": SID, "gno": 9,
                 "last_committed": 4, "sequence_number": 5}
    d = binlog_event_object_to_dict(
        _ev("QueryEvent", log_pos=77, schema=b"db1", query="BEGIN",
            timestamp=123))
    assert d["schema"] == "db1" and d["log_pos"] == 77
    assert binlog_event_object_to_dict(_ev("TableMapEvent")) is None
    assert binlog_event_object_to_dict(_ev("HeartbeatLogEvent")) is None
    u = binlog_event_object_to_dict(
        _ev("UpdateRowsEvent", log_pos=9, schema="s", table="t",
            rows=[{"before_values": {"a": 1}, "after_values": {"a": 2}}]))
    assert u["op"] == "update" and u["rows"] == [({"a": 1}, {"a": 2})]


def test_tail_to_applier_wire_session_golden(spark, tmp_path):
    """The full contract: recorded socket events -> tail() -> spool ->
    drain_wire_batch -> exact reference statement sequence."""
    bridge = FileBridge(str(tmp_path / "spool"))
    b = MySQLBinlogBridge()
    published = b.tail(spark, bridge, reader=recorded_session())
    assert published == 3  # one wire batch per committed tx
    assert b.position() == f"{SID}:1-3"

    batch = spark.read.schema(WIRE_SCHEMA).parquet(
        str(tmp_path / "spool") + "/*")
    assert batch.count() == 5  # 2 ins + 1 upd + 1 del + 1 ddl
    sink = MySQLApplierSink(
        RecordingExecutor(), "job1",
        {("db1", "tbl"): TableSpec([Column("id", is_pk=True), Column("name")])},
        set_gtid_next=True,
    )
    assert drain_wire_batch(batch, sink) == 3
    ex = sink.executor
    sqls = [norm(s) for s, _ in ex.log]
    import uuid as _u

    expect = [
        # tx1
        f"set gtid_next = '{SID}:1' /*dtle*/",
        "begin",
        "replace into db1.tbl values (?,?),(?,?)",
        "replace into dtle.gtid_executed_v4 (job_name,source_uuid,gtid,gtid_set) values (?, ?, ?, null)",
        "commit",
        "set gtid_next = 'automatic' /*dtle*/",
        # tx2
        f"set gtid_next = '{SID}:2' /*dtle*/",
        "begin",
        "update db1.tbl set id=?, name=? where ((id = ?)) limit 1",
        "delete from db1.tbl where ((id = ?)) limit 1",
        "replace into dtle.gtid_executed_v4 (job_name,source_uuid,gtid,gtid_set) values (?, ?, ?, null)",
        "commit",
        "set gtid_next = 'automatic' /*dtle*/",
        # tx3: one-stmt DDL — no begin; automatic restored BEFORE the
        # bookkeeping REPLACE (the DDL consumed the pinned GTID)
        f"set gtid_next = '{SID}:3' /*dtle*/",
        "ALTER TABLE db1.tbl ADD INDEX ix (name)",
        "set gtid_next = 'automatic' /*dtle*/",
        "replace into dtle.gtid_executed_v4 (job_name,source_uuid,gtid,gtid_set) values (?, ?, ?, null)",
        "commit",
    ]
    assert sqls == expect
    # args golden: batched insert flattens row-major; gtid rows carry
    # (job, sid-bytes, gno)
    assert ex.log[2][1] == [1, "a", 2, "b"]
    assert ex.log[3][1] == ["job1", _u.UUID(SID).bytes, 1]
    assert ex.log[8][1] == [1, "a2", 1]  # SET images + PK-only WHERE
    assert ex.log[9][1] == [2]
    assert ex.log[10][1] == ["job1", _u.UUID(SID).bytes, 2]
    assert ex.log[16][1] == ["job1", _u.UUID(SID).bytes, 3]

    # replay the same spool: A10 makes it a complete no-op
    n = len(ex.log)
    assert drain_wire_batch(batch, sink) == 0
    assert len(ex.log) == n


def test_tail_resume_from_position_skips_replayed_txs(spark, tmp_path):
    """Restart contract: a bridge rebuilt with resume_from=<position>
    re-reads the same socket stream and publishes NOTHING (the
    applier_incr.go:290-313 redelivery guard at the bridge tier)."""
    bridge = FileBridge(str(tmp_path / "spool"))
    b1 = MySQLBinlogBridge()
    b1.tail(spark, bridge, reader=recorded_session())
    pos = b1.position()

    b2 = MySQLBinlogBridge(resume_from=GtidSet.from_str(pos))
    assert b2.tail(spark, bridge, reader=recorded_session()) == 0


def test_tail_without_reader_or_library_raises():
    with pytest.raises(NotImplementedError, match="python-mysql-replication"):
        MySQLBinlogBridge().tail()


def test_tail_live_branch_wires_auto_position(spark, tmp_path, monkeypatch):
    """The REAL live path (reader=None): tail() imports
    pymysqlreplication, constructs BinlogStreamReader, and iterates —
    run against the behavioral fake (tests/pymysqlreplication_fake.py)
    installed in sys.modules. Proves what the injected-reader tests
    cannot: the executed-GTID set is actually WIRED into the
    constructor's auto_position, a fresh bridge sends None, a resumed
    bridge sends its position and the SERVER-side skip keeps already-
    executed transactions off the wire — reconnect-without-duplicates,
    the property a crashed bridge restart stands on."""
    import sys

    from tests import pymysqlreplication_fake as fake
    from tests.pymysqlreplication_fake import (
        FakeReplicationServer,
        make_event,
    )

    monkeypatch.setitem(sys.modules, "pymysqlreplication", fake)

    def tx(gno, rows_events):
        return [
            make_event("GtidEvent", log_pos=gno * 100, gtid=f"{SID}:{gno}",
                       last_committed=gno - 1, sequence_number=gno),
            make_event("QueryEvent", log_pos=gno * 100 + 10, schema=b"db1",
                       query="BEGIN", timestamp=1700000000 + gno),
            *rows_events,
            make_event("XidEvent", log_pos=gno * 100 + 90, xid=gno),
        ]

    def ins(gno, vid):
        return make_event(
            "WriteRowsEvent", log_pos=gno * 100 + 20, schema="db1",
            table="tbl", timestamp=1700000000 + gno,
            rows=[{"values": {"id": vid, "name": f"n{vid}"}}],
        )

    server = FakeReplicationServer()
    server.append_tx(SID, 1, tx(1, [ins(1, 1)]))
    server.append_tx(SID, 2, tx(2, [ins(2, 2)]))
    monkeypatch.setattr(fake, "SERVER", server)

    bridge = FileBridge(str(tmp_path / "spool"))
    b1 = MySQLBinlogBridge()
    assert b1.tail(spark, bridge, connection_settings={"host": "h"}) == 2
    assert server.dump_requests[-1]["auto_position"] is None  # fresh
    assert b1.position() == f"{SID}:1-2"

    # crash/restart: a new tx lands; the resumed bridge reconnects
    # with its executed set and the server skips tx1/tx2 on the wire
    server.append_tx(SID, 3, tx(3, [ins(3, 3)]))
    b2 = MySQLBinlogBridge(resume_from=GtidSet.from_str(b1.position()))
    assert b2.tail(spark, bridge, connection_settings={"host": "h"}) == 1
    assert server.dump_requests[-1]["auto_position"] == f"{SID}:1-2"
    assert b2.position() == f"{SID}:1-3"

    # the spool holds each row exactly once across both connections
    rows = (spark.read.schema(WIRE_SCHEMA)
            .parquet(str(tmp_path / "spool") + "/*")
            .filter("op = 'i'").orderBy("seq").collect())
    assert [r["gno"] for r in rows] == [1, 2, 3]


# ---------------------------------------------------------------------------
# Oracle LogMiner side: recorded SCN-window poll results drive
# OracleLogMinerBridge.tail the same way (log_miner.go:238-255 poll ->
# per-tx commit cache -> wire rows).
# ---------------------------------------------------------------------------


def _lm(scn, code, xid="x1", redo=None, owner="TEST", table="T1"):
    """A poll row tuple in LOGMINER_POLL_COLUMNS order."""
    return (scn, owner, table, redo, None, code, xid, None)


def test_oracle_tail_recorded_windows(spark, tmp_path):
    import json

    from dtle_spark.sources.cdc_bridge import OracleLogMinerBridge

    bridge = FileBridge(str(tmp_path / "spool"))
    b = OracleLogMinerBridge(
        "ora1", {("TEST", "T1"): ["COL1", "COL2"]}
    )
    windows = [
        [   # window 1: one committed tx (insert + update)
            _lm(100, 6),
            _lm(101, 1, redo='insert into "TEST"."T1"("COL1","COL2") values (\'1\',\'a\')'),
            _lm(102, 3, redo='update "TEST"."T1" set "COL2" = \'b\' where "COL1" = \'1\''),
            _lm(103, 7),
        ],
        [   # window 2: a rolled-back tx — publishes NOTHING
            _lm(110, 6, xid="x2"),
            _lm(111, 1, xid="x2",
                redo='insert into "TEST"."T1"("COL1","COL2") values (\'9\',\'z\')'),
            _lm(112, 36, xid="x2"),
        ],
        [   # window 3: DDL (emits immediately, translated to MySQL)
            _lm(120, 5, redo='ALTER TABLE "TEST"."T1" ADD ("COL3" NUMBER(10))'),
        ],
    ]
    assert b.tail(spark, bridge, windows=windows) == 2  # window 2 silent

    batch = (spark.read.schema(WIRE_SCHEMA)
             .parquet(str(tmp_path / "spool") + "/*").orderBy("seq").collect())
    assert [r["op"] for r in batch] == ["i", "u", "ddl"]
    assert all(r["sid"] == "ora1" for r in batch)
    # DML carries the COMMIT scn as gno; seq is each record's scn
    assert [(r["gno"], r["seq"]) for r in batch[:2]] == [(103, 101), (103, 102)]
    assert json.loads(batch[0]["after"]) == {"COL1": "1", "COL2": "a"}
    # the rolled-back insert (COL1='9') never surfaced
    assert all(r["after"] is None or json.loads(r["after"]).get("COL1") != "9"
               for r in batch)
    # DDL translated to MySQL dialect (S10)
    assert batch[2]["query"].lower().startswith("alter table")
    assert "col3" in batch[2]["query"].lower()


def test_oracle_tail_without_windows_or_library_raises():
    from dtle_spark.sources.cdc_bridge import OracleLogMinerBridge

    with pytest.raises(NotImplementedError):
        OracleLogMinerBridge("ora1", {}).tail()


# ---------------------------------------------------------------------------
# Kafka producer side: a subscription's frames drain through
# produce_frames against a recording producer with kafka-python's
# public surface (send/flush) — the third transport seam under contract.
# ---------------------------------------------------------------------------


class FakeProducer:
    def __init__(self):
        self.sent: list[tuple[str, bytes | None, bytes | None]] = []
        self.flushes = 0

    def send(self, topic, value=None, key=None):
        self.sent.append((topic, key, value))

    def flush(self):
        self.flushes += 1


def test_produce_frames_contract(spark, tmp_path):
    """Wire rows -> subscription envelopes -> producer: tombstones
    arrive as value=None, keys/values as utf-8 bytes, ordered by
    __batch, one flush per drain; replaying the drained frames is the
    CALLER's dedupe (at-least-once, as in the reference)."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.sinks.debezium import produce_frames
    from dtle_spark.streaming.jobs import JobManager

    def wire_row(seq, op, after=None, before=None):
        return Row(sid=SID, gno=seq, seq=seq, lc=0, op=op, ts=None,
                   schema_name="db1", table_name="t",
                   before=before, after=after, query=None)

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        wire_row(1, "i", after='{"id":1,"v":10}'),
        wire_row(2, "d", before='{"id":1,"v":10}'),
    ]
    spark.createDataFrame(rows, WIRE_SCHEMA).coalesce(1).write.parquet(f"{src}/b0")
    cat = SchemaCatalog()
    cat.register("db1", "t", T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]),
        ["id"])
    mgr = JobManager(spark)
    sj = mgr.create_subscription(
        JobConfig("prod1", [TableConfig("db1", "t", unique_key=["id"])]),
        f"{src}/*", str(tmp_path / "out"), str(tmp_path / "ckpt"), cat,
    )
    sj.process_available()
    mgr.pause("prod1")

    p = FakeProducer()
    n = produce_frames(sj.frames(), p)
    assert n == 3 == len(p.sent)  # create + delete + tombstone
    assert p.flushes == 1
    assert all(t == "dtle.db1.t" for t, _, _ in p.sent)
    assert all(k == b'{"id":1}' for _, k, _ in p.sent)
    vals = [v for _, _, v in p.sent]
    # EXACT send order: the insert envelope, then the delete envelope,
    # then its tombstone — same-key frames within one micro-batch ride
    # (__seq, __sub), so a non-stable sort can never send the delete
    # before the insert (log compaction would resurrect the key)
    import json as _json

    assert _json.loads(vals[0])["op"] == "c"
    assert _json.loads(vals[1])["op"] == "d"
    assert vals[2] is None


def test_produce_frames_enforces_bound(spark):
    from dtle_spark.sinks.debezium import produce_frames

    frames = spark.createDataFrame(
        [("t1", "k", "v")] * 7, "topic string, key string, value string")
    with pytest.raises(RuntimeError, match="flow-control bound"):
        produce_frames(frames, FakeProducer(), max_rows=5, order_cols=())


def test_produce_frames_requires_order_cols(spark):
    """Missing order columns fail loud (a silent degrade to partition
    order can send a delete before its insert — compaction resurrects
    the key); order_cols=() is the explicit opt-out."""
    from dtle_spark.sinks.debezium import produce_frames

    frames = spark.createDataFrame(
        [("t1", "k", "v")], "topic string, key string, value string")
    with pytest.raises(ValueError, match="order column"):
        produce_frames(frames, FakeProducer())
    assert produce_frames(frames, FakeProducer(), order_cols=()) == 1


def test_kafka_producer_constructor_gated():
    from dtle_spark.sinks.debezium import kafka_producer

    with pytest.raises(NotImplementedError, match="kafka-python"):
        kafka_producer("localhost:9092")


def test_produce_frames_live_api_compaction_end_state(spark, tmp_path):
    """The drain against a BEHAVIORAL kafka-python fake (async send
    returning futures, delivery only at flush, broker offsets, log
    compaction — tests/kafka_fake.py), not a call transcript: the
    semantic the sink must guarantee is that after Kafka compacts the
    topic, per-key state equals the applied table — updated keys hold
    their last envelope, deleted keys are GONE (tombstone last), and
    an at-least-once REDELIVERY of the same drain converges to the
    identical compacted state. Also pins the flush barrier: nothing
    is on the broker before flush (kafka3.go:684-1063 waits on
    delivery; flush is that wait)."""
    import json as _json
    import os

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.sinks.debezium import produce_frames
    from dtle_spark.streaming.jobs import JobManager
    from tests.kafka_fake import FakeBroker, FakeKafkaProducer

    def wire_row(seq, op, after=None, before=None):
        return Row(sid=SID, gno=seq, seq=seq, lc=0, op=op, ts=None,
                   schema_name="db1", table_name="t",
                   before=before, after=after, query=None)

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        wire_row(1, "i", after='{"id":1,"v":10}'),
        wire_row(2, "i", after='{"id":2,"v":20}'),
        wire_row(3, "u", before='{"id":1,"v":10}', after='{"id":1,"v":11}'),
        wire_row(4, "d", before='{"id":2,"v":20}'),
    ]
    spark.createDataFrame(rows, WIRE_SCHEMA).coalesce(1).write.parquet(f"{src}/b0")
    cat = SchemaCatalog()
    cat.register("db1", "t", T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]),
        ["id"])
    mgr = JobManager(spark)
    sj = mgr.create_subscription(
        JobConfig("live1", [TableConfig("db1", "t", unique_key=["id"])]),
        f"{src}/*", str(tmp_path / "out"), str(tmp_path / "ckpt"), cat,
    )
    sj.process_available()
    mgr.pause("live1")
    frames = sj.frames().localCheckpoint()  # drained twice below

    broker = FakeBroker()
    p = FakeKafkaProducer(broker)
    fut = p.send("probe", value=b"x", key=b"k")  # async: not delivered
    assert broker.log("probe") == [] and not fut.is_done()
    p.flush()
    assert fut.get().offset == 0  # delivered by the flush barrier

    n = produce_frames(frames, p)
    # i + i + u + d + tombstone
    assert n == 5
    log = broker.log("dtle.db1.t")
    assert len(log) == 5  # all delivered: produce_frames flushed

    state = broker.compacted("dtle.db1.t")
    assert set(state) == {b'{"id":1}'}  # id=2 tombstoned away
    last = _json.loads(state[b'{"id":1}'])
    assert last["op"] == "u" and last["after"] == {"id": 1, "v": 11}

    # at-least-once: redeliver the SAME drain; compaction converges
    produce_frames(frames, p)
    again = broker.compacted("dtle.db1.t")
    assert again == state
    assert len(broker.log("dtle.db1.t")) == 10

    p.close()
    with pytest.raises(RuntimeError, match="closed producer"):
        p.send("dtle.db1.t", value=b"x")


def test_subscription_full_lifecycle_contract(spark, tmp_path):
    """One scenario, the whole reference flow (kafka3.go + job.go):
    recorded binlog events -> MySQLBinlogBridge spool -> SubscriptionJob
    with a MID-STREAM DDL, a pause/resume boundary, finish() drain, and
    the producer contract at the end — asserting global frame order
    ((__batch, __seq, __sub)), schema-change frame PLACEMENT (between
    the pre- and post-DDL row frames), evolved post-DDL images, and
    the finished state."""
    import json as _json
    import os

    from pyspark.sql import types as T

    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.sinks.debezium import produce_frames
    from dtle_spark.sources.cdc_bridge import FileBridge, MySQLBinlogBridge
    from dtle_spark.streaming.subscription import SubscriptionJob

    sid = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"

    def gtid(gno):
        return {"type": "gtid", "sid": sid, "gno": gno,
                "last_committed": 0, "sequence_number": gno}

    def q(query, pos):
        return {"type": "query", "schema": "db1", "query": query,
                "log_pos": pos, "timestamp": 1600000000}

    def rows(op, rws, pos):
        return {"type": "rows", "op": op, "schema": "db1", "table": "t1",
                "rows": rws, "log_pos": pos, "timestamp": 1600000000}

    spool = str(tmp_path / "spool")
    bridge = FileBridge(spool)
    mysql = MySQLBinlogBridge()
    # chunk 1: an insert tx (pre-DDL world)
    mysql.publish(spark, bridge, [
        gtid(1), q("BEGIN", 10),
        rows("insert", [{"id": 1, "v": "a"}], 20),
        {"type": "xid", "xid": 1, "log_pos": 30},
    ])

    cat = SchemaCatalog()
    cat.register("db1", "t1", T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]),
        ["id"])
    sj = SubscriptionJob(
        spark, JobConfig("lifec", [TableConfig("db1", "t1", unique_key=["id"])]),
        spool + "/*", str(tmp_path / "out"), str(tmp_path / "ckpt"), cat,
    ).start()
    sj.process_available()
    sj.pause()
    assert sj.query is None  # paused

    # chunk 2 lands WHILE PAUSED: DDL barrier, then a post-DDL insert
    # carrying the new column
    mysql.publish(spark, bridge, [
        gtid(2),
        q("ALTER TABLE db1.t1 ADD COLUMN c BIGINT", 40),
        q("BEGIN", 50),
        rows("insert", [{"id": 2, "v": "b", "c": 7}], 60),
        {"type": "xid", "xid": 2, "log_pos": 70},
    ])
    sj.resume()
    sj.process_available()

    # catalog evolved through the stream, and the snapshot persisted
    assert [f.name for f in cat.get("db1", "t1").schema.fields] == ["id", "v", "c"]
    assert os.path.exists(sj.catalog_path)

    # chunk 3: a delete, then graceful finish (drain-then-stop)
    mysql.publish(spark, bridge, [
        gtid(3), q("BEGIN", 80),
        rows("delete", [{"id": 1, "v": "a", "c": None}], 90),
        {"type": "xid", "xid": 3, "log_pos": 100},
    ])
    sj.finish()
    assert sj.wait_finished()
    st = sj.stats()
    assert st["job_status"] == "target_gtid_finished" and not st["active"]

    # drain through the producer contract: global (__batch,__seq,__sub)
    p = FakeProducer()
    n = produce_frames(sj.frames(), p)
    assert n == st["frames"] == len(p.sent)
    sent = p.sent
    # placement: insert(id=1) -> schema-change -> insert(id=2) ->
    # delete(id=1) -> tombstone(id=1)
    kinds = []
    for topic, key, val in sent:
        if topic == "schema-changes.dtle":
            kinds.append("ddl")
        elif val is None:
            kinds.append("tomb")
        else:
            kinds.append(_json.loads(val)["op"])
    assert kinds == ["c", "ddl", "c", "d", "tomb"], kinds
    # the DDL frame carries the statement; post-DDL image carries c
    ddl_val = _json.loads(sent[1][2])
    assert ddl_val["ddl"].startswith("ALTER TABLE")
    post = _json.loads(sent[2][2])
    assert post["after"] == {"id": 2, "v": "b", "c": 7}
    pre = _json.loads(sent[0][2])
    assert pre["after"] == {"id": 1, "v": "a"}  # pre-DDL: no c field
    # delete + tombstone share the key; tombstone strictly after
    assert sent[3][1] == sent[4][1] == b'{"id":1}'
