"""Multi-process job recovery: JobManager.recover() restores all jobs
from persisted specs + checkpoints after the manager (the "agent") is
gone — the driver.go:493+ StartTask/RecoverTask + Consul-state
analogue (common/store.go:40-446)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.model import JobConfig, TableConfig
from dtle_spark.plans import cdc_demo
from dtle_spark.sinks.table_sink import BucketedTableTarget, ParquetTableTarget
from dtle_spark.sources.gtid import GtidSet
from dtle_spark.streaming.jobs import (
    JobManager,
    job_config_from_dict,
    job_config_to_dict,
)
from dtle_spark.streaming.wire import WIRE_SCHEMA, to_wire
from tests.conftest import SF_DIR, assert_matches_oracle


def _orders_catalog(changes) -> SchemaCatalog:
    cat = SchemaCatalog()
    cat.register("db1", "orders", changes.schema["after"].dataType, ["o_orderkey"])
    return cat


def test_job_config_roundtrip():
    job = JobConfig(
        "j", [TableConfig("s", "t", rename_table="t2", unique_key=["id"],
                          where="id > 3")],
        trigger_seconds=2.0, local_sid="abc", tx_atomic=True,
    )
    back = job_config_from_dict(job_config_to_dict(job))
    assert back == job


def test_recover_two_jobs_converge_and_positions_survive(spark, duck, tmp_path):
    """The VERDICT r4 acceptance: create 2 jobs, feed txs, kill the
    manager object, rebuild, recover(), feed more txs — both targets
    converge to the oracle and applied positions grew monotonically."""
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    first = to_wire(changes.filter(F.col("seq") < 7000))
    second = to_wire(changes.filter(F.col("seq") >= 7000))

    spec_root = str(tmp_path / "specs")
    dirs = {}
    for j in ("j1", "j2"):
        dirs[j] = {
            "source": str(tmp_path / j / "src"),
            "target": str(tmp_path / j / "tgt"),
            "checkpoint": str(tmp_path / j / "ckpt"),
        }
        os.makedirs(dirs[j]["source"])
        first.coalesce(1).write.parquet(os.path.join(dirs[j]["source"], "b0"))
        BucketedTableTarget(dirs[j]["target"]).seed(
            base, "db1", "orders", ["o_orderkey"]
        )

    mgr = JobManager(spark, spec_root=spec_root)
    for j in ("j1", "j2"):
        mgr.create(
            JobConfig(j, [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
            os.path.join(dirs[j]["source"], "*"),
            dirs[j]["target"],
            dirs[j]["checkpoint"],
            _orders_catalog(changes),
        )
        mgr.get(j).process_available()
    paused_pos = {j: mgr.position(j)["gtid_set"] for j in ("j1", "j2")}
    assert all(paused_pos.values())
    # kill the manager: stop the queries, drop every in-memory handle
    for j in ("j1", "j2"):
        mgr.pause(j)
    del mgr

    # fresh manager, same spec dir — the restarted-agent path
    mgr2 = JobManager(spark, spec_root=spec_root)
    assert sorted(mgr2.recover()) == ["j1", "j2"]
    for j in ("j1", "j2"):
        second.coalesce(1).write.parquet(os.path.join(dirs[j]["source"], "b1"))
        mgr2.get(j).process_available()
        mgr2.pause(j)
        final = ParquetTableTarget(dirs[j]["target"]).read(spark, "db1", "orders")
        assert_matches_oracle(final, duck, cdc_demo.ORDERS_CDC_ORACLE)
        # position survived the restart and grew
        pos = mgr2.position(j)["gtid_set"]
        assert GtidSet.from_str(pos).contains_set(GtidSet.from_str(paused_pos[j]))


def test_recover_uses_post_ddl_catalog_snapshot(spark, tmp_path):
    """Mid-stream DDL before the restart: the recovered job must parse
    post-restart rows with the EVOLVED schema (checkpoint catalog.json
    snapshot), not the create-time one — checkpointed batches never
    replay, so their DDL effects must persist outside the stream."""

    def wire_row(seq, op, after=None, query=None):
        return Row(
            sid="5ec1ab1e-0000-1111-2222-333333333333", gno=seq, seq=seq, lc=0,
            op=op, ts=None, schema_name="db1", table_name="t",
            before=None, after=after, query=query,
        )

    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = [
        wire_row(1, "i", '{"id":1,"v":10}'),
        wire_row(2, "ddl", None, "ALTER TABLE db1.t ADD COLUMN note varchar(32)"),
        wire_row(3, "i", '{"id":2,"v":20,"note":"pre-restart"}'),
    ]
    spark.createDataFrame(b0, WIRE_SCHEMA).coalesce(1).write.parquet(f"{src}/b0")

    cat = SchemaCatalog()
    cat.register(
        "db1", "t",
        T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]),
        ["id"],
    )
    spec_root = str(tmp_path / "specs")
    mgr = JobManager(spark, spec_root=spec_root)
    mgr.create(
        JobConfig("dj", [TableConfig("db1", "t", unique_key=["id"])]),
        f"{src}/*", str(tmp_path / "tgt"), str(tmp_path / "ckpt"), cat,
    )
    mgr.get("dj").process_available()
    mgr.pause("dj")
    del mgr, cat

    mgr2 = JobManager(spark, spec_root=spec_root)
    assert mgr2.recover() == ["dj"]
    # recovered catalog carries the added column
    rj = mgr2.get("dj")
    assert [f.name for f in rj.catalog.get("db1", "t").schema.fields] == [
        "id", "v", "note",
    ]
    b1 = [wire_row(4, "i", '{"id":3,"v":30,"note":"post-restart"}')]
    spark.createDataFrame(b1, WIRE_SCHEMA).coalesce(1).write.parquet(f"{src}/b1")
    rj.process_available()
    mgr2.pause("dj")
    final = {
        r["id"]: r
        for r in ParquetTableTarget(str(tmp_path / "tgt")).read(spark, "db1", "t").collect()
    }
    assert set(final) == {1, 2, 3}
    assert final[1]["note"] is None
    assert final[2]["note"] == "pre-restart"
    assert final[3]["note"] == "post-restart"


def test_delete_removes_spec_so_recover_skips_it(spark, tmp_path):
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    spec_root = str(tmp_path / "specs")
    src = str(tmp_path / "src")
    os.makedirs(src)
    to_wire(changes.filter(F.col("seq") < 100)).coalesce(1).write.parquet(f"{src}/b0")
    mgr = JobManager(spark, spec_root=spec_root)
    mgr.create(
        JobConfig("gone", [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
        f"{src}/*", str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
        _orders_catalog(changes), start=False,
    )
    assert os.path.exists(os.path.join(spec_root, "gone.json"))
    mgr.delete("gone")
    assert not os.path.exists(os.path.join(spec_root, "gone.json"))
    mgr2 = JobManager(spark, spec_root=spec_root)
    assert mgr2.recover() == []


def test_recover_subscription_job(spark, tmp_path):
    """Subscription jobs recover too: spec carries type=subscription,
    recover() rebuilds the frames pipeline and resumes from its
    checkpoint (no frame duplication)."""
    from pyspark.sql import Row as _Row

    from dtle_spark.streaming.wire import WIRE_SCHEMA

    def wire_row(seq, op, after=None, query=None):
        return _Row(
            sid="cd34ef56-0000-1111-2222-333333333333", gno=seq, seq=seq, lc=0,
            op=op, ts=None, schema_name="db1", table_name="t",
            before=None, after=after, query=query,
        )

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [wire_row(1, "i", '{"id":1,"v":10}')], WIRE_SCHEMA
    ).coalesce(1).write.parquet(f"{src}/b0")

    cat = SchemaCatalog()
    cat.register(
        "db1", "t",
        T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]),
        ["id"],
    )
    spec_root = str(tmp_path / "specs")
    mgr = JobManager(spark, spec_root=spec_root)
    sj = mgr.create_subscription(
        JobConfig("sub-r", [TableConfig("db1", "t", unique_key=["id"])]),
        f"{src}/*", str(tmp_path / "out"), str(tmp_path / "ckpt"), cat,
    )
    sj.process_available()
    n1 = sj.frames().count()
    assert n1 == 1
    mgr.pause("sub-r")
    del mgr, sj

    mgr2 = JobManager(spark, spec_root=spec_root)
    assert mgr2.recover() == ["sub-r"]
    sj2 = mgr2.get("sub-r")
    assert mgr2.list()["sub-r"]["job_type"] == "subscription"
    spark.createDataFrame(
        [wire_row(2, "i", '{"id":2,"v":20}')], WIRE_SCHEMA
    ).coalesce(1).write.parquet(f"{src}/b1")
    sj2.process_available()
    mgr2.pause("sub-r")
    # old batch not re-emitted, new one appended
    assert sj2.frames().count() == 2


def test_finish_target_survives_restart(spark, tmp_path):
    """A cutover in flight survives an agent restart: the target GTID
    persists next to the checkpoint (the dtle/<job>/targetGtid Consul
    key analogue), recover() re-arms the watcher, and the job stops
    when the missing transactions finally arrive."""
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    first = to_wire(changes.filter(F.col("seq") < 7000))
    second = to_wire(changes.filter(F.col("seq") >= 7000))
    src = str(tmp_path / "src")
    os.makedirs(src)
    first.coalesce(1).write.parquet(f"{src}/b0")
    BucketedTableTarget(str(tmp_path / "tgt")).seed(
        base, "db1", "orders", ["o_orderkey"]
    )
    spec_root = str(tmp_path / "specs")
    mgr = JobManager(spark, spec_root=spec_root)
    rj = mgr.create(
        JobConfig("cut", [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
        f"{src}/*", str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
        _orders_catalog(changes),
    )
    rj.process_available()
    # target = FULL stream (second half not yet published) -> watcher
    # keeps waiting; then the "agent" dies mid-cutover
    target = GtidSet()
    for r in changes.select("sid", "gno").distinct().collect():
        target.add(r["sid"], r["gno"])
    mgr.finish("cut", target.to_str())
    import time
    time.sleep(1)
    assert not getattr(rj, "finished", False)
    mgr.pause("cut")
    del mgr, rj

    mgr2 = JobManager(spark, spec_root=spec_root)
    assert mgr2.recover() == ["cut"]
    rj2 = mgr2.get("cut")
    second.coalesce(1).write.parquet(f"{src}/b1")
    rj2.process_available()
    assert rj2.wait_finished(timeout=30)
    assert rj2.stats()["job_status"] == "target_gtid_finished"


def test_finish_survives_in_process_pause_resume(spark, tmp_path):
    """Same cutover, but the SAME job object is paused and resumed
    in-process (JobManager.update's path): pause() exits the watcher
    thread with the stopped query, while self.target_gtid stays set in
    memory — start() must re-arm from the in-memory target too, not
    only from the persisted key on a fresh object (the old gate was
    `target_gtid is None`, which silently stalled the cutover)."""
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    first = to_wire(changes.filter(F.col("seq") < 7000))
    second = to_wire(changes.filter(F.col("seq") >= 7000))
    src = str(tmp_path / "src")
    os.makedirs(src)
    first.coalesce(1).write.parquet(f"{src}/b0")
    BucketedTableTarget(str(tmp_path / "tgt")).seed(
        base, "db1", "orders", ["o_orderkey"]
    )
    mgr = JobManager(spark)
    rj = mgr.create(
        JobConfig("cut2", [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
        f"{src}/*", str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
        _orders_catalog(changes),
    )
    rj.process_available()
    target = GtidSet()
    for r in changes.select("sid", "gno").distinct().collect():
        target.add(r["sid"], r["gno"])
    mgr.finish("cut2", target.to_str())
    import time
    time.sleep(1)
    assert not getattr(rj, "finished", False)
    mgr.pause("cut2")
    # in-process resume of the SAME object; the in-memory target_gtid
    # is still set, the old watcher thread is gone
    mgr.resume("cut2")
    second.coalesce(1).write.parquet(f"{src}/b1")
    rj.process_available()
    assert rj.wait_finished(timeout=30)
    assert rj.stats()["job_status"] == "target_gtid_finished"
    mgr.pause("cut2")


def test_spec_kwargs_containers_persist_and_unserializable_rejected(spark, tmp_path):
    """Job specs must reproduce the create-time configuration on
    recover(): JSON-serializable container kwargs round-trip, and a
    non-serializable kwarg fails at create, never silently dropped."""
    import json

    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    src = str(tmp_path / "src")
    os.makedirs(src)
    to_wire(changes.limit(50)).coalesce(1).write.parquet(f"{src}/b0")
    BucketedTableTarget(str(tmp_path / "tgt")).seed(
        base, "db1", "orders", ["o_orderkey"]
    )
    spec_root = str(tmp_path / "specs")
    mgr = JobManager(spark, spec_root=spec_root)
    mgr.create(
        JobConfig("kw1", [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
        f"{src}/*", str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
        _orders_catalog(changes), start=False, max_files_per_trigger=3,
    )
    with open(os.path.join(spec_root, "kw1.json")) as f:
        assert json.load(f)["kw"] == {"max_files_per_trigger": 3}
    # a known target INSTANCE persists as its serializable descriptor
    mgr.create(
        JobConfig("kw2", [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
        f"{src}/*", str(tmp_path / "tgt2"), str(tmp_path / "ckpt2"),
        _orders_catalog(changes), start=False,
        target=ParquetTableTarget(str(tmp_path / "tgt2")),
    )
    with open(os.path.join(spec_root, "kw2.json")) as f:
        assert json.load(f)["kw"] == {"target_format": "parquet"}
    # an UNKNOWN target type is rejected loudly (a recovered job must
    # never silently run a different target than the created one)

    class WeirdTarget(ParquetTableTarget):
        pass

    with pytest.raises(ValueError, match="serializable"):
        mgr.create(
            JobConfig("kw3", [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
            f"{src}/*", str(tmp_path / "tgt3"), str(tmp_path / "ckpt3"),
            _orders_catalog(changes), start=False,
            target=WeirdTarget(str(tmp_path / "tgt3")),
        )
    assert "kw3" not in mgr.list()


def test_create_rejects_n_buckets_without_format(spark, tmp_path):
    """target_n_buckets parameterizes the RESOLVED target; without
    target_format it used to be silently dropped (the job ran an
    unbucketed default while the caller believed 64 buckets) — now a
    loud ValueError at create time."""
    import pytest

    from dtle_spark.plans import cdc_demo
    from dtle_spark.streaming.wire import to_wire

    changes = cdc_demo.orders_changes(spark, SF_DIR)
    src = str(tmp_path / "src")
    os.makedirs(src)
    to_wire(changes.limit(5)).coalesce(1).write.parquet(f"{src}/b0")
    mgr = JobManager(spark)
    with pytest.raises(ValueError, match="target_format"):
        mgr.create(
            JobConfig("nb1", [TableConfig("db1", "orders",
                                          unique_key=["o_orderkey"])]),
            f"{src}/*", str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
            _orders_catalog(changes), start=False, target_n_buckets=64,
        )
