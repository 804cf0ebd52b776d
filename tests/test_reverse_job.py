"""Bidirectional reverse workflow (reference api/handler/v2/job.go
/v2/job/reverse + reverse_start): config inversion goldens + a full
round-trip E2E — forward replicates with renames/column-map, then the
reverse job carries target-side edits back, with A11 origin filtering
stopping the echo."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.model import (
    JobConfig,
    TableConfig,
    change_schema,
    reverse_job_config,
    reverse_table_config,
)
from dtle_spark.streaming.jobs import JobManager
from dtle_spark.streaming.pipeline import ParquetTableTarget
from dtle_spark.streaming.wire import WIRE_SCHEMA


class TestReverseConfig:
    def test_plain_table_swaps_nothing(self):
        r = reverse_table_config(TableConfig("db1", "t", unique_key=["id"]))
        assert (r.schema_name, r.table_name) == ("db1", "t")
        assert r.rename_schema is None and r.rename_table is None
        assert r.unique_key == ["id"]

    def test_renames_invert(self):
        cfg = TableConfig("db1", "t", rename_schema="db2", rename_table="t9",
                          unique_key=["id"])
        r = reverse_table_config(cfg)
        assert (r.schema_name, r.table_name) == ("db2", "t9")
        assert (r.rename_schema, r.rename_table) == ("db1", "t")
        assert (r.target_schema, r.target_table) == ("db1", "t")

    def test_column_map_swaps_and_key_translates(self):
        # unique_key is in TARGET-side names (forward target: pk);
        # the reverse job's target side is the forward source (id)
        cfg = TableConfig(
            "db1", "t",
            column_map_from=["id", "v"], column_map_to=["pk", "val"],
            unique_key=["pk"],
        )
        r = reverse_table_config(cfg)
        assert r.column_map_from == ["pk", "val"]
        assert r.column_map_to == ["id", "v"]
        assert r.unique_key == ["id"]

    def test_projection_without_map_to_rejected(self):
        # the reference's conflict check (job.go:1999-2004)
        cfg = TableConfig("db1", "t", column_map_from=["id"], column_map_to=[])
        with pytest.raises(ValueError, match="can't be reversed"):
            reverse_table_config(cfg)

    def test_job_name_and_sid(self):
        job = JobConfig("j1", [TableConfig("db1", "t", unique_key=["id"])])
        rev = reverse_job_config(job, local_sid="fwd-source-sid")
        assert rev.name == "reverse-j1"
        assert rev.local_sid == "fwd-source-sid"


ROW_T = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("v", T.StringType()),
])
SID_FWD = "aaaaaaaa-0000-0000-0000-000000000001"  # forward source server
SID_TGT = "bbbbbbbb-0000-0000-0000-000000000002"  # target-side server


def _wire_rows(spark, rows):
    return spark.createDataFrame(rows, WIRE_SCHEMA)


def _chg(sid, gno, seq, op, schema, table, before=None, after=None):
    import json

    return Row(
        sid=sid, gno=gno, seq=seq, lc=0, op=op, ts=None,
        schema_name=schema, table_name=table,
        before=None if before is None else json.dumps(before),
        after=None if after is None else json.dumps(after),
        query=None,
    )


def test_reverse_round_trip_with_rename_and_origin_filter(spark, tmp_path):
    """Forward: db1.t (id,v) -> db2.t9 (pk,val). Reverse carries a
    target-side update back into db1.t, translating names back; rows
    originated by the forward source (sid match) are NOT echoed."""
    fwd_src = str(tmp_path / "fwd_src")
    rev_src = str(tmp_path / "rev_src")
    os.makedirs(fwd_src)
    os.makedirs(rev_src)

    mgr = JobManager(spark)
    fwd_cfg = TableConfig(
        "db1", "t", rename_schema="db2", rename_table="t9",
        column_map_from=["id", "v"], column_map_to=["pk", "val"],
        unique_key=["pk"],  # target-side name (merge runs post-map)
    )
    cat = SchemaCatalog()
    cat.register("db1", "t", ROW_T, ["id"])

    _wire_rows(spark, [
        _chg(SID_FWD, 1, 10, "i", "db1", "t", after={"id": 1, "v": "a"}),
        _chg(SID_FWD, 2, 20, "i", "db1", "t", after={"id": 2, "v": "b"}),
    ]).coalesce(1).write.parquet(f"{fwd_src}/b0")

    fwd = mgr.create(
        JobConfig("rt", [fwd_cfg]), f"{fwd_src}/*", str(tmp_path / "tgt_fwd"),
        str(tmp_path / "ck_fwd"), cat,
    )
    fwd.process_available()

    fwd_target = ParquetTableTarget(str(tmp_path / "tgt_fwd"))
    got = {r["pk"]: r["val"] for r in fwd_target.read(spark, "db2", "t9").collect()}
    assert got == {1: "a", 2: "b"}

    # reverse requires the forward job paused (WaitOnJob sequencing)
    with pytest.raises(ValueError, match="pause forward"):
        mgr.reverse("rt", f"{rev_src}/*", str(tmp_path / "tgt_rev"),
                    str(tmp_path / "ck_rev"), cat)
    mgr.pause("rt")

    rev_row_t = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("val", T.StringType()),
    ])
    rev_cat = SchemaCatalog()
    rev_cat.register("db2", "t9", rev_row_t, ["pk"])

    # seed the reverse target with the forward SOURCE state
    rev_target = ParquetTableTarget(str(tmp_path / "tgt_rev"))
    rev_target.overwrite(
        spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")], ROW_T),
        "db1", "t",
    )

    # target-side stream: one genuine edit (target server sid) and one
    # echo of a forward-originated tx (forward source sid) — the echo
    # must be filtered (A11)
    _wire_rows(spark, [
        _chg(SID_TGT, 3, 30, "u", "db2", "t9",
             before={"pk": 1, "val": "a"}, after={"pk": 1, "val": "edited"}),
        _chg(SID_FWD, 4, 40, "u", "db2", "t9",
             before={"pk": 2, "val": "b"}, after={"pk": 2, "val": "ECHO"}),
    ]).coalesce(1).write.parquet(f"{rev_src}/b0")

    rev = mgr.reverse(
        "rt", f"{rev_src}/*", str(tmp_path / "tgt_rev"),
        str(tmp_path / "ck_rev"), rev_cat, local_sid=SID_FWD,
    )
    assert rev.job.name == "reverse-rt"
    rev.process_available()
    mgr.pause("reverse-rt")

    back = {r["id"]: r["v"] for r in rev_target.read(spark, "db1", "t").collect()}
    assert back[1] == "edited"   # genuine target edit came back, renamed
    assert back[2] == "b"        # forward-originated echo was filtered


def test_reverse_start_orchestrates_finish_then_reverse(spark, tmp_path):
    """Round-5: the full /v2/job/reverse_start workflow — no manual
    pause. reverse_start() finishes the RUNNING forward job at its
    source frontier (targetGtid cutover), waits for
    target_gtid_finished, then derives and starts reverse-<name>
    (job.go:1836,1861-1900)."""
    fwd_src, rev_src = str(tmp_path / "fsrc"), str(tmp_path / "rsrc")
    os.makedirs(fwd_src)
    os.makedirs(rev_src)

    mgr = JobManager(spark)
    cat = SchemaCatalog()
    cat.register("db1", "t", ROW_T, ["id"])

    _wire_rows(spark, [
        _chg(SID_FWD, 1, 10, "i", "db1", "t", after={"id": 1, "v": "a"}),
        _chg(SID_FWD, 2, 20, "i", "db1", "t", after={"id": 2, "v": "b"}),
    ]).coalesce(1).write.parquet(f"{fwd_src}/b0")

    fwd = mgr.create(
        JobConfig("rs", [TableConfig("db1", "t", unique_key=["id"])]),
        f"{fwd_src}/*", str(tmp_path / "tgt_fwd"), str(tmp_path / "ck_fwd"), cat,
    )
    fwd.process_available()
    assert fwd.query is not None and fwd.query.isActive  # NOT paused

    # seed reverse target = forward source state; target-side edit waits
    rev_target = ParquetTableTarget(str(tmp_path / "tgt_rev"))
    rev_target.overwrite(
        spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")], ROW_T),
        "db1", "t",
    )
    _wire_rows(spark, [
        _chg(SID_TGT, 3, 30, "u", "db1", "t",
             before={"id": 1, "v": "a"}, after={"id": 1, "v": "edited"}),
    ]).coalesce(1).write.parquet(f"{rev_src}/b0")

    rev = mgr.reverse_start(
        "rs", f"{rev_src}/*", str(tmp_path / "tgt_rev"),
        str(tmp_path / "ck_rev"), cat, local_sid=SID_FWD,
    )
    # forward reached its target and stopped by itself
    assert fwd.stats()["job_status"] == "target_gtid_finished"
    assert not fwd.stats()["active"]
    assert rev.job.name == "reverse-rs"
    rev.process_available()
    mgr.pause("reverse-rs")
    back = {r["id"]: r["v"] for r in rev_target.read(spark, "db1", "t").collect()}
    assert back[1] == "edited" and back[2] == "b"
