"""Delta MERGE seam (VERDICT r5 item 4): the merge SPEC is pure data
and pins jar-free; execution tests run the SAME A1-A3 scenarios the
manifest targets pass, skipped (not stubbed) when delta-spark is
absent — on a cluster with the jars they are the contract that the
native branch behaves identically to BucketedTableTarget."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dtle_spark.model import OP_DELETE, OP_INSERT, OP_UPDATE
from dtle_spark.operators.apply import (
    DELETED_COL,
    SEQ_COL,
    dedupe_redelivered,
    latest_image_per_key,
)
from dtle_spark.sinks.delta_target import (
    DeltaTableTarget,
    merge_clauses,
    net_to_source,
)

ROW_T = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("v", T.StringType()),
])
CHANGE_T = T.StructType([
    T.StructField("sid", T.StringType()),
    T.StructField("gno", T.LongType()),
    T.StructField("seq", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("before", ROW_T),
    T.StructField("after", ROW_T),
])
SID = "11111111-1111-1111-1111-111111111111"


def _chg(gno, seq, op, before=None, after=None):
    return Row(sid=SID, gno=gno, seq=seq, op=op,
               before=None if before is None else Row(**before),
               after=None if after is None else Row(**after))


class TestMergeSpec:
    """Jar-free plan-shape pins: the exact MERGE conditions the native
    branch issues (the builder_test.go treatment of MERGE INTO)."""

    def test_clauses_golden(self):
        spec = merge_clauses(["id"])
        assert spec["condition"] == "t.`id` <=> s.`id`"
        assert spec["matched_update"] == "s.`__seq` > t.`__seq`"
        assert spec["not_matched_insert"] is None  # tombstones insert too

    def test_composite_key_null_safe(self):
        spec = merge_clauses(["a", "b"])
        assert spec["condition"] == "t.`a` <=> s.`a` AND t.`b` <=> s.`b`"

    def test_net_to_source_rows(self, spark):
        """Source projection: upserts carry the after-image; deletes
        carry key + NULL data + __deleted=true; seq rides as __seq."""
        changes = spark.createDataFrame([
            _chg(1, 10, OP_INSERT, after={"id": 1, "v": "a"}),
            _chg(2, 20, OP_UPDATE, before={"id": 1, "v": "a"},
                 after={"id": 1, "v": "b"}),
            _chg(3, 30, OP_DELETE, before={"id": 2, "v": "x"}),
        ], CHANGE_T)
        net = latest_image_per_key(dedupe_redelivered(changes), ["id"])
        src = net_to_source(net, ["id"], ROW_T)
        assert src.columns == ["id", "v", SEQ_COL, DELETED_COL]
        rows = {r["id"]: r for r in src.collect()}
        assert rows[1]["v"] == "b" and rows[1][SEQ_COL] == 20
        assert rows[1][DELETED_COL] is False
        assert rows[2]["v"] is None and rows[2][DELETED_COL] is True
        assert rows[2][SEQ_COL] == 30

    def test_pk_move_yields_two_effects(self, spark):
        """A3: an update whose images disagree on the key deletes the
        old key and upserts the new one — two MERGE source rows."""
        changes = spark.createDataFrame([
            _chg(1, 10, OP_UPDATE, before={"id": 1, "v": "a"},
                 after={"id": 9, "v": "a"}),
        ], CHANGE_T)
        net = latest_image_per_key(dedupe_redelivered(changes), ["id"])
        src = net_to_source(net, ["id"], ROW_T)
        rows = {r["id"]: r for r in src.collect()}
        assert rows[1][DELETED_COL] is True
        assert rows[9][DELETED_COL] is False and rows[9]["v"] == "a"


# ---------------------------------------------------------------------------
# Execution contract: same scenarios the manifest targets pass, through
# the real Delta MERGE. Skips without delta-spark.
# ---------------------------------------------------------------------------

@pytest.fixture()
def dspark(spark):
    # inside the fixture, not module-level: the jar-free spec pins above
    # must run everywhere
    pytest.importorskip("delta", reason="delta-spark not installed")
    if not DeltaTableTarget.available(spark):
        pytest.skip("delta jars/extensions not active in this session")
    return spark


def test_delta_merge_apply_semantics(dspark, tmp_path):
    t = DeltaTableTarget(str(tmp_path / "delta"))
    base = dspark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b")], ROW_T)
    t.seed(base, "db1", "tbl", ["id"])
    changes = dspark.createDataFrame([
        _chg(1, 10, OP_INSERT, after={"id": 3, "v": "c"}),
        _chg(2, 20, OP_UPDATE, before={"id": 1, "v": "a"},
             after={"id": 1, "v": "a2"}),
        _chg(3, 30, OP_DELETE, before={"id": 2, "v": "b"}),
    ], CHANGE_T)
    t.merge(dspark, changes, "db1", "tbl", ["id"])
    got = {r["id"]: r["v"] for r in t.read(dspark, "db1", "tbl").collect()}
    assert got == {1: "a2", 3: "c"}
    # replay: same batch is a no-op (seq does not beat itself)
    t.merge(dspark, changes, "db1", "tbl", ["id"])
    assert {r["id"]: r["v"] for r in t.read(dspark, "db1", "tbl").collect()} == got
    # tombstone guards a LATE STALE change (seq 5 < the delete's 30)
    late = dspark.createDataFrame([
        _chg(9, 5, OP_UPDATE, before={"id": 2, "v": "?"},
             after={"id": 2, "v": "zombie"}),
    ], CHANGE_T)
    t.merge(dspark, late, "db1", "tbl", ["id"])
    assert 2 not in {r["id"] for r in t.read(dspark, "db1", "tbl").collect()}


def test_delta_merge_through_pipeline_batch(dspark, tmp_path):
    """The replication batch loop drives the native branch end-to-end
    (the _merge_segment NATIVE_MERGE dispatch)."""
    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.streaming.pipeline import apply_batch
    from dtle_spark.streaming.wire import to_wire

    t = DeltaTableTarget(str(tmp_path / "delta"))
    t.seed(dspark.createDataFrame([Row(id=1, v="a")], ROW_T), "db1", "tbl", ["id"])
    cat = SchemaCatalog()
    cat.register("db1", "tbl", ROW_T, ["id"])
    changes = dspark.createDataFrame([
        _chg(1, 10, OP_INSERT, after={"id": 2, "v": "b"}),
        _chg(2, 20, OP_DELETE, before={"id": 1, "v": "a"}),
    ], CHANGE_T).withColumns({"lc": F.lit(0).cast("long"),
                              "ts": F.lit(None).cast("timestamp"),
                              "schema_name": F.lit("db1"),
                              "table_name": F.lit("tbl"),
                              "query": F.lit(None).cast("string")})
    job = JobConfig("dj", [TableConfig("db1", "tbl", unique_key=["id"])])
    apply_batch(dspark, to_wire(changes), job, t, cat)
    got = {r["id"]: r["v"] for r in t.read(dspark, "db1", "tbl").collect()}
    assert got == {2: "b"}


def test_versions_reads_delta_log_filenames(tmp_path):
    """versions() is pure filesystem (commit filenames), so the
    manager's versions route works without delta-spark."""
    import os

    t = DeltaTableTarget(str(tmp_path))
    assert t.versions("db1", "tbl") == []
    log = os.path.join(t.path("db1", "tbl"), "_delta_log")
    os.makedirs(log)
    for n in ("00000000000000000000.json", "00000000000000000001.json",
              "00000000000000000001.checkpoint.parquet", "_last_checkpoint"):
        open(os.path.join(log, n), "w").close()
    assert t.versions("db1", "tbl") == [0, 1]


def test_native_merge_target_requires_unique_key(spark, tmp_path):
    """The native branch is keyed-only: a no-PK table config fails at
    job construction, not with AttributeError mid-stream."""
    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.streaming.pipeline import ReplicationJob

    cat = SchemaCatalog()
    cat.register("db1", "t", ROW_T, [])
    with pytest.raises(ValueError, match="unique_key"):
        ReplicationJob(
            spark,
            JobConfig("nm", [TableConfig("db1", "t", unique_key=[])]),
            str(tmp_path / "src"), str(tmp_path / "tgt"),
            str(tmp_path / "ckpt"), cat,
            target=DeltaTableTarget(str(tmp_path / "tgt")),
        )
