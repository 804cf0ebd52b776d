"""Manifest-atomic commit protocol: a crash at ANY point before the
manifest rename leaves the previous table state fully readable, and a
replay converges — the jar-free Delta-log analogue closing the
rename-swap crash window (reference guarantee: applier tx atomicity,
driver/mysql/applier_incr.go:565-570)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dtle_spark.plans import cdc_demo
from dtle_spark.sinks import manifest as mf
from dtle_spark.sinks.manifest import TableManifest
from dtle_spark.sinks.table_sink import BucketedTableTarget, ParquetTableTarget
from tests.conftest import SF_DIR, assert_matches_oracle


class Boom(RuntimeError):
    pass


def _crash_on_save(monkeypatch):
    """Make the NEXT manifest save (the commit point) crash."""
    real = TableManifest.save

    def dying(self, table_dir):
        monkeypatch.setattr(TableManifest, "save", real)
        raise Boom("crash before manifest rename")

    monkeypatch.setattr(TableManifest, "save", dying)


def test_whole_table_crash_before_manifest_keeps_old_state(spark, tmp_path, monkeypatch):
    t = ParquetTableTarget(str(tmp_path / "tgt"))
    base = cdc_demo.orders_base(spark, SF_DIR)
    t.overwrite(base, "db1", "orders")
    n0 = t.read(spark, "db1", "orders").count()

    # crash mid-commit: staged image already moved in, manifest not swapped
    smaller = base.limit(10)
    staged = t.stage(smaller, "db1", "orders")
    _crash_on_save(monkeypatch)
    with pytest.raises(Boom):
        t.commit(staged, "db1", "orders")

    # reader still resolves the OLD manifest -> old state, unharmed
    assert t.read(spark, "db1", "orders").count() == n0

    # replay (the foreachBatch retry): a fresh stage+commit wins and the
    # orphaned move-in from the crashed attempt is collected
    t.overwrite(smaller, "db1", "orders")
    assert t.read(spark, "db1", "orders").count() == 10
    tdir = t.path("db1", "orders")
    # live = current manifest + every RETAINED time-travel version
    # (the crashed attempt's orphaned move-in must NOT be among them)
    live = set(TableManifest.load(tdir).entries.values())
    for v in TableManifest.versions(tdir):
        live.update(TableManifest.load_version(tdir, v).entries.values())
    assert not [
        n
        for n in os.listdir(tdir)
        if n not in (mf.MANIFEST_NAME, mf.HISTORY_DIR) and n not in live
        and not n.startswith("_WRITER_LEASE")  # lease control files persist
    ]


def test_bucketed_crash_before_manifest_keeps_old_state_then_converges(
    spark, duck, tmp_path, monkeypatch
):
    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=16)
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    t.seed(base, "db1", "orders", ["o_orderkey"])
    n0 = t.read(spark, "db1", "orders").count()
    m0 = TableManifest.load(t.table_dir("db1", "orders")).entries

    first = changes.filter(F.col("seq") < 8000)
    _, commit_fn = t.stage_merge(spark, first, "db1", "orders", ["o_orderkey"])
    _crash_on_save(monkeypatch)
    with pytest.raises(Boom):
        commit_fn()  # dies after move-ins, before the manifest rename

    # old manifest still live: table reads exactly as before the merge
    assert TableManifest.load(t.table_dir("db1", "orders")).entries == m0
    assert t.read(spark, "db1", "orders").count() == n0

    # replay the batch (at-least-once semantics), then the rest: the
    # seq-versioned merge converges to the oracle despite the crash
    t.merge(spark, first, "db1", "orders", ["o_orderkey"])
    t.merge(
        spark, changes.filter(F.col("seq") >= 8000), "db1", "orders", ["o_orderkey"]
    )
    assert_matches_oracle(
        t.read(spark, "db1", "orders"), duck, cdc_demo.ORDERS_CDC_ORACLE
    )
    # crashed attempt's orphans were collected by the later commits;
    # what remains beyond the live entries is exactly the retained
    # time-travel versions' bucket dirs
    tdir = t.table_dir("db1", "orders")
    live = set(TableManifest.load(tdir).entries.values())
    for v in TableManifest.versions(tdir):
        live.update(TableManifest.load_version(tdir, v).entries.values())
    assert not [
        n
        for n in os.listdir(tdir)
        if n not in (mf.MANIFEST_NAME, mf.HISTORY_DIR) and n not in live
        and not n.startswith("_WRITER_LEASE")  # lease control files persist
    ]


def test_stage_merge_invisible_until_commit(spark, tmp_path):
    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=16)
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    t.seed(base, "db1", "orders", ["o_orderkey"])
    n0 = t.read(spark, "db1", "orders").count()

    touched, commit_fn = t.stage_merge(spark, changes, "db1", "orders", ["o_orderkey"])
    assert touched  # work was staged...
    assert t.read(spark, "db1", "orders").count() == n0  # ...but invisible
    commit_fn()
    assert t.read(spark, "db1", "orders").count() != n0


def test_seq_watermark_commits_atomically_with_data(spark, tmp_path):
    """No-PK replay guard lives in the manifest: the same rename that
    publishes the data publishes the watermark."""
    t = ParquetTableTarget(str(tmp_path / "tgt"))
    df = cdc_demo.orders_base(spark, SF_DIR).limit(5)
    staged = t.stage(df, "db1", "t")
    t.commit(staged, "db1", "t", seq_watermark={"sid-1": 42})
    assert t.seq_watermark("db1", "t") == {"sid-1": 42}
    # a later commit without a watermark keeps the old one
    t.overwrite(df, "db1", "t")
    assert t.seq_watermark("db1", "t") == {"sid-1": 42}


def test_default_replication_target_is_bucketed(spark, tmp_path):
    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.streaming.pipeline import ReplicationJob

    rj = ReplicationJob(
        spark,
        JobConfig("j", [TableConfig("db1", "orders", unique_key=["o_orderkey"])]),
        str(tmp_path / "src"),
        str(tmp_path / "tgt"),
        str(tmp_path / "ckpt"),
        SchemaCatalog(),
    )
    assert isinstance(rj.target, BucketedTableTarget)


def test_time_travel_reads_past_versions(spark, tmp_path):
    """Every commit retains its manifest; read_at_version reproduces
    the exact post-batch states (VERSION AS OF analogue) while data
    dirs stay immutable."""
    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=8)
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    t.seed(base, "db1", "orders", ["o_orderkey"])
    snapshots = {}
    v = t.versions("db1", "orders")[-1]
    snapshots[v] = t.read(spark, "db1", "orders").count()
    for lo, hi in [(0, 6000), (6000, 12000)]:
        batch = changes.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        t.merge(spark, batch, "db1", "orders", ["o_orderkey"])
        v = t.versions("db1", "orders")[-1]
        snapshots[v] = t.read(spark, "db1", "orders").count()
    assert len(snapshots) == 3
    for v, expected in snapshots.items():
        got = t.read_at_version(spark, "db1", "orders", v)
        assert got is not None and got.count() == expected, v
    # distinct states across versions (the change stream deletes rows)
    assert len(set(snapshots.values())) > 1


def test_time_travel_retention_prunes_and_gc_protects(spark, tmp_path):
    """Versions beyond the retention window stop resolving and their
    exclusive data dirs are collected; every RETAINED version keeps
    resolving even after later commits rewrote its buckets."""
    t = ParquetTableTarget(str(tmp_path / "tgt"))
    df = cdc_demo.orders_base(spark, SF_DIR)
    counts = {}
    for n in (20, 15, 10, 5, 2):
        t.overwrite(df.limit(n), "db1", "t")
        counts[t.versions("db1", "t")[-1]] = n
    vs = t.versions("db1", "t")
    assert len(vs) == mf.RETAIN_VERSIONS  # pruned to the window
    for v in vs:
        got = t.read_at_version(spark, "db1", "t", v)
        assert got is not None and got.count() == counts[v], v
    pruned = sorted(set(counts) - set(vs))
    assert pruned and all(
        t.read_at_version(spark, "db1", "t", v) is None for v in pruned
    )
    # GC: only dirs referenced by retained versions remain on disk
    tdir = t.path("db1", "t")
    live = set()
    for v in vs:
        live.update(TableManifest.load_version(tdir, v).entries.values())
    on_disk = {
        n for n in os.listdir(tdir) if n not in (mf.MANIFEST_NAME, mf.HISTORY_DIR)
        and not n.startswith("_WRITER_LEASE")
    }
    assert on_disk == live


def test_append_guard_and_segment_compaction(spark, tmp_path):
    """append() refuses key-bucketed tables; for append-only tables,
    compact_segments folds many segments into one entry atomically,
    preserving content, watermark, and pre-compaction time travel."""
    t = ParquetTableTarget(str(tmp_path / "tgt"))
    df = cdc_demo.orders_base(spark, SF_DIR).limit(40)
    parts = [df.filter(F.col("o_orderkey") % 5 == i) for i in range(5)]
    for i, p in enumerate(parts):
        t.append(p, "db1", "seg", seq_watermark={"b": i})
    tdir = t.path("db1", "seg")
    m = TableManifest.load(tdir)
    assert len(m.entries) == 5
    total = t.read(spark, "db1", "seg").count()
    pre_version = m.version

    # below threshold: no-op
    assert t.compact_segments(spark, "db1", "seg", max_segments=16) == 0
    # above: folds all five into one
    assert t.compact_segments(spark, "db1", "seg", max_segments=3) == 5
    m2 = TableManifest.load(tdir)
    assert list(m2.entries) == ["_table"]
    assert t.read(spark, "db1", "seg").count() == total
    assert t.seq_watermark("db1", "seg") == {"b": 4}
    # pre-compaction version still resolves (time travel)
    past = t.read_at_version(spark, "db1", "seg", pre_version)
    assert past is not None and past.count() == total

    # bucketed tables refuse append
    bt = BucketedTableTarget(str(tmp_path / "tgt2"), n_buckets=8)
    bt.seed(cdc_demo.orders_base(spark, SF_DIR), "db1", "orders", ["o_orderkey"])
    with pytest.raises(ValueError, match="bucketed"):
        bt.append(df, "db1", "orders")


class TestManifestModelProperty:
    """Model-based property test: arbitrary interleavings of
    append / overwrite / compact / CRASHED-append must keep the
    readable table equal to a trivial in-memory model, with versions
    strictly monotonic. The pointwise crash tests pin single
    scenarios; this sweeps sequences."""

    def test_random_action_sequences(self, spark, tmp_path, monkeypatch):
        import itertools
        import random

        rng = random.Random(2024)
        next_id = itertools.count(1)

        def fresh_rows(k):
            return [next(next_id) for _ in range(k)]

        for trial in range(6):
            t = ParquetTableTarget(str(tmp_path / f"m{trial}"))
            model: list[int] = []
            last_version = 0
            n_actions = rng.randint(3, 7)
            for _ in range(n_actions):
                action = rng.choice(["append", "append", "overwrite", "compact", "crash"])
                if action == "append":
                    rows = fresh_rows(rng.randint(1, 4))
                    df = spark.createDataFrame([(r,) for r in rows], "id long")
                    t.append(df, "db", "t")
                    model.extend(rows)
                elif action == "overwrite":
                    rows = fresh_rows(rng.randint(1, 4))
                    df = spark.createDataFrame([(r,) for r in rows], "id long")
                    t.overwrite(df, "db", "t")
                    model = list(rows)
                elif action == "compact":
                    t.compact_segments(spark, "db", "t", max_segments=1)
                elif action == "crash":
                    rows = fresh_rows(2)
                    df = spark.createDataFrame([(r,) for r in rows], "id long")
                    _crash_on_save(monkeypatch)
                    with pytest.raises(Boom):
                        t.append(df, "db", "t")
                    # model unchanged: the commit never happened
                got = t.read(spark, "db", "t")
                got_ids = sorted(r["id"] for r in got.collect()) if got is not None else []
                assert got_ids == sorted(model), (trial, action)
                m = TableManifest.load(t.path("db", "t"))
                if m is not None:
                    assert m.version > last_version or (
                        action in ("crash", "compact") and m.version == last_version
                    )
                    last_version = m.version


def test_purge_keys_hard_deletes_and_severs_history(spark, tmp_path):
    """purge_keys (takedown): matching rows vanish physically, only
    segments CONTAINING matches are rewritten (untouched dirs shared
    byte-for-byte), one manifest swap commits it, the seq watermark
    rides untouched, and time travel across the purge is severed —
    older retained versions (which still resolve the pre-purge rows)
    are dropped and their dirs GC'd. A 0-hit call still severs
    (idempotent crash completion)."""
    t = ParquetTableTarget(str(tmp_path))
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, f"d{b}-{i}") for i in range(4)], "id long, v string"
        )
        t.append(df, "s", "docs", seq_watermark={"__wm": b})
    p = t.path("s", "docs")
    m0 = TableManifest.load(p)
    assert len(m0.entries) == 3 and len(TableManifest.versions(p)) == 3

    keys = spark.createDataFrame([(10,), (12,)], "id long")  # segment 1 only
    assert t.purge_keys(spark, "s", "docs", "id", keys) == 2
    got = {r["id"] for r in t.read(spark, "s", "docs").collect()}
    assert got == {0, 1, 2, 3, 11, 13, 20, 21, 22, 23}
    m1 = TableManifest.load(p)
    # untouched segments share their dirs; only segment 1 was rewritten
    shared = set(m0.entries.values()) & set(m1.entries.values())
    assert len(shared) == 2
    assert any(e.startswith("purged-") for e in m1.entries.values())
    # watermark preserved, history severed to the purge version only
    assert m1.seq_watermark == {"__wm": 2}
    assert TableManifest.versions(p) == [m1.version]
    # pre-purge dirs are gone from disk (not just unreferenced)
    for d in set(m0.entries.values()) - shared:
        assert not os.path.exists(os.path.join(p, d))
    # the purged rows resolve through NO retained version
    for v in TableManifest.versions(p):
        back = t.read_at_version(spark, "s", "docs", v)
        assert not {10, 12} & {r["id"] for r in back.collect()}

    # 0-hit purge: nothing rewritten, history still severed (one version)
    t.append(spark.createDataFrame([(99, "x")], "id long, v string"), "s", "docs")
    assert len(TableManifest.versions(p)) == 2
    assert t.purge_keys(
        spark, "s", "docs", "id",
        spark.createDataFrame([(12345,)], "id long"),
    ) == 0
    assert len(TableManifest.versions(p)) == 1
    assert t.read(spark, "s", "docs").count() == 11


def test_purge_keys_issues_o_touched_jobs(spark, tmp_path):
    """The touched-segment set is found in ONE pass (input_file_name
    aggregation, keys broadcast), then only touched segments are
    rewritten — O(touched) Spark jobs, not the former count()+count()
    per segment, which at thousands of 100 TB-table segments was an
    O(N) sequential job ladder just to find the matches."""
    t = ParquetTableTarget(str(tmp_path))
    for b in range(12):
        t.append(spark.createDataFrame(
            [(b * 10 + i, f"d{b}-{i}") for i in range(4)],
            "id long, v string",
        ), "s", "docs")
    keys = spark.createDataFrame([(51,), (53,)], "id long")  # seg 5 only

    group = "purge-job-count"
    spark.sparkContext.setJobGroup(group, "count purge jobs")
    try:
        assert t.purge_keys(spark, "s", "docs", "id", keys) == 2
    finally:
        spark.sparkContext.setJobGroup(None, None)
    tracker = spark.sparkContext.statusTracker
    jobs = tracker().getJobIdsForGroup(group)
    # keys checkpoint + hit scan + one rewrite, with AQE/schema-read
    # slack (observed 9): far below the 2-per-segment (24+) the old
    # count()+count() loop issued
    assert 0 < len(jobs) <= 12, jobs
    got = {r["id"] for r in t.read(spark, "s", "docs").collect()}
    assert len(got) == 46 and not {51, 53} & got
    m = TableManifest.load(t.path("s", "docs"))
    assert sum(e.startswith("purged-") for e in m.entries.values()) == 1


def test_purge_keys_bucketed_target(spark, tmp_path):
    """purge_keys on a BUCKETED table: bucket-number manifest keys are
    preserved (only the dir value changes), unaffected buckets share
    dirs, and reads keep resolving per bucket."""
    t = BucketedTableTarget(str(tmp_path), n_buckets=4)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "id long, v string"
    )
    t.seed(df, "s", "tbl", ["id"])
    m0 = TableManifest.load(t.path("s", "tbl"))
    keys = spark.createDataFrame([(7,), (8,)], "id long")
    assert t.purge_keys(spark, "s", "tbl", "id", keys) == 2
    m1 = TableManifest.load(t.path("s", "tbl"))
    assert set(m1.entries) == set(m0.entries)  # bucket keys stable
    changed = [k for k in m0.entries if m0.entries[k] != m1.entries[k]]
    assert 1 <= len(changed) <= 2
    got = {r["id"] for r in t.read(spark, "s", "tbl").collect()}
    assert got == set(range(40)) - {7, 8}


def test_orphan_history_newer_than_live_is_ignored(tmp_path):
    """ADVICE r4: a crashed commit must never leave a resolvable
    version that never became live. New write ordering puts history
    after the live swap; for directories written by the old ordering,
    versions()/load_version ignore history entries newer than the live
    manifest."""
    import json as _json
    import os as _os

    from dtle_spark.sinks.manifest import HISTORY_DIR, TableManifest

    td = str(tmp_path / "s" / "t")
    m = TableManifest(entries={"_table": "img-a"})
    m.save(td)
    m.entries = {"_table": "img-b"}
    m.save(td)
    live = TableManifest.load(td)
    # simulate the old crash window: orphan history file one past live
    hp = _os.path.join(td, HISTORY_DIR, f"_v{live.version + 1}.json")
    ghost = TableManifest(entries={"_table": "img-ghost"}, version=live.version + 1)
    with open(hp, "w") as f:
        _json.dump(ghost._payload(), f)
    assert TableManifest.versions(td) == [1, 2]
    assert TableManifest.load_version(td, live.version + 1) is None
    # the next successful commit overwrites the orphan slot with the
    # real version N+1 and everything resolves again
    m.entries = {"_table": "img-c"}
    m.save(td)
    got = TableManifest.load_version(td, live.version + 1)
    assert got is not None and got.entries == {"_table": "img-c"}


def test_missing_history_copy_self_heals_on_next_save(tmp_path):
    """Crash after the live swap but before the history write: the
    committed version has no _v<N>.json. It still resolves through the
    live manifest, and the NEXT save retains it before overwriting."""
    import os as _os

    from dtle_spark.sinks.manifest import HISTORY_DIR, TableManifest

    td = str(tmp_path / "s" / "t")
    m = TableManifest(entries={"_table": "img-a"})
    m.save(td)
    m.entries = {"_table": "img-b"}
    m.save(td)
    live = TableManifest.load(td)
    # simulate the (new, benign) crash window: drop live's history copy
    _os.remove(_os.path.join(td, HISTORY_DIR, f"_v{live.version}.json"))
    assert TableManifest.versions(td) == [1, 2]  # still resolvable via live
    assert TableManifest.load_version(td, 2).entries == {"_table": "img-b"}
    m.entries = {"_table": "img-c"}
    m.save(td)
    # self-healed: v2 retained in history even though its copy was lost
    assert TableManifest.load_version(td, 2).entries == {"_table": "img-b"}
    assert TableManifest.versions(td) == [1, 2, 3]
