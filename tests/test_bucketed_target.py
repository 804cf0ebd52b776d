"""BucketedTableTarget: per-batch merges touch only affected buckets,
final state identical to the whole-table merge path."""

from __future__ import annotations

from pyspark.sql import functions as F

from dtle_spark.plans import cdc_demo
from dtle_spark.sinks.table_sink import BucketedTableTarget
from tests.conftest import SF_DIR, assert_matches_oracle


def test_bucketed_merge_matches_oracle(spark, duck, tmp_path):
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)

    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=16)
    t.seed(base, "db1", "orders", ["o_orderkey"])
    assert t.read(spark, "db1", "orders").count() == base.count()

    # apply in two batches; track touched buckets
    for lo, hi in [(0, 8000), (8000, 10**18)]:
        part = changes.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        touched = t.merge(spark, part, "db1", "orders", ["o_orderkey"])
        assert 0 < len(touched) <= 16

    final = t.read(spark, "db1", "orders")
    assert_matches_oracle(final, duck, cdc_demo.ORDERS_CDC_ORACLE)


def test_small_batch_touches_few_buckets(spark, tmp_path):
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)

    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=64)
    t.seed(base, "db1", "orders", ["o_orderkey"])

    # a 3-key batch must touch <= 3 of 64 buckets
    tiny = changes.orderBy("seq").limit(3)
    touched = t.merge(spark, tiny, "db1", "orders", ["o_orderkey"])
    assert 1 <= len(touched) <= 3

    # untouched buckets' data must be intact: total = base +- net effect
    n = t.read(spark, "db1", "orders").count()
    assert abs(n - base.count()) <= 3


def test_streaming_job_with_bucketed_target(spark, duck, tmp_path):
    """End-to-end: ReplicationJob wired to the bucketed target."""
    import os
    from pyspark.sql import functions as F

    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.streaming.pipeline import ReplicationJob
    from dtle_spark.streaming.wire import to_wire

    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate([(0, 8000), (8000, 10**18)]):
        to_wire(changes.filter((F.col("seq") >= lo) & (F.col("seq") < hi))).coalesce(
            1
        ).write.parquet(f"{src}/b{i}")

    target = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=16)
    target.seed(base, "db1", "orders", ["o_orderkey"])

    cat = SchemaCatalog()
    cat.register("db1", "orders", changes.schema["after"].dataType, ["o_orderkey"])
    cfg = TableConfig("db1", "orders", unique_key=["o_orderkey"])
    rj = ReplicationJob(
        spark, JobConfig("bj", [cfg]), f"{src}/*", str(tmp_path / "tgt"),
        str(tmp_path / "ckpt"), cat, max_files_per_trigger=1, target=target,
    ).start()
    rj.process_available()
    rj.pause()

    assert_matches_oracle(target.read(spark, "db1", "orders"), duck, cdc_demo.ORDERS_CDC_ORACLE)


def test_bucketed_reverse_order_delivery_converges(spark, duck, tmp_path):
    """Out-of-order delivery: batches applied in REVERSE seq order must
    converge to the same oracle state (seq-versioned merge per bucket —
    the whole-table path's guarantee, now on the scale path)."""
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)

    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=16)
    t.seed(base, "db1", "orders", ["o_orderkey"])

    # three seq slices, applied newest-first
    bounds = [(20000, 10**18), (8000, 20000), (0, 8000)]
    for lo, hi in bounds:
        part = changes.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        t.merge(spark, part, "db1", "orders", ["o_orderkey"])

    assert_matches_oracle(t.read(spark, "db1", "orders"), duck, cdc_demo.ORDERS_CDC_ORACLE)


def test_bucketed_untouched_buckets_byte_identical(spark, tmp_path):
    """A merge must not rewrite (or even re-open) buckets the batch does
    not touch: their dirs stay byte-for-byte identical."""
    import hashlib
    import os

    def dir_digest(p):
        h = hashlib.md5()
        for root, _, files in sorted(os.walk(p)):
            for f in sorted(files):
                fp = os.path.join(root, f)
                h.update(f.encode())
                with open(fp, "rb") as fh:
                    h.update(fh.read())
        return h.hexdigest()

    from dtle_spark.sinks.manifest import TableManifest

    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=16)
    t.seed(base, "db1", "orders", ["o_orderkey"])
    tdir = t.table_dir("db1", "orders")

    def entries():
        return TableManifest.load(tdir).entries

    before = {b: dir_digest(os.path.join(tdir, d)) for b, d in entries().items()}
    before_names = dict(entries())
    tiny = changes.orderBy("seq").limit(3)
    touched = t.merge(spark, tiny, "db1", "orders", ["o_orderkey"])
    after_names = entries()
    assert 1 <= len(touched) <= 3
    for b, d in after_names.items():
        if int(b) not in touched:
            # untouched bucket: same immutable dir, byte-identical
            assert d == before_names[b], f"untouched bucket {b} repointed"
            assert dir_digest(os.path.join(tdir, d)) == before[b]
    # no staged debris next to the table, no unreferenced dirs inside it
    parent = os.path.dirname(tdir)
    assert not [p for p in os.listdir(parent) if ".merge-" in p or ".old-" in p]
    # live = current entries + retained time-travel versions' dirs
    live = set(after_names.values())
    for v in TableManifest.versions(tdir):
        live.update(TableManifest.load_version(tdir, v).entries.values())
    assert not [
        n
        for n in os.listdir(tdir)
        if n not in ("_manifest.json", "_history") and n not in live
        and not n.startswith("_WRITER_LEASE")  # lease control files persist
    ]


def test_compaction_drops_only_expired_tombstones(spark, tmp_path):
    """Tombstone GC: tombstones below the re-delivery horizon go, live
    rows and newer tombstones stay, buckets without expired tombstones
    are not rewritten, and a late stale change for a compacted key is
    now applied (the guard is gone — horizon choice is the contract)."""
    import os

    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    t = BucketedTableTarget(str(tmp_path / "tgt"), n_buckets=16)
    t.seed(base, "db1", "orders", ["o_orderkey"])
    t.merge(spark, changes, "db1", "orders", ["o_orderkey"])

    raw = t.read_internal(spark, "db1", "orders")
    tombs = raw.filter(F.col("__deleted"))
    n_tombs = tombs.count()
    assert n_tombs > 0
    seqs = sorted(r["__seq"] for r in tombs.select("__seq").collect())
    horizon = seqs[len(seqs) // 2]  # half expire

    live_before = t.read(spark, "db1", "orders").count()
    dropped = t.compact(spark, "db1", "orders", horizon)
    assert dropped == sum(1 for s in seqs if s < horizon)
    after = t.read_internal(spark, "db1", "orders")
    assert after.filter(F.col("__deleted")).count() == n_tombs - dropped
    assert t.read(spark, "db1", "orders").count() == live_before
    # idempotent: second pass with the same horizon drops nothing
    assert t.compact(spark, "db1", "orders", horizon) == 0
    # no debris
    parent = os.path.dirname(t.table_dir("db1", "orders"))
    assert not [p for p in os.listdir(parent) if ".old-" in p or ".compact-" in p]


def test_whole_table_target_compaction(spark, tmp_path):
    from dtle_spark.streaming.pipeline import ParquetTableTarget
    from dtle_spark.operators.apply import latest_image_per_key, merge_into_versioned, with_version_columns

    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    t = ParquetTableTarget(str(tmp_path / "tgt"))
    net = latest_image_per_key(changes, ["o_orderkey"])
    merged = merge_into_versioned(with_version_columns(base), net, ["o_orderkey"])
    t.overwrite(merged, "db1", "orders")

    raw = t.read_internal(spark, "db1", "orders")
    n_tombs = raw.filter(F.col("__deleted")).count()
    assert n_tombs > 0
    live = t.read(spark, "db1", "orders").count()
    dropped = t.compact(spark, "db1", "orders", 10**18)  # everything expired
    assert dropped == n_tombs
    assert t.read(spark, "db1", "orders").count() == live
    assert t.read_internal(spark, "db1", "orders").filter(F.col("__deleted")).count() == 0


def test_range_bucketed_key_local_batch(spark, duck, tmp_path):
    """Range routing: a key-local batch (the realistic CDC shape —
    auto-increment activity) touches few buckets; full apply still
    matches the oracle."""
    from dtle_spark.sinks.table_sink import range_bucket

    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    t = BucketedTableTarget(
        str(tmp_path / "tgt"), n_buckets=64, bucket_fn=range_bucket("o_orderkey", 50)
    )
    t.seed(base, "db1", "orders", ["o_orderkey"])

    local = changes.filter((F.col("gno") >= 100) & (F.col("gno") < 300))
    touched = t.merge(spark, local, "db1", "orders", ["o_orderkey"])
    # keys 100-300 span <=5 width-50 buckets; PK-moving updates (%17)
    # relocate to key+10M and legitimately touch ~4 far buckets too
    assert len(touched) <= 10

    rest = changes.filter((F.col("gno") < 100) | (F.col("gno") >= 300))
    t.merge(spark, rest, "db1", "orders", ["o_orderkey"])
    assert_matches_oracle(t.read(spark, "db1", "orders"), duck, cdc_demo.ORDERS_CDC_ORACLE)
