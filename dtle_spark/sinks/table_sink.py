"""Merge targets over parquet with manifest-atomic commits.

Two targets behind one interface (``read``/``read_internal``/``stage``/
``commit``/``overwrite``/``compact``):

- ``ParquetTableTarget`` — whole-table image per commit. Simple, exact;
  rewrite cost O(table) per batch, the test-tier stand-in.
- ``BucketedTableTarget`` — hash- (or range-) partitions the table into
  N key buckets and merges only the buckets a batch touches:

    1. compute the batch's net changes (already keyed),
    2. derive the AFFECTED bucket set (distinct hash of change keys —
       for CDC batches a small fraction of N),
    3. read ONLY those buckets, merge, commit ONLY those entries.

  Merge cost becomes O(affected buckets) instead of O(table) — at
  100 TB with N=8192 buckets and a 1M-row batch, a merge touches
  ≲1M/N-ish of the table. Bucket routing uses ``pmod(xxhash64(key),N)``
  (engine-internal only — never oracle-compared, so Spark-native
  hashing is fine). On Delta/Iceberg the same role is played by
  partition/file pruning on the merge key + deletion vectors.

Both commit through :mod:`dtle_spark.sinks.manifest`: data dirs are
immutable, a commit is ONE atomic manifest rename, and a crash at any
point leaves the previous table state readable (no rename-swap window).
``stage_merge`` returns the commit as a closure so the streaming batch
loop can swap EVERY table's manifest in one tight loop — the A6
cross-table atomicity of streaming/pipeline.apply_batch.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.operators.apply import (
    DELETED_COL,
    SEQ_COL,
    dedupe_redelivered,
    latest_image_per_key,
    merge_into_versioned,
    with_version_columns,
)
from dtle_spark.sinks.lease import writer_lease
from dtle_spark.sinks.manifest import (
    HISTORY_DIR,
    TableManifest,
    gc_unreferenced,
    unique_entry_name,
)


def hash_bucket(key_cols: list[str], n_buckets: int):
    """Uniform hash routing: best when updates spread across the key
    space evenly (every batch touches many buckets regardless)."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets)).cast("int")


def range_bucket(key_col: str, width: int):
    """Range routing on a numeric key: CDC activity is usually
    key-LOCAL (auto-increment PKs -> recent rows cluster), so a
    contiguous batch maps to a handful of buckets — this is where
    bucket-selective merging actually pays. The lake analogue is
    partitioning the table by a key/date prefix."""

    def expr(key_cols: list[str], n_buckets: int):
        return F.floor(F.col(key_col) / width).cast("int")

    return expr


class ManifestedTarget:
    """Whole-table manifest-committed target (base for both targets)."""

    def __init__(self, root: str):
        self.root = root

    def path(self, schema_name: str, table_name: str) -> str:
        return os.path.join(self.root, schema_name, table_name)

    table_dir = path  # historical alias

    def _manifest(self, schema_name: str, table_name: str) -> TableManifest | None:
        return TableManifest.load(self.path(schema_name, table_name))

    def read_internal(self, spark: SparkSession, schema_name: str, table_name: str) -> DataFrame | None:
        """Raw stored form — may carry __seq/__deleted version columns."""
        p = self.path(schema_name, table_name)
        m = TableManifest.load(p)
        if m is not None:
            dirs = [d for d in m.dirs(p) if os.path.exists(d)]
            if not dirs:
                return None
            return spark.read.parquet(*dirs)
        # legacy / externally-seeded layouts (pre-manifest)
        if not os.path.exists(p):
            return None
        names = os.listdir(p)
        legacy_buckets = [n for n in names if n.startswith("bucket=")]
        if legacy_buckets:
            return spark.read.parquet(*[os.path.join(p, n) for n in legacy_buckets])
        if any(f.endswith(".parquet") or f == "_SUCCESS" for f in names):
            return spark.read.parquet(p)
        return None

    def read(self, spark: SparkSession, schema_name: str, table_name: str) -> DataFrame | None:
        """External view: tombstones filtered, version columns stripped."""
        df = self.read_internal(spark, schema_name, table_name)
        if df is None:
            return None
        if DELETED_COL in df.columns:
            df = df.filter(~F.col(DELETED_COL)).drop(SEQ_COL, DELETED_COL)
        return df

    def versions(self, schema_name: str, table_name: str) -> list[int]:
        """Retained commit versions, ascending (current last)."""
        return TableManifest.versions(self.path(schema_name, table_name))

    def read_at_version(
        self, spark: SparkSession, schema_name: str, table_name: str, version: int
    ) -> DataFrame | None:
        """Time travel: the table exactly as of a retained commit — the
        ``VERSION AS OF`` analogue. Data dirs are immutable and GC keeps
        every dir a retained version references, so the past image is
        byte-stable until retention prunes it."""
        p = self.path(schema_name, table_name)
        m = TableManifest.load_version(p, version)
        if m is None:
            return None
        dirs = [d for d in m.dirs(p) if os.path.exists(d)]
        if not dirs:
            return None
        df = spark.read.parquet(*dirs)
        if DELETED_COL in df.columns:
            df = df.filter(~F.col(DELETED_COL)).drop(SEQ_COL, DELETED_COL)
        return df

    def stage(
        self, df: DataFrame, schema_name: str, table_name: str, retries: int = 5
    ) -> str:
        """Write the new table image aside (not yet visible).
        Write-retry mirrors the reference's deadlock retry
        (RetryTxLimit=5, applier.go:966-977/driver.go:172-173) — on a
        lake target this is the optimistic-concurrency retry loop."""
        p = self.path(schema_name, table_name)
        staged = f"{p}.staged-{uuid.uuid4().hex[:8]}"
        last_err = None
        for _ in range(retries):
            try:
                df.write.mode("overwrite").parquet(staged)
                last_err = None
                break
            except Exception as e:  # transient executor/file races
                last_err = e
        if last_err is not None:
            raise last_err
        return staged

    def commit(
        self,
        staged: str,
        schema_name: str,
        table_name: str,
        seq_watermark: dict[str, int] | None = None,
    ) -> None:
        """Adopt a staged image: move it inside the table dir (readers
        still resolve the old manifest), then atomically swap the
        manifest. Crash before the swap = old state intact; after = new
        state complete. GC of replaced dirs runs last and is restartable."""
        p = self.path(schema_name, table_name)
        os.makedirs(p, exist_ok=True)
        with writer_lease(p, "commit"):
            entry = unique_entry_name("t")
            os.rename(staged, os.path.join(p, entry))
            m = TableManifest.load(p) or TableManifest()
            m.entries = {"_table": entry}
            if seq_watermark is not None:
                m.seq_watermark = seq_watermark
            m.save(p)  # <- the commit point
            gc_unreferenced(p, m)

    def overwrite(self, df: DataFrame, schema_name: str, table_name: str) -> None:
        self.commit(self.stage(df, schema_name, table_name), schema_name, table_name)

    def append(
        self,
        df: DataFrame,
        schema_name: str,
        table_name: str,
        seq_watermark: dict[str, int] | None = None,
    ) -> None:
        """Log-structured append: the staged batch becomes an ADDITIONAL
        manifest entry (readers union all entries), so the commit cost
        is O(batch) regardless of table size — the lake-append analogue
        for insert-only tables (streaming corpus ingest). Same atomic
        manifest swap; time travel sees one version per appended batch."""
        p = self.path(schema_name, table_name)
        m = TableManifest.load(p)
        if m is not None and m.entries and all(
            k.lstrip("-").isdigit() for k in m.entries
        ):
            raise ValueError(
                f"{schema_name}.{table_name} is key-bucketed; append is for "
                "insert-only segment tables — use merge() on bucketed targets"
            )
        staged = self.stage(df, schema_name, table_name)
        os.makedirs(p, exist_ok=True)
        with writer_lease(p, "append"):
            entry = unique_entry_name("seg")
            os.rename(staged, os.path.join(p, entry))
            m = TableManifest.load(p) or TableManifest()
            m.entries[entry] = entry  # key = dir: appends never replace
            if seq_watermark is not None:
                m.seq_watermark.update(seq_watermark)
            m.save(p)  # <- the commit point
            gc_unreferenced(p, m)

    def purge_keys(
        self,
        spark: SparkSession,
        schema_name: str,
        table_name: str,
        key_col: str,
        keys: DataFrame,
    ) -> int:
        """HARD delete (takedown / right-to-be-forgotten): remove every
        row whose ``key_col`` matches ``keys`` — physically, not a
        tombstone. Only segments CONTAINING matches are rewritten
        (anti-join per touched segment; untouched dirs are shared with
        the new manifest unchanged), one atomic manifest swap commits
        the purge, and retained HISTORY versions older than it are
        dropped with their superseded dirs GC'd — time travel across a
        purge is deliberately severed, because a takedown that survives
        in a resolvable snapshot is not a takedown.

        Contract notes: history severing happens on EVERY call (also
        0-hit ones) — that makes the operation idempotent and lets a
        re-run complete a purge that crashed between the manifest swap
        and the history prune. The seq watermark rides the swap
        untouched, so streaming replays stay no-ops. Cost: ONE scan of
        the table (key column only, keys broadcast) computes the
        touched-segment set and the per-segment purge counts via
        input_file_name(), then one anti-join rewrite per TOUCHED
        segment — O(touched) Spark jobs, not O(segments); at 100 TB,
        clustering/bucketing the table on the purge key bounds the
        rewrite to the keys' own row groups. Returns rows purged."""
        p = self.path(schema_name, table_name)
        if not os.path.isdir(p):
            return 0
        with writer_lease(p, "purge_keys"):
            return self._purge_keys_locked(spark, p, key_col, keys)

    def _purge_keys_locked(
        self, spark: SparkSession, p: str, key_col: str, keys: DataFrame
    ) -> int:
        m = TableManifest.load(p)
        purged = 0
        if m is not None and m.entries:
            keys = keys.select(F.col(key_col)).distinct().localCheckpoint()
            dirs = sorted(set(m.entries.values()))
            hits = (
                # mergeSchema: appended segments may carry evolved
                # schemas (ADD COLUMN mid-stream); a single-file
                # inferred schema could silently miss key matches in
                # segments whose layout differs (r13 advice)
                spark.read.option("mergeSchema", "true")
                .parquet(*(os.path.join(p, d) for d in dirs))
                .select(F.col(key_col), F.input_file_name().alias("__file"))
                .join(F.broadcast(keys), [key_col], "left_semi")
                .groupBy("__file").agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            per_dir: dict[str, int] = {}  # touched segment -> match count
            for r in hits:
                for d in dirs:
                    if f"/{d}/" in r["__file"]:
                        per_dir[d] = per_dir.get(d, 0) + r["n"]
                        break
            purged = sum(per_dir.values())
            if purged:
                new_entries: dict[str, str] = {}
                staged: list[tuple[str, str]] = []  # (staged, final)
                for logical, d in sorted(m.entries.items()):
                    if d not in per_dir:
                        new_entries[logical] = d  # untouched: share dir
                        continue
                    kept = spark.read.parquet(os.path.join(p, d)).join(
                        F.broadcast(keys), [key_col], "left_anti"
                    )
                    entry = unique_entry_name("purged")
                    sdir = f"{p}.staged-{entry}"
                    kept.write.mode("overwrite").parquet(sdir)
                    staged.append((sdir, entry))
                    # append-style manifests key logical BY dir name;
                    # bucketed ones key by bucket number / "_table"
                    new_entries[entry if logical == d else logical] = entry
                for sdir, entry in staged:
                    os.rename(sdir, os.path.join(p, entry))
                m.entries = new_entries
                m.save(p)  # <- the commit point
        # sever time travel: drop every retained version older than the
        # live one, then GC the dirs only they referenced. Runs even on
        # a 0-hit call so a crash between swap and prune is completable
        # by re-running the purge.
        m = TableManifest.load(p)
        if m is not None:
            hist = os.path.join(p, HISTORY_DIR)
            if os.path.isdir(hist):
                for name in os.listdir(hist):
                    if name.startswith("_v") and name.endswith(".json") \
                            and int(name[2:-5]) < m.version:
                        try:
                            os.remove(os.path.join(hist, name))
                        except OSError:
                            pass
            gc_unreferenced(p, m)
        return purged

    def compact_segments(
        self, spark: SparkSession, schema_name: str, table_name: str,
        max_segments: int = 16,
    ) -> int:
        """Small-file chore for append-only tables: when the segment
        count exceeds ``max_segments``, rewrite all segments into ONE
        entry (a single partitioned parquet write) and swap the
        manifest once. Readers before the swap see the old segments,
        after it the compacted image — same atomicity as every other
        commit, and time travel keeps resolving the pre-compaction
        versions until retention prunes them. Returns segments folded
        (0 = nothing to do). At 100 TB run this off the ingest path on
        a schedule, like any lake OPTIMIZE."""
        p = self.path(schema_name, table_name)
        m = TableManifest.load(p)
        if m is None or len(m.entries) <= max_segments:
            return 0
        if all(k.lstrip("-").isdigit() for k in m.entries):
            return 0  # bucketed layout: compact() (tombstone GC) owns it
        # lease spans read->stage->commit: an append landing between
        # the fold's read and its swap would be silently erased
        with writer_lease(p, "compact_segments"):
            cur = self.read_internal(spark, schema_name, table_name)
            if cur is None:
                return 0
            n = len(TableManifest.load(p).entries)
            wm = self.seq_watermark(schema_name, table_name)
            self.commit(
                self.stage(cur, schema_name, table_name),
                schema_name, table_name, seq_watermark=wm or None,
            )
            return n

    def seq_watermark(self, schema_name: str, table_name: str) -> dict[str, int]:
        """Per-source applied-seq high-water mark, committed atomically
        with the data it covers (no-PK replay idempotence, A10)."""
        m = self._manifest(schema_name, table_name)
        return dict(m.seq_watermark) if m is not None else {}

    def bump_schema_version(self, schema_name: str, table_name: str) -> None:
        p = self.path(schema_name, table_name)
        m = TableManifest.load(p)
        if m is not None:
            m.schema_version += 1
            m.save(p)

    def compact(self, spark: SparkSession, schema_name: str, table_name: str,
                horizon_seq: int) -> int:
        """Tombstone GC: drop tombstones whose __seq is older than the
        source's max re-delivery horizon (the reference's periodic
        gtid_executed cleanup is the same chore — a tombstone only
        guards against a STALE change arriving later, so once the
        source can no longer re-deliver below horizon_seq the marker
        is dead weight). Live rows and newer tombstones survive.
        Returns the number of tombstones dropped."""
        cur = self.read_internal(spark, schema_name, table_name)
        if cur is None or DELETED_COL not in cur.columns:
            return 0
        dead = F.col(DELETED_COL) & (F.col(SEQ_COL) < F.lit(horizon_seq))
        n = cur.filter(dead).count()
        if n:
            wm = self.seq_watermark(schema_name, table_name)
            self.commit(
                self.stage(cur.filter(~dead), schema_name, table_name),
                schema_name, table_name, seq_watermark=wm or None,
            )
        return n


class ParquetTableTarget(ManifestedTarget):
    """Whole-table merge target — exact but O(table) per commit; the
    test tier. ``BucketedTableTarget`` is the scale default."""


class BucketedTableTarget(ManifestedTarget):
    def __init__(self, root: str, n_buckets: int = 32, bucket_fn=None):
        super().__init__(root)
        self.n_buckets = n_buckets
        self._bucket_fn = bucket_fn or hash_bucket

    def _bucket_dirname(self, schema_name: str, table_name: str, b: int) -> str | None:
        m = self._manifest(schema_name, table_name)
        if m is None:
            return None
        return m.entries.get(str(b))

    def seed(self, df: DataFrame, schema_name: str, table_name: str, key_cols: list[str]) -> None:
        """Initial (snapshot) load: write every bucket partition
        (seq-versioned from the start, seq -1 = before every change)."""
        if DELETED_COL not in df.columns:
            df = with_version_columns(df)
        bucketed = df.withColumn("__b", self._bucket_fn(key_cols, self.n_buckets))
        p = self.path(schema_name, table_name)
        staged = p + f".staged-{uuid.uuid4().hex[:8]}"
        (
            bucketed.repartition(self.n_buckets, "__b")
            .write.partitionBy("__b")
            .mode("overwrite")
            .parquet(staged)
        )
        os.makedirs(p, exist_ok=True)
        token = uuid.uuid4().hex[:8]
        with writer_lease(p, "seed"):
            m = TableManifest(key_cols=list(key_cols), n_buckets=self.n_buckets)
            for d in sorted(os.listdir(staged)):
                if not d.startswith("__b="):
                    continue
                b = d[4:]
                entry = f"b{b}-{token}"
                os.rename(os.path.join(staged, d), os.path.join(p, entry))
                m.entries[b] = entry
            m.save(p)  # <- commit point; replaces any previous table state
            gc_unreferenced(p, m)
        shutil.rmtree(staged, ignore_errors=True)

    def overwrite(self, df: DataFrame, schema_name: str, table_name: str) -> None:
        """Whole-table rewrite that PRESERVES bucketing when the table
        is bucketed (DDL application path): re-bucket on the manifest's
        recorded key. Falls back to a whole-table entry for unkeyed
        tables. (A rename of a key column itself would need a key-spec
        update first — out of scope, as in the reference.)"""
        m = self._manifest(schema_name, table_name)
        if m is not None and m.key_cols:
            self.seed(df, schema_name, table_name, m.key_cols)
            self.bump_schema_version(schema_name, table_name)
        else:
            super().overwrite(df, schema_name, table_name)

    def compact(self, spark: SparkSession, schema_name: str, table_name: str,
                horizon_seq: int) -> int:
        """Tombstone GC, bucket-selective: only buckets that actually
        hold expired tombstones (``__deleted`` with ``__seq`` below the
        re-delivery horizon) are rewritten — untouched buckets stay
        byte-identical, so at 100 TB the GC cost tracks churn, not
        table size. One manifest swap commits every rewritten bucket.
        Returns the number of tombstones dropped."""
        p = self.path(schema_name, table_name)
        m = TableManifest.load(p)
        if m is None:
            return super().compact(spark, schema_name, table_name, horizon_seq)
        dead = F.col(DELETED_COL) & (F.col(SEQ_COL) < F.lit(horizon_seq))
        dropped = 0
        token = uuid.uuid4().hex[:8]
        replaced: dict[str, str] = {}
        for b, entry in sorted(m.entries.items()):
            bdir = os.path.join(p, entry)
            if not os.path.exists(bdir):
                continue
            cur = spark.read.parquet(bdir)
            if DELETED_COL not in cur.columns:
                continue
            n = cur.filter(dead).count()
            if not n:
                continue  # bucket untouched — not even rewritten
            dropped += n
            new_entry = f"b{b}-c{token}"
            cur.filter(~dead).write.mode("overwrite").parquet(os.path.join(p, new_entry))
            replaced[b] = new_entry
        if replaced:
            m = TableManifest.load(p)  # re-read: manifest may have moved on
            m.entries.update(replaced)
            m.save(p)  # <- commit point for ALL rewritten buckets at once
            gc_unreferenced(p, m)
        return dropped

    def stage_merge(
        self,
        spark: SparkSession,
        changes: DataFrame,
        schema_name: str,
        table_name: str,
        key_cols: list[str],
    ):
        """Stage one change batch; returns ``(touched_buckets,
        commit_fn)`` — nothing is visible until ``commit_fn()`` runs.

        Seq-versioned (operators/apply.merge_into_versioned): an effect
        applies only if its seq beats the stored row's, and deletes
        leave tombstones — so delivery may be split or reordered across
        micro-batches, same guarantee as the whole-table path, at
        O(affected buckets) cost. Tombstone GC is the compaction chore.

        The commit closure moves the staged bucket dirs inside the
        table dir (invisible — readers resolve the old manifest), then
        swaps the manifest ONCE. The streaming batch loop collects
        these closures from every table and runs them back-to-back:
        A6 cross-table atomicity with a crash window of zero per table."""
        net = latest_image_per_key(dedupe_redelivered(changes), key_cols)
        net = net.withColumn("__b", self._bucket_fn(key_cols, self.n_buckets)).persist()
        p = self.path(schema_name, table_name)
        m = TableManifest.load(p)
        bucketed_layout = (
            m is not None and bool(m.entries) and all(k.lstrip("-").isdigit() for k in m.entries)
        ) or (
            m is None
            and os.path.exists(p)
            and any(n.startswith("bucket=") for n in os.listdir(p))
        )
        try:
            touched = sorted(r["__b"] for r in net.select("__b").distinct().collect())
            if not touched:
                return [], lambda: None
            if bucketed_layout:
                # read ONLY affected buckets, resolved through the manifest
                dirs = []
                for b in touched:
                    if m is not None:
                        e = m.entries.get(str(b))
                        d = os.path.join(p, e) if e else None
                    else:  # legacy bucket=K layout (pre-manifest seed)
                        d = os.path.join(p, f"bucket={b}")
                    if d and os.path.exists(d):
                        dirs.append(d)
                if dirs:
                    current = spark.read.parquet(*dirs)
                else:
                    current = spark.createDataFrame([], net.schema["row"].dataType)
                rewrite_all = False
            else:
                # one-time migration: the table was seeded as a whole-table
                # image (overwrite/snapshot) or doesn't exist yet — merge
                # against the full image and re-bucket everything
                current = self.read_internal(spark, schema_name, table_name)
                if current is None:
                    current = spark.createDataFrame([], net.schema["row"].dataType)
                rewrite_all = True
            if DELETED_COL not in current.columns:
                current = with_version_columns(current)  # legacy unversioned rows
            merged = merge_into_versioned(current, net.drop("__b"), key_cols).withColumn(
                "__b", self._bucket_fn(key_cols, self.n_buckets)
            )
            token = uuid.uuid4().hex[:8]
            staged = p + f".merge-{token}"
            n_parts = self.n_buckets if rewrite_all else len(touched)
            merged.repartition(n_parts, "__b").write.partitionBy("__b").mode(
                "overwrite"
            ).parquet(staged)
        finally:
            net.unpersist()

        def commit_fn() -> None:
            os.makedirs(p, exist_ok=True)
            with writer_lease(p, "merge"):
                _commit_locked()

        def _commit_locked() -> None:
            new_entries: dict[str, str] = {}
            for d in sorted(os.listdir(staged)):
                if not d.startswith("__b="):
                    continue
                b = d[4:]
                entry = f"b{b}-{token}"
                os.rename(os.path.join(staged, d), os.path.join(p, entry))
                new_entries[b] = entry
            cur = TableManifest.load(p)
            if cur is None:
                cur = TableManifest(key_cols=list(key_cols), n_buckets=self.n_buckets)
                # adopt pre-manifest bucket=K dirs so GC can't orphan them
                for n in os.listdir(p):
                    if n.startswith("bucket="):
                        cur.entries[n.split("=", 1)[1]] = n
            if rewrite_all:
                cur.entries = new_entries  # full re-bucket replaces the image
                cur.key_cols = list(key_cols)
                cur.n_buckets = self.n_buckets
            else:
                cur.entries.update(new_entries)
            cur.save(p)  # <- the commit point
            gc_unreferenced(p, cur)
            shutil.rmtree(staged, ignore_errors=True)

        return touched, commit_fn

    def merge(
        self,
        spark: SparkSession,
        changes: DataFrame,
        schema_name: str,
        table_name: str,
        key_cols: list[str],
    ) -> list[int]:
        """Stage + commit in one call; returns the buckets touched."""
        touched, commit_fn = self.stage_merge(
            spark, changes, schema_name, table_name, key_cols
        )
        commit_fn()
        return touched
