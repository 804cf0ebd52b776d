"""Bucketed merge target: the scale path for continuous apply.

``ParquetTableTarget`` (streaming/pipeline.py) rewrites the whole table
per micro-batch — fine for tests, quadratic-ish over time at scale.
``BucketedTableTarget`` hash-partitions the table into N key buckets
(directory per bucket, the lake ``bucketBy`` analogue) and each merge:

  1. computes the batch's net changes (already keyed),
  2. derives the set of AFFECTED buckets (distinct hash of change keys
     — for CDC batches this is usually a small fraction of N),
  3. reads ONLY those bucket dirs, merges, swaps ONLY those dirs.

Merge cost becomes O(affected buckets) instead of O(table) — at 100 TB
with N=8192 buckets and a 1M-row batch, a merge touches ≲1M/N-ish of
the table. Bucket routing uses ``pmod(xxhash64(key), N)`` (engine-
internal only — never oracle-compared, so Spark-native hashing is fine
here). On Delta/Iceberg the same role is played by partition/file
pruning on the merge key + deletion vectors.
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


class BucketedTableTarget:
    def __init__(self, root: str, n_buckets: int = 32, bucket_fn=None):
        self.root = root
        self.n_buckets = n_buckets
        self._bucket_fn = bucket_fn or hash_bucket

    def table_dir(self, schema_name: str, table_name: str) -> str:
        return os.path.join(self.root, schema_name, table_name)

    def _bucket_dir(self, schema_name: str, table_name: str, b: int) -> str:
        return os.path.join(self.table_dir(schema_name, table_name), f"bucket={b}")

    def read_internal(self, spark: SparkSession, schema_name: str, table_name: str) -> DataFrame | None:
        """Raw stored form — carries __seq/__deleted version columns."""
        p = self.table_dir(schema_name, table_name)
        if not os.path.exists(p):
            return None
        return spark.read.parquet(os.path.join(p, "*"))

    def read(self, spark: SparkSession, schema_name: str, table_name: str) -> DataFrame | None:
        """External view: tombstones filtered, version columns stripped."""
        df = self.read_internal(spark, schema_name, table_name)
        if df is None:
            return None
        if DELETED_COL in df.columns:
            df = df.filter(~F.col(DELETED_COL)).drop(SEQ_COL, DELETED_COL)
        return df

    def seed(self, df: DataFrame, schema_name: str, table_name: str, key_cols: list[str]) -> None:
        """Initial (snapshot) load: write every bucket partition
        (seq-versioned from the start, seq -1 = before every change)."""
        if DELETED_COL not in df.columns:
            df = with_version_columns(df)
        bucketed = df.withColumn("__b", self._bucket_fn(key_cols, self.n_buckets))
        staged = self.table_dir(schema_name, table_name) + f".staged-{uuid.uuid4().hex[:8]}"
        (
            bucketed.repartition(self.n_buckets, "__b")
            .write.partitionBy("__b")
            .mode("overwrite")
            .parquet(staged)
        )
        final = self.table_dir(schema_name, table_name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.rename(staged, final)
        # normalize partition dir names (__b=K -> bucket=K)
        for d in os.listdir(final):
            if d.startswith("__b="):
                os.rename(os.path.join(final, d), os.path.join(final, "bucket=" + d[4:]))

    def compact(self, spark: SparkSession, schema_name: str, table_name: str,
                horizon_seq: int) -> int:
        """Tombstone GC, bucket-selective: only buckets that actually
        hold expired tombstones (``__deleted`` with ``__seq`` below the
        re-delivery horizon) are rewritten — untouched buckets stay
        byte-identical, so at 100 TB the GC cost tracks churn, not
        table size. Same stage-then-commit swap as merge. Returns the
        number of tombstones dropped."""
        root = self.table_dir(schema_name, table_name)
        if not os.path.exists(root):
            return 0
        dead = F.col(DELETED_COL) & (F.col(SEQ_COL) < F.lit(horizon_seq))
        dropped = 0
        token = uuid.uuid4().hex[:8]
        old_root = root + f".old-{token}"
        swaps: list[tuple[str, str]] = []
        for d in sorted(os.listdir(root)):
            if not d.startswith("bucket="):
                continue
            bdir = os.path.join(root, d)
            cur = spark.read.parquet(bdir)
            if DELETED_COL not in cur.columns:
                continue
            n = cur.filter(dead).count()
            if not n:
                continue  # bucket untouched — not even rewritten
            dropped += n
            staged = root + f".compact-{token}-{d}"
            cur.filter(~dead).write.mode("overwrite").parquet(staged)
            swaps.append((staged, bdir))
        if swaps:
            os.makedirs(old_root, exist_ok=True)
            for staged, bdir in swaps:
                os.rename(bdir, os.path.join(old_root, os.path.basename(bdir)))
                os.rename(staged, bdir)
            shutil.rmtree(old_root, ignore_errors=True)
        return dropped

    def merge(
        self,
        spark: SparkSession,
        changes: DataFrame,
        schema_name: str,
        table_name: str,
        key_cols: list[str],
    ) -> list[int]:
        """Merge one change batch; returns the buckets touched.

        Seq-versioned (operators/apply.merge_into_versioned): an effect
        applies only if its seq beats the stored row's, and deletes
        leave tombstones — so delivery may be split or reordered across
        micro-batches, same guarantee as the whole-table path, at
        O(affected buckets) cost. Tombstone GC is the compaction chore.

        Swap protocol (stage-then-commit): each touched bucket's old
        dir is renamed ASIDE (outside the table dir, invisible to
        readers), the new dir renamed in, and the old dirs deleted only
        after every touched bucket is swapped — a crash mid-swap leaves
        every bucket's rows recoverable (old dirs intact), never a
        dropped bucket."""
        net = latest_image_per_key(dedupe_redelivered(changes), key_cols)
        net = net.withColumn("__b", self._bucket_fn(key_cols, self.n_buckets)).persist()
        try:
            touched = sorted(r["__b"] for r in net.select("__b").distinct().collect())
            if not touched:
                return []
            # read ONLY affected buckets
            dirs = [
                self._bucket_dir(schema_name, table_name, b)
                for b in touched
                if os.path.exists(self._bucket_dir(schema_name, table_name, b))
            ]
            if dirs:
                current = spark.read.parquet(*dirs)
            else:
                current = spark.createDataFrame([], net.schema["row"].dataType)
            if DELETED_COL not in current.columns:
                current = with_version_columns(current)  # legacy unversioned bucket
            merged = merge_into_versioned(current, net.drop("__b"), key_cols).withColumn(
                "__b", self._bucket_fn(key_cols, self.n_buckets)
            )
            token = uuid.uuid4().hex[:8]
            staged = self.table_dir(schema_name, table_name) + f".merge-{token}"
            merged.repartition(len(touched), "__b").write.partitionBy("__b").mode(
                "overwrite"
            ).parquet(staged)
            # stage-then-commit bucket swap: olds aside, news in, delete last
            old_root = self.table_dir(schema_name, table_name) + f".old-{token}"
            os.makedirs(old_root, exist_ok=True)
            for b in touched:
                src = os.path.join(staged, f"__b={b}")
                dst = self._bucket_dir(schema_name, table_name, b)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                if os.path.exists(dst):
                    os.rename(dst, os.path.join(old_root, f"bucket={b}"))
                if os.path.exists(src):
                    os.rename(src, dst)
            shutil.rmtree(old_root, ignore_errors=True)
            shutil.rmtree(staged, ignore_errors=True)
            return touched
        finally:
            net.unpersist()
