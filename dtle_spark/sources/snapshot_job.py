"""Snapshot orchestration: consistent barrier + table scheduling
(reference S4/S5) and the snapshot->stream handoff.

The reference opens ``START TRANSACTION WITH CONSISTENT SNAPSHOT``,
retries until ``SHOW MASTER STATUS`` GTID is identical before/after,
and uses that GTID as the stream start offset
(/root/reference/driver/mysql/extractor.go:1191-1274). No-PK tables
dump inside the snapshot transaction; PK tables after commit
(extractor.go:1375-1414) because PK tables can be repaired by the
idempotent apply while no-PK tables cannot.

Spark restatement for a change-log + table source:
  1. read the change source's high-watermark (max seq) — "position A"
  2. re-read; if it moved, retry (the barrier)
  3. snapshot tables: no-PK tables first (their state must correspond
     exactly to the barrier), PK tables after (overlap with the stream
     is healed by keyed idempotent merge)
  4. start the stream filtered to seq > watermark
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.model import JobConfig, TableConfig
from dtle_spark.streaming.pipeline import ParquetTableTarget


@dataclass
class SnapshotResult:
    watermark_seq: int
    row_counts: dict[str, int]


def change_source_watermark(spark: SparkSession, source_dir: str) -> int:
    """Current high-watermark (max seq) of the wire change source."""
    try:
        df = spark.read.parquet(source_dir)
    except Exception:
        return -1
    row = df.agg(F.max("seq").alias("m")).collect()[0]
    return row["m"] if row["m"] is not None else -1


def consistent_barrier(
    spark: SparkSession, source_dir: str, max_retries: int = 5
) -> int:
    """S4: read the watermark twice; identical -> that's the barrier.
    (The reference retries the GTID compare the same way.)"""
    for _ in range(max_retries):
        a = change_source_watermark(spark, source_dir)
        b = change_source_watermark(spark, source_dir)
        if a == b:
            return a
    raise RuntimeError("change source would not quiesce for a consistent snapshot")


def run_snapshot(
    spark: SparkSession,
    job: JobConfig,
    table_sources: dict[str, DataFrame],
    target: ParquetTableTarget,
    source_dir: str,
    metrics=None,
) -> SnapshotResult:
    """Full snapshot under the barrier with S5 scheduling: no-PK tables
    first (barrier-exact), PK tables after (idempotent-merge-healed).
    Returns the watermark to start the stream from.

    ``metrics`` (TaskMetrics): dump progress is reported the way the
    reference does (ProgressPct from row counts, extractor.go:859-879 +
    api/models/job_v2.go:40-43) — total rows counted up front (a
    metadata-cheap count on parquet sources; the reference reads
    information_schema estimates), done rows advanced per table.
    """
    watermark = consistent_barrier(spark, source_dir)
    ordered = sorted(job.tables, key=lambda t: bool(t.unique_key))
    counts: dict[str, int] = {}
    prepared: dict[str, DataFrame] = {}
    for cfg in ordered:
        src = table_sources[cfg.table_name]
        if cfg.where:
            src = src.filter(F.expr(cfg.where))
        if cfg.column_map_from:
            from dtle_spark.operators.projection import column_map

            src = column_map(src, cfg.column_map_from, cfg.column_map_to or None)
        prepared[cfg.table_name] = src
    if metrics is not None:
        metrics.stage = "snapshot"
        metrics.snapshot_done_rows = 0
        metrics.snapshot_total_rows = sum(
            df.count() for df in prepared.values()
        )
    try:
        for cfg in ordered:
            src = prepared[cfg.table_name]
            target.overwrite(src, cfg.target_schema, cfg.target_table)
            n = src.count()
            counts[cfg.target_table] = n
            if metrics is not None:
                metrics.snapshot_done_rows += n
    finally:
        if metrics is not None:
            metrics.stage = "incremental"
    return SnapshotResult(watermark_seq=watermark, row_counts=counts)
