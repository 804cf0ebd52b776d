"""Streaming incremental-rollup maintenance: a materialized
SUM/COUNT-class aggregate kept current over a CDC change stream
(operators/rollup.py math, the profiler's storage protocol).

Each micro-batch of change rows is reduced to its per-group signed
DELTA (rollup_delta — map-only, no state read; the stream contract is
image-consistent before/after images, which is what the binlog
bridges emit — reference row events carry exact images,
/root/reference/driver/mysql/binlog/binlog_reader.go:700-1121) and
each delta lands as its own ``ingest_batch=<id>/`` parquet subtree:

- replay-idempotent by construction: a redelivered batch OVERWRITES
  its own subtree — the delta is recomputed from the same rows, so
  at-least-once delivery converges to exactly-once effect without a
  watermark file (within a batch, redelivered (sid,gno,seq) rows are
  deduped first, A10);
- view() merges on read: deltas are additive and order-free, so the
  view is one groupBy over the subtrees with zero-count groups
  dropped — cost O(batches x groups), never a table rescan;
- compact() folds subtrees into a NEW generation behind the atomic
  ``_CURRENT`` pointer with a compaction watermark (replayed
  pre-compaction batches are no-ops), bounding merge-on-read;
- the root carries the ``_CHECKPOINT_ID`` stamp — batch ids are only
  meaningful relative to one stream checkpoint, so a fresh checkpoint
  against an old root fails loudly instead of double-counting.

Why this exists: the reference replicates tables; its consumers then
re-aggregate downstream. At 100 TB the aggregate IS the product for
dashboards/monitoring, and delta maintenance keeps it current at
batch-grain cost. This is the incremental-view-maintenance classic
(deltas of SPJ+aggregation views), restated on the micro-batch lane
the apply pipeline already runs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.operators.apply import dedupe_redelivered
from dtle_spark.operators.rollup import _N, _fold, rollup_delta
from dtle_spark.streaming.ann_serving import (
    _check_stream_stamp,
    _ingest_batches,
    _swap_current,
)
from dtle_spark.streaming.profile import _compacted_through, _resolve
from dtle_spark.streaming.schema_guard import (
    check_upstream_schema,
    struct_cols,
)
from dtle_spark.sinks.lease import leased

_COMPACT_WM_FILE = "_COMPACTED_THROUGH"
_DELTAS = "deltas"


class AggMaintainJob:
    """Maintain one rollup (groups x additive measures) over a change
    stream. ``group_sqls`` / ``measure_sqls`` map output names to SQL
    expressions over the row image; measures must be integral so
    retractions cancel exactly (cents, counts, sizes)."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        view_root: str,
        checkpoint_dir: str,
        group_sqls: dict[str, str],
        measure_sqls: dict[str, str],
        schema=None,
        max_files_per_trigger: int = 1,
        reader=None,
        auto_compact_batches: int | None = None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.view_root = view_root
        self.checkpoint_dir = checkpoint_dir
        self.group_sqls = dict(group_sqls)
        self.measure_sqls = dict(measure_sqls)
        self.schema = schema
        self.max_files_per_trigger = max_files_per_trigger
        self.reader = reader
        # self-bounding merge-on-read: apply_batch compacts once delta
        # subtrees exceed this (see join_maintain.py for the pattern)
        self.auto_compact_batches = auto_compact_batches
        self.query = None

    # -- batch core (exposed for tests/replay) ---------------------------

    @leased("view_root", "agg_maintain")
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        gen = _resolve(self.view_root)
        _check_stream_stamp(gen, self.checkpoint_dir)
        if batch_id <= _compacted_through(gen):
            return  # already folded by a compaction — skip
        # schema-evolution contract (streaming/schema_guard.py): the
        # rollup's SQL expressions reference only first-batch columns,
        # so an upstream ADD COLUMN is ignored (not adopted — its later
        # removal is also a non-event); a dropped or retyped pinned
        # column fails loud with the rebuild path instead of feeding
        # the measures a silently different expression result.
        check_upstream_schema(
            self.view_root, struct_cols(batch), "AggMaintainJob",
            on_additive="ignore",
        )
        delta = rollup_delta(
            dedupe_redelivered(batch), self.group_sqls, self.measure_sqls
        )
        (
            delta.coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(gen, _DELTAS, f"ingest_batch={batch_id}"))
        )
        if self.auto_compact_batches is not None:
            self.compact(max_batches=self.auto_compact_batches)

    # -- reads ------------------------------------------------------------

    def _read_deltas(self) -> DataFrame | None:
        gen = _resolve(self.view_root)
        root = os.path.join(gen, _DELTAS)
        batches = _ingest_batches(root)
        if not batches:
            return None
        return self.spark.read.option("basePath", root).parquet(
            *[os.path.join(root, b) for b in batches]
        ).drop("ingest_batch")

    def view(self) -> DataFrame | None:
        """The maintained rollup: groups + measures + ``__n``, equal to
        the full recompute over all applied changes (additivity), with
        vanished groups removed."""
        deltas = self._read_deltas()
        if deltas is None:
            return None
        g = list(self.group_sqls)
        m = list(self.measure_sqls)
        # drop only all-zero rows (the additive identity) — the same
        # rule as merge_rollup: a zero-count group with a residual
        # indicates an inconsistent stream and must stay visible
        nonzero = F.col(_N) != 0
        for name in m:
            nonzero = nonzero | (F.col(name) != 0)
        return _fold(deltas, g, m).filter(nonzero)

    # -- compaction --------------------------------------------------------

    @leased("view_root", "agg_maintain")
    def compact(self, max_batches: int = 16, gc_previous: bool = True) -> int:
        """Fold per-batch delta subtrees into one in a NEW generation
        behind the atomic ``_CURRENT`` pointer — run OFF the ingest
        path with the job quiesced (the profiler/vector-index
        contract). Zero-count groups are kept in the folded state: a
        group balanced to zero by later retractions must still cancel
        against pre-compaction history. Returns subtrees folded."""
        gen = _resolve(self.view_root)
        batches = _ingest_batches(os.path.join(gen, _DELTAS))
        if len(batches) <= max_batches:
            return 0
        hi = max(int(b.split("=", 1)[1]) for b in batches)
        base = os.path.basename(gen)
        n = int(base.split("-", 1)[1]) if base.startswith("gen-") else 0
        new_gen_name = f"gen-{n + 1}"
        new_gen = os.path.join(self.view_root, new_gen_name)
        folded = _fold(
            self._read_deltas(), list(self.group_sqls), list(self.measure_sqls)
        )
        (
            folded.coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(new_gen, _DELTAS, f"ingest_batch={hi}"))
        )
        with open(os.path.join(new_gen, _COMPACT_WM_FILE), "w") as f:
            f.write(str(hi))
        old_ck = os.path.join(gen, "_CHECKPOINT_ID")
        if os.path.exists(old_ck):  # stream identity rides along
            shutil.copy(old_ck, os.path.join(new_gen, "_CHECKPOINT_ID"))
        _swap_current(self.view_root, new_gen_name)
        if gc_previous:
            if gen == self.view_root:
                shutil.rmtree(os.path.join(gen, _DELTAS), ignore_errors=True)
            else:
                shutil.rmtree(gen, ignore_errors=True)
        return len(batches)

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "AggMaintainJob":
        if self.reader is not None:
            stream = self.reader(self.spark)
        else:
            stream = (
                self.spark.readStream.schema(self.schema)
                .option("maxFilesPerTrigger", self.max_files_per_trigger)
                .parquet(self.source_dir)
            )
        self.query = (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option(
                "checkpointLocation",
                os.path.join(self.checkpoint_dir, "agg_maintain"),
            )
            .trigger(availableNow=True)
            .start()
        )
        return self

    def process_available(self) -> None:
        if self.query is not None:
            self.query.awaitTermination()

    def pause(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None

    def resume(self) -> "AggMaintainJob":
        if self.query is None:
            self.start()
        return self

    def position(self) -> dict:
        gen = _resolve(self.view_root)
        batches = [
            int(b.split("=", 1)[1])
            for b in _ingest_batches(os.path.join(gen, _DELTAS))
        ]
        return {
            "generation": os.path.basename(gen),
            "compacted_through": _compacted_through(gen),
            "max_ingest_batch": max(batches, default=-1),
        }

    def stats(self) -> dict:
        gen = _resolve(self.view_root)
        return {
            "type": "agg_maintain",
            "active": self.query is not None and self.query.isActive,
            "generation": os.path.basename(gen),
            "compacted_through": _compacted_through(gen),
            "ingest_batches": len(_ingest_batches(os.path.join(gen, _DELTAS))),
        }
