"""Streaming corpus ingest: the training-data pipeline in streaming
mode — raw document micro-batches flow through exact + near-dup
filtering AGAINST THE ACCUMULATED CORPUS, and survivors append to a
manifest-committed table.

Composition of existing pieces, no new algorithms:

- within-batch exact dedup (fingerprint keep-min),
- cross-batch dedup via the PERSISTED dedup index: survivors are
  stored WITH their index columns (exact fingerprint, hashed shingle
  set, LSH band digests — :func:`with_dedup_index`), so each new batch
  probes stored columns (:func:`probe_index`) and the history text is
  fingerprinted exactly ONCE, at its own ingest. At 100 TB an
  increment costs O(increment) hashing + index equi-joins — history is
  never re-hashed. Keeping the index columns IN the corpus table makes
  data + index one atomic commit (no cross-table crash window),
- log-structured append (:meth:`ManifestedTarget.append`): each batch
  commits as one additional manifest entry, O(batch) regardless of
  corpus size, atomically with the batch-id watermark (replay-safe:
  foreachBatch redelivers on crash; a batch id at or below the
  committed watermark is skipped, so at-least-once delivery converges
  to exactly-once corpus content),
- manifest time travel gives per-batch corpus snapshots for free.

probe_index's equivalence to the re-hashing operator
(incremental_neardup_filter) is pytest-pinned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.functions.dedup import (
    INDEX_COLS,
    probe_index,
    probe_index_self,
    with_dedup_index,
)
from dtle_spark.sinks.table_sink import ParquetTableTarget

SCHEMA_NAME = "corpus"
TABLE_NAME = "documents"
_WM_KEY = "__ingest_batch"


class CorpusIngestJob:
    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        target_root: str,
        checkpoint_dir: str,
        schema: str = "doc_id long, text string, lang string, source string",
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
        max_files_per_trigger: int = 1,
        reader=None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.schema = schema
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.max_files_per_trigger = max_files_per_trigger
        # raw-corpus on-ramp hook: a callable (spark) -> STREAMING
        # documents frame (e.g. sources/text_corpus.stream_jsonl_corpus
        # over a JSONL dump tree); None keeps the parquet default.
        # Everything downstream — index columns, near-dup probes,
        # manifest commits — is shape-driven, so any documents-shaped
        # stream plugs in.
        self.reader = reader
        self.target = ParquetTableTarget(target_root)
        self.query = None

    # -- batch core (exposed for tests/replay) ---------------------------

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        wm = self.target.seq_watermark(SCHEMA_NAME, TABLE_NAME)
        if wm.get(_WM_KEY, -1) >= batch_id:
            return  # replayed batch already committed — skip (idempotent)
        # hash the INCREMENT once: index columns computed here are both
        # the probe side now and the stored index afterwards
        indexed = with_dedup_index(batch, self.id_col, self.text_col).localCheckpoint(
            eager=False
        )
        # within-batch exact dedup: keep the min id per fingerprint.
        # dropDuplicates on (id, fingerprint) afterwards: content-hashed
        # on-ramps (doc_id = xxhash64(source, text)) give IDENTICAL ids
        # to identical rows, so several copies can all equal the min —
        # same (id, fp) rows are the same document by construction.
        # The fingerprint stays in the key so an id COLLISION between
        # two DISTINCT texts never silently drops one (the documented
        # invariant: collisions cannot merge distinct documents)
        keeper = indexed.groupBy("__fp").agg(F.min(self.id_col).alias("__keep"))
        indexed = (
            indexed.join(keeper, "__fp")
            .filter(F.col(self.id_col) == F.col("__keep"))
            .drop("__keep")
            .dropDuplicates([self.id_col, "__fp"])
        )
        # within-batch NEAR-dup pass (ADVICE r4: two near-duplicates in
        # one micro-batch must not both enter the corpus permanently) —
        # same index columns, greedy keep-min per pair
        self_drops = probe_index_self(
            indexed, id_col=self.id_col, threshold=self.threshold
        )
        indexed = indexed.join(
            self_drops, indexed[self.id_col] == self_drops["id"], "left_anti"
        ).localCheckpoint(eager=False)
        history = self.target.read(self.spark, SCHEMA_NAME, TABLE_NAME)
        if history is not None:
            dropped = probe_index(
                history, indexed, id_col=self.id_col, threshold=self.threshold
            )
            survivors = indexed.join(
                dropped, indexed[self.id_col] == dropped["id"], "left_anti"
            )
        else:
            survivors = indexed
        # commit data + index + watermark in ONE manifest swap
        self.target.append(
            survivors, SCHEMA_NAME, TABLE_NAME, seq_watermark={_WM_KEY: batch_id}
        )

    # -- lifecycle -------------------------------------------------------

    def start(self) -> "CorpusIngestJob":
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
            .option("checkpointLocation", os.path.join(self.checkpoint_dir, "ingest"))
            .trigger(availableNow=True)
            .start()
        )
        return self

    def process_available(self) -> None:
        if self.query is not None:
            self.query.awaitTermination()

    def corpus(self) -> DataFrame | None:
        """User view: the deduplicated documents, index columns hidden
        (they stay stored — the probe side of the next batch)."""
        df = self.target.read(self.spark, SCHEMA_NAME, TABLE_NAME)
        if df is None:
            return None
        return df.drop(*INDEX_COLS)
