"""Streaming corpus ingest: the training-data pipeline in streaming
mode — raw document micro-batches flow through exact + near-dup
filtering AGAINST THE ACCUMULATED CORPUS, and survivors append to a
manifest-committed table.

Composition of existing pieces, no new algorithms:

- within-batch exact dedup (fingerprint keep-min),
- cross-batch dedup via
  :func:`dtle_spark.functions.dedup.incremental_neardup_filter`
  (exact fingerprint membership + LSH band probe against the history,
  jaccard-verified) — the daily-ingest operator, driven per micro-batch,
- log-structured append (:meth:`ManifestedTarget.append`): each batch
  commits as one additional manifest entry, O(batch) regardless of
  corpus size, atomically with the batch-id watermark (replay-safe:
  foreachBatch redelivers on crash; a batch id at or below the
  committed watermark is skipped, so at-least-once delivery converges
  to exactly-once corpus content),
- manifest time travel gives per-batch corpus snapshots for free.

At 100 TB the history side of the probe must be a PRECOMPUTED index
(band digests + hash sets stored once per doc — see
incremental_neardup_filter's docstring); this driver re-derives it per
batch, which is correct at any scale but re-hashes history: swap
``read_history`` for the index table to go production-scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.functions.dedup import incremental_neardup_filter
from dtle_spark.functions.textstats import doc_fingerprint
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
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.schema = schema
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.max_files_per_trigger = max_files_per_trigger
        self.target = ParquetTableTarget(target_root)
        self.query = None

    # -- batch core (exposed for tests/replay) ---------------------------

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        wm = self.target.seq_watermark(SCHEMA_NAME, TABLE_NAME)
        if wm.get(_WM_KEY, -1) >= batch_id:
            return  # replayed batch already committed — skip (idempotent)
        # within-batch exact dedup: keep the min id per fingerprint
        fp = batch.withColumn("__fp", doc_fingerprint(F.col(self.text_col)))
        keeper = fp.groupBy("__fp").agg(F.min(self.id_col).alias("__keep"))
        batch = (
            fp.join(keeper, "__fp")
            .filter(F.col(self.id_col) == F.col("__keep"))
            .drop("__fp", "__keep")
        )
        history = self.target.read(self.spark, SCHEMA_NAME, TABLE_NAME)
        if history is not None:
            survivors = incremental_neardup_filter(
                history,
                batch,
                id_col=self.id_col,
                text_col=self.text_col,
                threshold=self.threshold,
            )
        else:
            survivors = batch
        # commit data + watermark in ONE manifest swap (crash-safe)
        self.target.append(
            survivors, SCHEMA_NAME, TABLE_NAME, seq_watermark={_WM_KEY: batch_id}
        )

    # -- lifecycle -------------------------------------------------------

    def start(self) -> "CorpusIngestJob":
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
        return self.target.read(self.spark, SCHEMA_NAME, TABLE_NAME)
