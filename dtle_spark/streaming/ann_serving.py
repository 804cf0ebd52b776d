"""Online vector serving: the STREAMING half of the persisted IVF-PQ
index (functions/similarity.py ivf_pq_build_index / ivf_pq_topk_indexed).

Two jobs close the loop the batch path opens:

- :class:`VectorIndexMaintainJob` — new vectors arrive as a stream and
  are folded into the cell-partitioned index O(batch): each micro-batch
  is encoded and cell-assigned against the FROZEN model (broadcast
  centroid table + codebook — both map-only stages, no shuffle of the
  corpus) and lands as one ``ingest_batch=<id>/cell=<c>/`` parquet
  subtree. Replay-idempotent by construction: a redelivered batch
  OVERWRITES its own ``ingest_batch`` directory, so at-least-once
  delivery converges to exactly-once index content. The base build is
  just batch 0 through the same writer — one layout, one owner.
- :class:`AnnServingJob` — query vectors arrive as a stream; each
  micro-batch probes the CURRENT index through ivf_pq_topk_indexed
  (static cell IN filter -> the scan reads only nprobe/n_cells of the
  files, and only the probed cells' 8-byte codes cross the wire), and
  the top-k results commit to a manifest table atomically with the
  batch watermark (same replay contract as corpus ingest: a batch id
  at or below the committed watermark is skipped).

Freshness falls out of the layout: the serving side re-plans the index
scan per micro-batch, so vectors appended by the maintain job between
two query batches are candidates for the second batch with no
coordination — the partition tree IS the synchronization point.

At 100 TB: the model (16 centroids + m*ksub codebook rows) is
broadcast-sized by construction; maintain cost is O(new vectors) with
no history reads; serving cost is |Q| * nprobe/n_cells code rows read
from disk per batch. Neither job ever rewrites or rescans the
accumulated index. Equality of the served results with the inline
ivf_pq_topk tier is pytest-pinned (shared _ivf_pq_adc stage — the two
cannot diverge).

Reference context: the reference has no vector surface; this extends
its streaming apply/serving split (driver/mysql/applier_incr.go's
incremental apply loop) to the ANN family, SURVEY §2.6.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.functions import similarity as sim
from dtle_spark.sinks.table_sink import ParquetTableTarget

SCHEMA_NAME = "serving"
RESULTS_TABLE = "ann_results"
_WM_KEY = "__serve_batch"

VECTOR_SCHEMA = "vec_id long, embedding array<float>"


class VectorIndexMaintainJob:
    """Fold a vector stream into the cell-partitioned IVF-PQ index
    against a frozen model. ``centroids`` / ``codebook`` are the pinned
    training outputs (similarity.ivf_exact_mean_centroids / pq_refine);
    they are validated once and localCheckpointed so every batch reuses
    the same broadcast tables."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        index_root: str,
        checkpoint_dir: str,
        centroids: DataFrame,
        codebook: DataFrame,
        m: int = 8,
        ksub: int = 16,
        dim: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        schema: str = VECTOR_SCHEMA,
        max_files_per_trigger: int = 1,
        reader=None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.index_root = index_root
        self.checkpoint_dir = checkpoint_dir
        # stale/gapped models fail HERE, not per-batch mid-stream
        sim._require_dense_codebook(codebook, m, ksub, dim // m)
        self.centroids = centroids.localCheckpoint()
        self.codebook = codebook.localCheckpoint()
        self.m, self.ksub, self.dim = m, ksub, dim
        self.id_col, self.vec_col = id_col, vec_col
        self.schema = schema
        self.max_files_per_trigger = max_files_per_trigger
        self.reader = reader
        self.query = None

    # -- batch core (exposed for tests/replay) ---------------------------

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        celled = sim.ivf_pq_build_index(
            batch, self.centroids, self.codebook,
            m=self.m, ksub=self.ksub, dim=self.dim,
            id_col=self.id_col, vec_col=self.vec_col,
        )
        # idempotent append: the batch owns its own partition subtree —
        # a redelivery overwrites it in place, never duplicating codes
        (
            celled.write.partitionBy("cell")
            .mode("overwrite")
            .parquet(os.path.join(self.index_root, f"ingest_batch={batch_id}"))
        )

    # -- lifecycle -------------------------------------------------------

    def start(self) -> "VectorIndexMaintainJob":
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
            .option("checkpointLocation", os.path.join(self.checkpoint_dir, "index"))
            .trigger(availableNow=True)
            .start()
        )
        return self

    def process_available(self) -> None:
        if self.query is not None:
            self.query.awaitTermination()

    def index(self) -> DataFrame:
        """The whole accumulated index (partition discovery adds the
        ingest_batch/cell columns). Probes never read it this way —
        they go through ivf_pq_topk_indexed's static cell filter."""
        return self.spark.read.parquet(self.index_root)


class AnnServingJob:
    """Serve a query-vector stream from the persisted index. Results
    land in a manifest-committed table with the batch watermark, so a
    replayed micro-batch is skipped — at-least-once delivery converges
    to exactly-once result content.

    ``vectors`` (optional) is the fp32 corpus view used when
    ``rerank > 0`` — in production the corpus table the index was built
    from. Passed as a zero-arg callable returning a DataFrame so each
    batch reranks against the CURRENT corpus, not a snapshot bound at
    job construction."""

    def __init__(
        self,
        spark: SparkSession,
        query_source_dir: str,
        index_root: str,
        results_root: str,
        checkpoint_dir: str,
        centroids: DataFrame,
        codebook: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        m: int = 8,
        ksub: int = 16,
        dim: int = 64,
        rerank: int = 0,
        vectors=None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        schema: str = VECTOR_SCHEMA,
        max_files_per_trigger: int = 1,
        reader=None,
    ):
        self.spark = spark
        self.query_source_dir = query_source_dir
        self.index_root = index_root
        self.checkpoint_dir = checkpoint_dir
        if vectors is not None and not callable(vectors):
            raise ValueError(
                "vectors must be a zero-arg callable returning the fp32 "
                "corpus DataFrame (so rerank sees the current corpus)"
            )
        if rerank and vectors is None:
            raise ValueError("rerank > 0 needs the fp32 `vectors` callable")
        sim._require_dense_codebook(codebook, m, ksub, dim // m)
        self.centroids = centroids.localCheckpoint()
        self.codebook = codebook.localCheckpoint()
        self.k, self.nprobe = k, nprobe
        self.m, self.ksub, self.dim = m, ksub, dim
        self.rerank = rerank
        self.vectors = vectors
        self.id_col, self.vec_col = id_col, vec_col
        self.schema = schema
        self.max_files_per_trigger = max_files_per_trigger
        self.reader = reader
        self.target = ParquetTableTarget(results_root)
        self.query = None

    # -- batch core (exposed for tests/replay) ---------------------------

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        wm = self.target.seq_watermark(SCHEMA_NAME, RESULTS_TABLE)
        if wm.get(_WM_KEY, -1) >= batch_id:
            return  # replayed batch already committed — skip (idempotent)
        out = sim.ivf_pq_topk_indexed(
            self.spark, self.index_root, batch,
            self.centroids, self.codebook,
            vectors=self.vectors() if self.vectors is not None else None,
            k=self.k, nprobe=self.nprobe,
            m=self.m, ksub=self.ksub, dim=self.dim,
            id_col=self.id_col, vec_col=self.vec_col, rerank=self.rerank,
        )
        self.target.append(
            out.withColumn(_WM_KEY, F.lit(batch_id)),
            SCHEMA_NAME, RESULTS_TABLE, seq_watermark={_WM_KEY: batch_id},
        )

    # -- lifecycle -------------------------------------------------------

    def start(self) -> "AnnServingJob":
        if self.reader is not None:
            stream = self.reader(self.spark)
        else:
            stream = (
                self.spark.readStream.schema(self.schema)
                .option("maxFilesPerTrigger", self.max_files_per_trigger)
                .parquet(self.query_source_dir)
            )
        self.query = (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", os.path.join(self.checkpoint_dir, "serve"))
            .trigger(availableNow=True)
            .start()
        )
        return self

    def process_available(self) -> None:
        if self.query is not None:
            self.query.awaitTermination()

    def results(self) -> DataFrame | None:
        return self.target.read(self.spark, SCHEMA_NAME, RESULTS_TABLE)
