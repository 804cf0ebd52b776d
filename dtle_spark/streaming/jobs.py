"""Job manager: the reference's HTTP v2 control surface as a library
(reference §2.7 — api/handler/v2/job.go create/list/detail/pause/
resume/delete/position). Cluster state that dtle keeps in Consul
(``dtle/<job>/{Gtid, Config, ...}``, common/store.go:40-446) collapses
into streaming checkpoints + this registry; there is no transport tier
because Spark moves the data.
"""

from __future__ import annotations

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.model import JobConfig
from dtle_spark.streaming.pipeline import ReplicationJob


class JobManager:
    def __init__(self, spark):
        self.spark = spark
        self._jobs: dict[str, ReplicationJob] = {}

    def create(
        self,
        job: JobConfig,
        source_dir: str,
        target_root: str,
        checkpoint_dir: str,
        catalog: SchemaCatalog,
        start: bool = True,
        **kw,
    ) -> ReplicationJob:
        if job.name in self._jobs:
            raise ValueError(f"job {job.name!r} already exists")
        rj = ReplicationJob(
            self.spark, job, source_dir, target_root, checkpoint_dir, catalog, **kw
        )
        self._jobs[job.name] = rj
        if start:
            rj.start()
        return rj

    def list(self) -> dict[str, dict]:
        return {name: rj.stats() for name, rj in self._jobs.items()}

    def get(self, name: str) -> ReplicationJob:
        return self._jobs[name]

    def pause(self, name: str) -> None:
        self._jobs[name].pause()

    def resume(self, name: str) -> None:
        self._jobs[name].resume()

    def position(self, name: str) -> dict:
        return self._jobs[name].position()

    def metrics(self, name: str) -> dict:
        """TaskStatistics analogue (reference common/models.go:69-88):
        per-batch rows + processing rate from the streaming progress."""
        rj = self._jobs[name]
        if rj.query is None or rj.query.lastProgress is None:
            return {}
        p = rj.query.lastProgress
        return {
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows"),
            "rows_per_second": p.get("processedRowsPerSecond"),
            "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        }

    def delete(self, name: str) -> None:
        """Delete = stop + deregister (checkpoint/target dirs are the
        caller's to clean, matching the reference's delete semantics)."""
        rj = self._jobs.pop(name)
        rj.pause()
