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
        # preflight: fail HERE, not mid-stream (inspect.go:89-180)
        from dtle_spark.inspect import preflight

        preflight(job, catalog, self.spark)
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
        lifecycle + per-table op counters, throughput, delay, applied
        position (streaming/metrics.TaskMetrics)."""
        return self._jobs[name].stats()

    def versions(self, name: str) -> dict:
        """Retained target-table commit versions (manifest time travel):
        the audit surface for "what did the table look like N batches
        ago" — read back via target.read_at_version."""
        return self._jobs[name].table_versions()

    def delete(self, name: str) -> None:
        """Delete = stop + deregister (checkpoint/target dirs are the
        caller's to clean, matching the reference's delete semantics)."""
        rj = self._jobs.pop(name)
        rj.pause()

    def reverse(
        self,
        name: str,
        source_dir: str,
        target_root: str,
        checkpoint_dir: str,
        catalog: SchemaCatalog,
        local_sid: str | None = None,
        start: bool = True,
        **kw,
    ) -> ReplicationJob:
        """The reverse_start workflow (api/handler/v2/job.go
        /v2/job/reverse + reverse_start): derive "reverse-<name>" from
        a registered forward job — direction inverted per table
        (model.reverse_job_config), cycle prevention armed via
        local_sid — and start it consuming the reverse-direction wire
        stream. The forward job must be paused first (the reference
        sequences this with WaitOnJob: the reverse src waits on the
        forward job's completion)."""
        from dtle_spark.model import reverse_job_config

        fwd = self._jobs[name]
        if fwd.query is not None and fwd.query.isActive:
            raise ValueError(f"pause forward job {name!r} before reversing")
        rev = reverse_job_config(fwd.job, local_sid=local_sid)
        return self.create(
            rev, source_dir, target_root, checkpoint_dir, catalog,
            start=start, **kw,
        )
