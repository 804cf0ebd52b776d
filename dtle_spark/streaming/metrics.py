"""Task metrics: the reference's TaskStatistics analogue.

Reference surface (driver/common/models.go:32-88): per-table
insert/update/delete counters (TableStats), throughput
(ThroughputStat), replication delay (DelayCount — wall delay of the
last applied event's source timestamp, extractor.go:930-970), progress
percent for the dump phase (ProgressPct, api/models/job_v2.go:40-43),
and handled tx/query counts. Operators of 100 TB pipelines live on
these numbers — especially applied-vs-source lag.

Spark restatement: ``apply_batch`` folds one bounded aggregate per
micro-batch (tables × ops rows + per-source max seq — driver-side
state is O(tables + sources), never O(rows)) into a ``TaskMetrics``
the job exposes via ``ReplicationJob.stats()`` / ``JobManager.metrics``.
Backlog is measured in the stream's own coordinate (source high-water
seq minus applied seq), which is exact under replay: seqs are monotone
per source.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class TableStats:
    """Per-table op counters (common/models.go:32-36)."""

    insert_count: int = 0
    update_count: int = 0
    del_count: int = 0
    ddl_count: int = 0

    def as_dict(self) -> dict:
        return {
            "insert_count": self.insert_count,
            "update_count": self.update_count,
            "del_count": self.del_count,
            "ddl_count": self.ddl_count,
        }


_OP_FIELD = {
    "i": "insert_count",
    "u": "update_count",
    "d": "del_count",
    "ddl": "ddl_count",
}


@dataclass
class TaskMetrics:
    table_stats: dict[str, TableStats] = field(default_factory=dict)
    exec_row_count: int = 0  # ExecMasterRowCount
    exec_tx_count: int = 0  # ExecMasterTxCount
    applied_seq: dict[str, int] = field(default_factory=dict)  # sid -> max seq
    last_event_ts: float | None = None  # newest applied source event (epoch s)
    last_batch_wall: float | None = None
    last_batch_rows: int = 0
    last_batch_seconds: float = 0.0
    stage: str = "incremental"  # "snapshot" during the dump phase
    snapshot_total_rows: int = 0
    snapshot_done_rows: int = 0

    def observe_batch(
        self,
        op_counts: list[tuple[str, str, str, int, float | None]],
        tx_count: int,
        seq_high: dict[str, int],
        batch_seconds: float,
    ) -> None:
        """Fold one micro-batch's bounded aggregate.

        ``op_counts``: (schema, table, op, rows, max_event_ts_epoch).
        """
        rows_total = 0
        for schema_name, table_name, op, n, max_ts in op_counts:
            key = f"{schema_name}.{table_name}"
            ts = self.table_stats.setdefault(key, TableStats())
            fld = _OP_FIELD.get(op)
            if fld is not None:
                setattr(ts, fld, getattr(ts, fld) + n)
            if op != "ddl":
                rows_total += n
            if max_ts is not None and (
                self.last_event_ts is None or max_ts > self.last_event_ts
            ):
                self.last_event_ts = max_ts
        self.exec_row_count += rows_total
        self.exec_tx_count += tx_count
        for sid, s in seq_high.items():
            self.applied_seq[sid] = max(self.applied_seq.get(sid, -1), s)
        self.last_batch_wall = time.time()
        self.last_batch_rows = rows_total
        self.last_batch_seconds = batch_seconds

    # -- derived ---------------------------------------------------------

    def rows_per_second(self) -> float | None:
        """ThroughputStat over the last applied batch."""
        if self.last_batch_seconds <= 0:
            return None
        return self.last_batch_rows / self.last_batch_seconds

    def delay_seconds(self, now: float | None = None) -> float | None:
        """DelayCount: wall delay of the last applied event's source
        timestamp (extractor.go:930-970). None until an event with a
        timestamp has been applied."""
        if self.last_event_ts is None:
            return None
        return max(0.0, (now if now is not None else time.time()) - self.last_event_ts)

    def progress_pct(self) -> str:
        """Dump progress (ProgressPct, api/models/job_v2.go:40-43)."""
        if self.stage != "snapshot" or self.snapshot_total_rows <= 0:
            return "100.0" if self.stage != "snapshot" else "0.0"
        return f"{100.0 * self.snapshot_done_rows / self.snapshot_total_rows:.1f}"

    def as_dict(self) -> dict:
        return {
            "stage": self.stage,
            "progress_pct": self.progress_pct(),
            "exec_row_count": self.exec_row_count,
            "exec_tx_count": self.exec_tx_count,
            "applied_seq": dict(self.applied_seq),
            "rows_per_second": self.rows_per_second(),
            "delay_seconds": self.delay_seconds(),
            "table_stats": {k: v.as_dict() for k, v in self.table_stats.items()},
        }
