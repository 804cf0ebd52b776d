"""GTID-set algebra: interval-compacted executed-transaction tracking.

The reference maintains a queryable applied-gtid state in
``dtle.gtid_executed_v4`` — one row per (source_uuid, gno) compacted
periodically into interval rows (/root/reference/driver/mysql/
applier_gtid_executed.go:17-25: "interval entry: source_uuid,
interval_gtid ('1-30:32-33')"). Idempotence checks and the position
API both read it (applier_incr.go:290-313).

Spark restatement: the set lives driver-side (one instance per job —
O(#sources × #interval-runs), tiny) and persists as JSON next to the
streaming checkpoint; only tx *ids* ever travel to the driver, never
row data. ``add`` keeps intervals sorted and merged, so the
compaction the reference runs as a periodic SQL job is structural
here.

MySQL GTID-set string syntax (public format, e.g. SHOW MASTER STATUS):
``sid1:1-30:32-33,sid2:1-7``; intervals are 1-based inclusive,
single gno renders without the dash.
"""

from __future__ import annotations

import json
import os
import uuid as _uuid


class GtidSet:
    """Per-source interval set of executed GNOs, always compacted."""

    def __init__(self) -> None:
        # sid -> sorted non-overlapping non-adjacent [start, end] pairs
        self._intervals: dict[str, list[list[int]]] = {}

    # -- mutation ----------------------------------------------------------
    def add(self, sid: str, gno: int) -> None:
        self.add_interval(sid, gno, gno)

    def add_interval(self, sid: str, start: int, end: int) -> None:
        if end < start:
            raise ValueError(f"bad interval {start}-{end}")
        ivs = self._intervals.setdefault(sid, [])
        ivs.append([start, end])
        ivs.sort()
        merged: list[list[int]] = []
        for s, e in ivs:
            if merged and s <= merged[-1][1] + 1:  # overlap or adjacency
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        self._intervals[sid] = merged

    def union(self, other: "GtidSet") -> "GtidSet":
        for sid, ivs in other._intervals.items():
            for s, e in ivs:
                self.add_interval(sid, s, e)
        return self

    # -- queries -----------------------------------------------------------
    def contains(self, sid: str, gno: int) -> bool:
        for s, e in self._intervals.get(sid, []):
            if s <= gno <= e:
                return True
            if s > gno:
                break
        return False

    def contains_set(self, other: "GtidSet") -> bool:
        return all(
            any(s <= os_ and oe <= e for s, e in self._intervals.get(sid, []))
            for sid, ivs in other._intervals.items()
            for os_, oe in ivs
        )

    def interval_count(self) -> int:
        return sum(len(v) for v in self._intervals.values())

    # -- wire format -------------------------------------------------------
    def to_str(self) -> str:
        parts = []
        for sid in sorted(self._intervals):
            runs = ":".join(
                f"{s}-{e}" if e > s else f"{s}" for s, e in self._intervals[sid]
            )
            parts.append(f"{sid}:{runs}")
        return ",".join(parts)

    @classmethod
    def from_str(cls, text: str) -> "GtidSet":
        out = cls()
        if not text.strip():
            return out
        for part in text.split(","):
            bits = part.strip().split(":")
            sid = str(_uuid.UUID(bits[0]))  # validates + canonicalizes
            for run in bits[1:]:
                if "-" in run:
                    s, e = run.split("-")
                    out.add_interval(sid, int(s), int(e))
                else:
                    out.add(sid, int(run))
        return out

    # -- persistence (atomic file swap, checkpoint-adjacent) ---------------
    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self._intervals, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "GtidSet":
        out = cls()
        if not os.path.exists(path):
            return out
        with open(path) as f:
            data = json.load(f)
        for sid, ivs in data.items():
            for s, e in ivs:
                out.add_interval(sid, s, e)
        return out
