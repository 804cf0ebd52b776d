"""Atomic table commits through a single manifest file.

The directory-rename swap protocol (round 1-3) had a crash window:
between "old dir renamed aside" and "staged dir renamed in" the table
momentarily does not exist, and a crash there needs manual recovery.
This module removes the window the way a lake table format does, with
zero dependencies: data directories are IMMUTABLE and uniquely named,
readers resolve them through ``_manifest.json``, and the only mutation
a commit performs is one atomic ``os.rename`` of the manifest. A crash
at any point leaves the previous manifest — and therefore the previous
table state — fully readable; orphaned data dirs are garbage, not
corruption, and are collected by the next successful commit.

This is the jar-free analogue of a Delta/Iceberg log entry, matching
the reference applier's transactional guarantee
(driver/mysql/applier_incr.go:565-570: binlog position + data commit
in one tx). At 100 TB the same protocol holds: the manifest is O(number
of buckets) small, the rename is O(1), and data files are never moved
after their initial write.

Layout per table::

    <root>/<schema>/<table>/_manifest.json
    <root>/<schema>/<table>/<entry-dirs ...>

Manifest fields:

- ``entries``: logical segment -> dir name. ``"_table"`` for a whole-
  table image (unkeyed tables), ``"0" .. "N-1"`` for key buckets.
- ``seq_watermark``: per-source applied-seq high-water mark (the no-PK
  replay guard) — stored here so data + watermark commit atomically.
- ``key_cols`` / ``n_buckets``: bucketing spec, kept so DDL rewrites
  can re-bucket without being told the key again.
- ``schema_version``: bumped by DDL application (observability only).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

MANIFEST_NAME = "_manifest.json"


@dataclass
class TableManifest:
    entries: dict[str, str] = field(default_factory=dict)
    seq_watermark: dict[str, int] = field(default_factory=dict)
    key_cols: list[str] | None = None
    n_buckets: int | None = None
    schema_version: int = 0

    @staticmethod
    def load(table_dir: str) -> "TableManifest | None":
        p = os.path.join(table_dir, MANIFEST_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return TableManifest(
            entries=dict(d.get("entries", {})),
            seq_watermark={k: int(v) for k, v in d.get("seq_watermark", {}).items()},
            key_cols=d.get("key_cols"),
            n_buckets=d.get("n_buckets"),
            schema_version=int(d.get("schema_version", 0)),
        )

    def save(self, table_dir: str) -> None:
        """THE commit point: write aside, fsync, atomic rename over the
        live manifest. Readers see the old or the new state, never a
        torn one."""
        os.makedirs(table_dir, exist_ok=True)
        tmp = os.path.join(table_dir, f".{MANIFEST_NAME}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "entries": self.entries,
                    "seq_watermark": self.seq_watermark,
                    "key_cols": self.key_cols,
                    "n_buckets": self.n_buckets,
                    "schema_version": self.schema_version,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(table_dir, MANIFEST_NAME))

    def dirs(self, table_dir: str) -> list[str]:
        return [os.path.join(table_dir, d) for d in self.entries.values()]


def unique_entry_name(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:8]}"


def gc_unreferenced(table_dir: str, manifest: TableManifest) -> None:
    """Remove everything in the table dir the manifest does not
    reference: replaced data dirs, move-in orphans from a crashed
    commit, stray legacy top-level part files, stale manifest temps.
    Safe to crash mid-GC — unreferenced garbage stays garbage."""
    live = set(manifest.entries.values())
    for name in os.listdir(table_dir):
        if name == MANIFEST_NAME or name in live:
            continue
        p = os.path.join(table_dir, name)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                pass
