"""Advisory writer lease for manifest-swap critical sections.

Every maintained store commits through an atomic manifest (or
generation-pointer) swap, which makes READERS safe — but two WRITERS
doing load-modify-save concurrently lose one update silently (the
r12 advice incident: an HTTP purge racing a foreachBatch append
erased the append from the manifest, and the purge's history
severing then physically deleted the committed segment's data).
The job-level guards (pause checks on the HTTP routes) cover the
in-process cases; this lease is the cross-process / direct-call
backstop the quiesce contracts ("run compact/purge/reindex quiesced")
previously only documented.

Semantics — deliberately advisory and loud, not a blocking lock:

- ``with writer_lease(root, "op")`` atomically creates
  ``<root>/_WRITER_LEASE`` (O_CREAT|O_EXCL) holding
  {pid, thread, owner, ts}; a second writer on the same root gets a
  RuntimeError naming the holder instead of racing the swap.
- RE-ENTRANT per (pid, thread): a maintainer's apply_batch holds the
  lease while its auto-compact chore re-enters — one writer thread is
  one writer. A DIFFERENT thread of the same process fails like any
  other writer (an HTTP thread racing the foreachBatch thread is
  exactly the incident class).
- a lease whose pid is DEAD (same-host check, os.kill(pid, 0)) is
  broken and re-taken — a crashed writer must not wedge the store;
  the manifest swap's atomicity means a crash mid-section left either
  the old or the new manifest, both consistent.
- leases are per STORE ROOT (the table dir / view_root / index_root),
  matching the manifest granularity.

This is a single-host advisory protocol (pid liveness is only
checkable locally). On shared storage with writers on multiple hosts,
an external scheduler must provide the exclusion — same stance as the
HA/failover scope note in PARITY.md.
"""

from __future__ import annotations

import fcntl
import json
import os
import threading
import time
from contextlib import contextmanager

LEASE_FILE = "_WRITER_LEASE"
LEASE_MUTEX = LEASE_FILE + ".lock"  # flock target serializing lease mutation

_lock = threading.Lock()
_held: dict[str, tuple[int, int]] = {}  # abs root -> (thread_id, depth)


@contextmanager
def _mutate_lock(root: str):
    """flock-serialize every mutation of the lease FILE (create, stale
    break, release). The r13 advice TOCTOU: writers B and C both read a
    dead holder; C removes the stale file and creates its own live
    lease; B's later os.remove then deletes C's FRESH lease and both
    hold. flock closes it — check+break+create is one critical section,
    across threads AND processes on this host (the protocol is
    explicitly single-host; pid liveness is only checkable locally).
    The kernel drops the flock on process death, so a crashed mutator
    never wedges acquisition."""
    os.makedirs(root, exist_ok=True)
    fd = os.open(os.path.join(root, LEASE_MUTEX), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        os.close(fd)  # releases the flock


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


@contextmanager
def writer_lease(root: str, owner: str = "writer"):
    """Hold the store root's writer lease for the duration of a
    manifest-mutating section. Raises RuntimeError (loud, naming the
    holder) when another live writer holds it."""
    key = os.path.abspath(root)
    me = threading.get_ident()
    with _lock:
        held = _held.get(key)
        if held is not None and held[0] == me:
            _held[key] = (me, held[1] + 1)  # re-entry, same thread
            nested = True
        else:
            nested = False
    if not nested:
        _acquire(key, owner)
        with _lock:
            _held[key] = (me, 1)
    try:
        yield
    finally:
        with _lock:
            tid, depth = _held[key]
            if depth > 1:
                _held[key] = (tid, depth - 1)
                return
            del _held[key]
        _release(key)


def _release(root: str) -> None:
    """Ownership-checked release: remove the lease file ONLY if it
    still names this pid+thread. The r13 advice cascade: gc swept the
    holder's lease mid-section, a second writer acquired, and the first
    holder's unconditional finally-remove deleted the SECOND writer's
    lease — re-opening the lost-commit race the lease exists to
    prevent. Verifying ownership under the mutation flock makes a
    usurped release a loud no-op instead of a cascading theft."""
    path = os.path.join(root, LEASE_FILE)
    with _mutate_lock(root):
        try:
            with open(path) as f:
                info = json.load(f)
        except (OSError, ValueError):
            return  # already gone/unreadable: nothing of ours to drop
        if (
            int(info.get("pid", -1)) == os.getpid()
            and int(info.get("thread", -1)) == threading.get_ident()
        ):
            try:
                os.remove(path)
            except OSError:
                pass


def leased(attr: str, owner: str):
    """Method decorator: hold ``writer_lease(getattr(self, attr))``
    for the call — the one-line wiring for maintainer apply_batch /
    compact methods (re-entrancy makes auto-compact-inside-apply_batch
    a non-event)."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(self, *a, **k):
            with writer_lease(getattr(self, attr), owner):
                return fn(self, *a, **k)
        return wrapper
    return deco


def _acquire(root: str, owner: str) -> None:
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, LEASE_FILE)
    with _mutate_lock(root):
        _acquire_locked(path, root, owner)


def _acquire_locked(path: str, root: str, owner: str) -> None:
    for attempt in (0, 1):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(path) as f:
                    info = json.load(f)
            except (OSError, ValueError):
                info = {}
            pid = int(info.get("pid", -1))
            if attempt == 0 and pid > 0 and not _pid_alive(pid):
                # crashed writer: the swap's atomicity left the store
                # consistent; break the stale lease and retry once.
                # Safe under the mutation flock: no other writer can
                # replace the file between this read and this remove.
                try:
                    os.remove(path)
                except OSError:
                    pass
                continue
            raise RuntimeError(
                f"{root}: writer lease held by "
                f"{info.get('owner', '?')!r} (pid {info.get('pid', '?')}"
                f", thread {info.get('thread', '?')}) since "
                f"{info.get('ts', '?')} — a second writer would race "
                "the manifest swap and silently lose a commit. Pause "
                "or finish the other writer; a crashed holder's lease "
                "self-breaks on the next attempt."
            )
        os.write(fd, json.dumps({
            "pid": os.getpid(), "thread": threading.get_ident(),
            "owner": owner, "ts": time.time(),
        }).encode())
        os.close(fd)
        return
