"""A behavioral fake of python-mysql-replication's public surface —
installed into ``sys.modules['pymysqlreplication']`` by the transport
tests so MySQLBinlogBridge.tail()'s REAL live branch (reader=None:
import, construct BinlogStreamReader, iterate) runs end-to-end, not
just the injected-reader loop (VERDICT r10 task 8 direction).

Modeled semantics (the parts the bridge's correctness relies on):

- the constructor registers against a server and honors
  ``auto_position``: a MySQL replica handshaking with
  COM_BINLOG_DUMP_GTID sends its executed-GTID set and the SERVER
  skips every transaction contained in it — the real resume path.
  (The bridge also skips client-side via its translator; this fake
  proves the executed set is actually WIRED into the constructor.)
- events are delivered as objects with the library's attribute
  surface (GtidEvent.gtid, QueryEvent.schema bytes/query,
  Write/Update/DeleteRowsEvent.schema/table/rows, XidEvent.xid,
  RotateEvent.next_binlog/position, .timestamp, .packet.log_pos) —
  the same shapes binlog_event_object_to_dict consumes.
- iteration ends when the (fake) server has no more events — the
  connection-drop execution of a blocking=True reader; a live tail
  would block instead, which tests bound with stop_after_txs.
"""

from __future__ import annotations


class _Packet:
    def __init__(self, log_pos: int):
        self.log_pos = log_pos


def make_event(name: str, log_pos: int | None = None, **attrs):
    ev = type(name, (), {})()
    if log_pos is not None:
        ev.packet = _Packet(log_pos)
    for k, v in attrs.items():
        setattr(ev, k, v)
    return ev


class FakeReplicationServer:
    """Holds a binlog as GTID-delimited transaction groups and serves
    dump requests, skipping transactions the replica already executed
    (its COM_BINLOG_DUMP_GTID set)."""

    def __init__(self):
        # (sid, gno, [event objects for the whole tx, GtidEvent first])
        self.txs: list[tuple[str, int, list]] = []
        self.dump_requests: list[dict] = []

    def append_tx(self, sid: str, gno: int, events: list) -> None:
        self.txs.append((sid, gno, events))

    def dump(self, auto_position: str | None):
        from dtle_spark.sources.gtid import GtidSet

        executed = GtidSet.from_str(auto_position) if auto_position else None
        out = [make_event("RotateEvent", next_binlog="mysql-bin.000009",
                          position=4)]
        for sid, gno, events in self.txs:
            if executed is not None and executed.contains(sid, gno):
                continue  # server-side skip: the point of auto_position
            out.extend(events)
        return out


# the server a BinlogStreamReader connects to; tests assign it
SERVER: FakeReplicationServer | None = None


class BinlogStreamReader:
    """python-mysql-replication's constructor surface, served from
    ``SERVER``."""

    def __init__(self, connection_settings=None, server_id=None,
                 blocking=False, resume_stream=False, auto_position=None,
                 **kwargs):
        if SERVER is None:
            raise RuntimeError("no FakeReplicationServer installed")
        self.connection_settings = connection_settings
        self.server_id = server_id
        self.blocking = blocking
        self.resume_stream = resume_stream
        self.auto_position = auto_position
        SERVER.dump_requests.append({
            "server_id": server_id,
            "auto_position": auto_position,
            "blocking": blocking,
            "resume_stream": resume_stream,
        })
        self._events = SERVER.dump(auto_position)

    def __iter__(self):
        return iter(self._events)

    def close(self):
        pass
