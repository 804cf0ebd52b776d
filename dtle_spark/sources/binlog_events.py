"""MySQL binlog event -> wire-row translation (reference S6).

The reference's BinlogReader consumes go-mysql replication events and
assembles per-transaction entries (/root/reference/driver/mysql/binlog/
binlog_reader.go:450-496 handleEvent; :1848-1990 handleRowsEvent):

  GTID_EVENT  -> opens a tx: (SID, GNO, LastCommitted, SequenceNumber)
  QUERY_EVENT -> BEGIN (marker) | COMMIT (flush) | DDL (own entry,
                 do/ignore-filtered + skip-regexed, :1200-1330)
  ROWS_EVENT  -> buffered DML rows; update events carry before/after
                 row PAIRS (:1936 "expect 2N rows for an update event")
  XID_EVENT   -> closes + emits the tx entry

This module is that translation as pure Python over plain event dicts —
everything except the network socket, so it golden-tests offline
(mirroring binlog_reader_test.go's resolveQuery/matchTable tables).
``MySQLBinlogBridge`` (cdc_bridge.py) feeds it from a live
python-mysql-replication stream when that library exists; tests feed it
canned events. Output rows are wire-form dicts (streaming/wire.py
schema: images as JSON text, so one stream carries many tables).

Event dict shapes (the library-neutral subset both go-mysql and
python-mysql-replication expose):

  {"type": "gtid", "sid": str, "gno": int,
   "last_committed": int, "sequence_number": int}
  {"type": "query", "schema": str, "query": str, "timestamp": int,
   "log_pos": int}
  {"type": "rows", "op": "insert"|"update"|"delete", "schema": str,
   "table": str, "timestamp": int, "log_pos": int,
   "rows": [image] for insert/delete, [(before, after)] for update}
  {"type": "xid", "xid": int, "log_pos": int}
  {"type": "rotate", "next_log": str, "position": int}
"""

from __future__ import annotations

import datetime as _dt
import json
import re
from dataclasses import dataclass, field

from dtle_spark.model import OP_DDL, OP_DELETE, OP_INSERT, OP_UPDATE
from dtle_spark.operators.filters import SYSTEM_SCHEMAS, is_skip_query
from dtle_spark.sources.gtid import GtidSet


# ---------------------------------------------------------------------------
# Table selection (matchTable, binlog_reader.go:1332-1372): a DataSource
# selects a whole schema (no tables listed) or named/regex tables;
# schemas themselves may be named or regex.
# ---------------------------------------------------------------------------


@dataclass
class TablePattern:
    name: str | None = None
    regex: str | None = None

    def matches(self, table: str) -> bool:
        if self.name is not None:
            return self.name == table
        if self.regex is not None:
            return re.search(self.regex, table) is not None
        return False


@dataclass
class SchemaPattern:
    schema: str | None = None
    schema_regex: str | None = None
    tables: list[TablePattern] = field(default_factory=list)

    def matches_schema(self, schema: str) -> bool:
        if self.schema is not None:
            return self.schema == schema
        if self.schema_regex is not None:
            return re.search(self.schema_regex, schema) is not None
        return False

    def matches(self, schema: str, table: str | None) -> bool:
        if not self.matches_schema(schema):
            return False
        if not table or not self.tables:  # schema-level match / all tables
            return True
        return any(t.matches(table) for t in self.tables)


class TableSelector:
    """Do/ignore selection (matchTable + skipQueryDDL semantics,
    binlog_reader.go:1200-1274): a table replicates iff it matches the
    do-list (empty do-list = everything) and does not match the
    ignore-list; system schemas never replicate (F5)."""

    def __init__(
        self,
        do: list[SchemaPattern] | None = None,
        ignore: list[SchemaPattern] | None = None,
    ):
        self.do = do or []
        self.ignore = ignore or []

    def replicates(self, schema: str, table: str | None) -> bool:
        if schema.lower() in SYSTEM_SCHEMAS:
            return False
        if any(p.matches(schema, table) for p in self.ignore):
            return False
        if not self.do:
            return True
        return any(p.matches(schema, table) for p in self.do)


# ---------------------------------------------------------------------------
# Event translation
# ---------------------------------------------------------------------------

_OPS = {"insert": OP_INSERT, "update": OP_UPDATE, "delete": OP_DELETE}

# DDL statements affect a table we may need to resolve from the query
# text when the event's schema context differs (resolveQuery,
# binlog_reader.go:1039-1197 uses a full SQL parser; the wire row only
# needs schema/table attribution — dtle_spark.catalog.parse_ddl does
# the structural interpretation downstream).
_DDL_TABLE_RE = re.compile(
    r"^\s*(?:alter\s+table|create\s+table(?:\s+if\s+not\s+exists)?|"
    r"drop\s+table(?:\s+if\s+exists)?|truncate(?:\s+table)?|rename\s+table)\s+"
    r"(?:`?(?P<schema>[\w$]+)`?\.)?`?(?P<table>[\w$]+)`?",
    re.I,
)


def ddl_target(query: str, current_schema: str | None) -> tuple[str | None, str | None]:
    """Best-effort (schema, table) attribution for a DDL statement."""
    m = _DDL_TABLE_RE.match(query or "")
    if not m:
        return current_schema, None
    return m.group("schema") or current_schema, m.group("table")


_DROP_RE = re.compile(r"^\s*drop\s+table\s+(?P<ifex>if\s+exists\s+)?(?P<list>.+?);?\s*$", re.I | re.S)


def resolve_drop_table(sql: str, skip_fn, current_schema: str | None = None) -> str:
    """resolveQuery's multi-table DROP handling (binlog_reader.go:
    1125-1152; goldens binlog_reader_test.go:304): a DROP TABLE names
    several tables, each filtered independently — skipped tables are
    removed and the statement re-rendered in canonical backtick form
    (``drop table a.b, skip.c, d`` -> ``DROP TABLE `a`.`b`, `d```).
    When EVERY table is skipped the reference keeps the first table and
    attributes the statement to it, so the downstream table filter
    drops the whole statement ("No tables included. Add the first
    table and ignore the whole stmt") — reproduced here. ``skip_fn(
    schema, table) -> bool`` mirrors the skipQueryDDL callback; IF
    EXISTS survives the rewrite."""
    m = _DROP_RE.match(sql or "")
    if not m:
        return sql

    def render(schema: str | None, table: str) -> str:
        return f"`{schema}`.`{table}`" if schema else f"`{table}`"

    kept, parsed = [], []
    for item in m.group("list").split(","):
        item = item.strip()
        tm = re.match(r"`?(?P<a>[\w$]+)`?(?:\.`?(?P<b>[\w$]+)`?)?$", item)
        if not tm:
            return sql  # unparseable list item: leave untouched
        if tm.group("b"):
            schema, table = tm.group("a"), tm.group("b")
        else:
            schema, table = current_schema, tm.group("a")
        parsed.append((schema, table))
        if not skip_fn(schema or "", table):
            kept.append(render(schema, table))
    if not kept:  # all skipped: keep the first; attribution drops the stmt
        kept = [render(*parsed[0])]
    ifex = "IF EXISTS " if m.group("ifex") else ""
    return f"DROP TABLE {ifex}" + ", ".join(kept)


def _is_begin(q: str) -> bool:
    return q.strip().upper() == "BEGIN"


def _is_commit(q: str) -> bool:
    return q.strip().upper() == "COMMIT"


class BinlogEventTranslator:
    """Stateful event-stream -> wire-row translation.

    Emits each transaction's rows at its commit boundary (XID event or
    COMMIT query — the reference sends the entry at XID_EVENT,
    handleEvent :481-489) and DDL statements as their own single-row
    entries (DDL is auto-commit in MySQL). ``seq`` is the event's
    binlog log_pos when present (monotone per source, the ordering
    contract bridges must provide) with a translator-local counter as
    fallback; ``lc`` carries the GTID event's last_committed for MTS
    dependency tracking (A7).

    ``gtid_executed`` accumulates every emitted GNO as an interval set
    (sources/gtid.py) — the position the reference keeps in
    dtle.gtid_executed_v4. Transactions already contained in a set
    passed via ``resume_from`` are skipped entirely (the restart /
    redelivery guard, applier_incr.go:290-313).
    """

    def __init__(
        self,
        selector: TableSelector | None = None,
        resume_from: GtidSet | None = None,
    ):
        self.selector = selector or TableSelector()
        self.gtid_executed = resume_from or GtidSet()
        self._seq_fallback = 0
        self._cur: dict | None = None  # open tx: sid/gno/lc
        self._buf: list[dict] = []
        self._skip_tx = False
        self.log_file: str | None = None

    # -- helpers -----------------------------------------------------------
    def _seq(self, ev: dict) -> int:
        """STRICTLY monotone per emitted row. A multi-row ROWS event
        gives every row the same log_pos; if seq merely echoed it, the
        wire consumer's orderBy("seq") would scramble intra-event row
        order (caught by the transport contract harness: a 2-row insert
        drained as [2,b,1,a]). Ties advance by 1 past the last emitted
        seq — binlog positions are far enough apart that the nudge
        never collides with the next event's position."""
        pos = ev.get("log_pos")
        if pos is not None and int(pos) > self._seq_fallback:
            self._seq_fallback = int(pos)
        else:
            self._seq_fallback += 1
        return self._seq_fallback

    def _ts(self, ev: dict):
        t = ev.get("timestamp")
        if t is None:
            return None
        return _dt.datetime.fromtimestamp(int(t), _dt.timezone.utc)

    def _wire(self, ev: dict, op: str, schema: str, table: str | None,
              before=None, after=None, query: str | None = None) -> dict:
        cur = self._cur or {"sid": "00000000-0000-0000-0000-000000000000",
                            "gno": 0, "lc": 0}
        return {
            "sid": cur["sid"],
            "gno": cur["gno"],
            "seq": self._seq(ev),
            "lc": cur["lc"],
            "op": op,
            "ts": self._ts(ev),
            "schema_name": schema,
            "table_name": table,
            "before": None if before is None else json.dumps(before, default=str),
            "after": None if after is None else json.dumps(after, default=str),
            "query": query,
        }

    def _flush(self) -> list[dict]:
        out, self._buf = self._buf, []
        if self._cur is not None and not self._skip_tx:
            self.gtid_executed.add(self._cur["sid"], self._cur["gno"])
        self._cur = None
        self._skip_tx = False
        return out

    # -- the event loop body ----------------------------------------------
    def feed(self, ev: dict) -> list[dict]:
        """Consume one event; return wire rows ready to publish (empty
        until a commit boundary)."""
        kind = ev["type"]
        if kind == "gtid":
            # a GTID event opens a new tx; an unterminated previous tx
            # is dropped (the reference's entry is replaced the same way)
            self._buf = []
            self._cur = {
                "sid": ev["sid"],
                "gno": int(ev["gno"]),
                "lc": int(ev.get("last_committed", 0)),
            }
            self._skip_tx = self.gtid_executed.contains(ev["sid"], int(ev["gno"]))
            return []
        if kind == "rotate":
            self.log_file = ev.get("next_log")
            return []
        if kind == "xid":
            return self._flush()
        if kind == "query":
            q = ev.get("query", "")
            if _is_begin(q):
                return []
            if _is_commit(q):
                return self._flush()
            if self._skip_tx:
                return []
            if is_skip_query(q):  # F7: trigger/procedure/grant never replicate
                return []
            if _DROP_RE.match(q):  # multi-table DROP: per-table filtering
                q = resolve_drop_table(
                    q,
                    lambda s, t: not self.selector.replicates(s, t),
                    ev.get("schema"),
                )
            schema, table = ddl_target(q, ev.get("schema"))
            if schema is not None and not self.selector.replicates(schema, table):
                return []
            row = self._wire(ev, OP_DDL, schema, table, query=q)
            self._buf.append(row)
            return self._flush()  # DDL is auto-commit
        if kind == "rows":
            if self._skip_tx:
                return []
            op = _OPS[ev["op"]]
            schema, table = ev["schema"], ev["table"]
            if not self.selector.replicates(schema, table):
                return []
            for item in ev["rows"]:
                if op == OP_UPDATE:
                    before, after = item
                else:
                    before = item if op == OP_DELETE else None
                    after = item if op == OP_INSERT else None
                self._buf.append(
                    self._wire(ev, op, schema, table, before=before, after=after)
                )
            return []
        raise ValueError(f"unknown binlog event type {kind!r}")

    def feed_all(self, events: list[dict]) -> list[dict]:
        out: list[dict] = []
        for ev in events:
            out.extend(self.feed(ev))
        return out


# --- QUERY-event status-vars parsing (wire-level session flags) -------

# Q_FLAGS2 option bits (mysql-server sql/system_variables.h, public)
OPTION_NO_FOREIGN_KEY_CHECKS = 0x04000000

# MySQL collation id -> (charset, collation) for the ids seen in
# practice on replication streams (full table lives in the server's
# INFORMATION_SCHEMA.COLLATIONS; extend as streams need it)
COLLATIONS: dict[int, tuple[str, str]] = {
    8: ("latin1", "latin1_swedish_ci"),
    28: ("gbk", "gbk_chinese_ci"),
    33: ("utf8", "utf8_general_ci"),
    45: ("utf8mb4", "utf8mb4_general_ci"),
    46: ("utf8mb4", "utf8mb4_bin"),
    63: ("binary", "binary"),
    83: ("utf8", "utf8_bin"),
    224: ("utf8mb4", "utf8mb4_unicode_ci"),
    255: ("utf8mb4", "utf8mb4_0900_ai_ci"),
}


def parse_query_event_flags(bs: bytes) -> dict:
    """Parse a binlog QUERY event's status-vars block (the public
    format: mysql-server libbinlogevents statement_events.h; reference
    behavior: common/binlog.go:238-362 ParseQueryEventFlags, goldens
    from its binlog_test.go). Extracts what replication decisions hang
    on: ``no_foreign_key_checks`` (Q_FLAGS2 bit — the A14 passthrough
    flag), the three session charsets (Q_CHARSET — drives the F10
    transcode), and ``updated_db_names`` (Q_UPDATED_DB_NAMES — the
    multi-schema DDL routing hint the reference only logs; captured
    here because table selection can use it). Unknown codes raise with
    the hex context — a silent skip would desync every later field."""
    import struct as _s

    out: dict = {
        "no_foreign_key_checks": False,
        "character_set_client": None,
        "collation_connection": None,
        "collation_server": None,
        "updated_db_names": [],
    }

    def collation(cid: int) -> tuple[str, str]:
        if cid not in COLLATIONS:
            raise ValueError(f"unknown collation id {cid}")
        return COLLATIONS[cid]

    i = 0
    while i < len(bs):
        code = bs[i]
        i += 1
        if code == 0x00:  # Q_FLAGS2
            (v,) = _s.unpack_from("<I", bs, i)
            i += 4
            out["no_foreign_key_checks"] = bool(v & OPTION_NO_FOREIGN_KEY_CHECKS)
        elif code == 0x01:  # Q_SQL_MODE
            i += 8
        elif code == 0x02:  # Q_CATALOG (len, bytes, trailing nul)
            i += 1 + bs[i] + 1
        elif code == 0x03:  # Q_AUTO_INCREMENT (increment, offset)
            i += 4
        elif code == 0x04:  # Q_CHARSET (client, connection, server ids)
            c1, c2, c3 = _s.unpack_from("<HHH", bs, i)
            i += 6
            out["character_set_client"] = collation(c1)[0]
            out["collation_connection"] = collation(c2)[1]
            out["collation_server"] = collation(c3)[1]
        elif code == 0x05:  # Q_TIME_ZONE (len, bytes)
            i += 1 + bs[i]
        elif code == 0x06:  # Q_CATALOG_NZ (len, bytes)
            i += 1 + bs[i]
        elif code == 0x07:  # Q_LC_TIME_NAMES
            i += 2
        elif code == 0x08:  # Q_CHARSET_DATABASE
            i += 2
        elif code == 0x09:  # Q_TABLE_MAP_FOR_UPDATE
            i += 8
        elif code == 0x0A:  # Q_MASTER_DATA_WRITTEN
            i += 4
        elif code == 0x0B:  # Q_INVOKER (user len+bytes, host len+bytes)
            n = bs[i]
            i += 1 + n
            n = bs[i]
            i += 1 + n
        elif code == 0x0C:  # Q_UPDATED_DB_NAMES
            count = bs[i]
            i += 1
            if count != 254:  # OVER_MAX_DBS_IN_EVENT_MTS sentinel
                for _ in range(count):
                    end = bs.index(b"\x00", i)
                    out["updated_db_names"].append(bs[i:end].decode("utf-8"))
                    i = end + 1
        elif code == 0x0D:  # Q_MICROSECONDS
            i += 3
        elif code in (0x0E, 0x0F):  # Q_COMMIT_TS / Q_COMMIT_TS2 (unused)
            pass
        elif code == 0x10:  # Q_EXPLICIT_DEFAULTS_FOR_TIMESTAMP
            i += 1
        elif code == 0x11:  # Q_DDL_LOGGED_WITH_XID
            i += 8
        elif code == 0x12:  # Q_DEFAULT_COLLATION_FOR_UTF8MB4
            i += 2
        elif code == 0x13:  # Q_SQL_REQUIRE_PRIMARY_KEY
            i += 1
        elif code == 0x14:  # Q_DEFAULT_TABLE_ENCRYPTION
            i += 1
        else:
            raise ValueError(
                f"unknown status-var code 0x{code:02x} at {i - 1} in {bs.hex()}"
            )
    return out


def compare_file_pos(file_a: str, pos_a: int, file_b: str, pos_b: int) -> int:
    """Total order on binlog file coordinates (reference:
    MySQLCoordinates.CompareFilePos, base/binlog_test.go goldens):
    file name orders first (lexicographic — MySQL's zero-padded
    suffixes make that numeric), position breaks ties. Used when a
    stream resumes from file:pos instead of a GTID set (pre-GTID
    servers); returns -1/0/1."""
    a = (file_a, pos_a)
    b = (file_b, pos_b)
    if a == b:
        return 0
    return -1 if a < b else 1
