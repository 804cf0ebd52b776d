"""Oracle LogMiner -> MySQL-dialect translation (reference S8/S10).

The reference's Oracle extractor polls V$LOGMNR_CONTENTS and converts
each record offline before it ever reaches the applier:

- DDL redo SQL -> MySQL DDL text via type mapping
  (/root/reference/driver/oracle/extractor/log_miner.go:1070-1280
  parseDDLSQL; type table sql_parse.go:249-420 oracleTp2MySQLTp;
  goldens log_miner_test.go:300-520).
- DML redo/undo SQL -> row value arrays
  (log_miner.go parseDMLSQL; goldens log_miner_test.go:141-280).
- do/ignore table config -> the V$LOGMNR_CONTENTS WHERE filter
  (log_miner.go:194-232 buildFilterSchemaTable; goldens :108-130).

All three are pure text transforms — this module implements them in
Python with the reference's own test vectors as goldens
(tests/test_oracle_source.py), so only the DB connection
(OracleLogMinerBridge.tail, cdc_bridge.py) stays import-gated.

Identifier case: Oracle folds unquoted identifiers to UPPER; quoted
("persons") keep their case — both preserved through translation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Identifier + lexing helpers
# ---------------------------------------------------------------------------


def norm_ident(raw: str) -> str:
    """Oracle identifier semantics: quoted keeps case, bare folds UPPER."""
    raw = raw.strip()
    if raw.startswith('"') and raw.endswith('"'):
        return raw[1:-1]
    return raw.upper()


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside parens and single-quoted strings
    (backslash is a LITERAL character in Oracle strings; only '' is an
    escaped quote)."""
    parts, cur, depth, in_q = [], [], 0, False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if in_q:
            if ch == "'":
                if i + 1 < n and text[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                in_q = False
        elif ch == "'":
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


_QUAL = re.compile(r'^\s*(?:("?[^".\s]+"?)\s*\.\s*)?("[^"]+"|[\w$#\\]+)')


def parse_qualified(text: str, seg_owner: str = "") -> tuple[str, str]:
    """schema.table (either part optionally quoted) -> normalized pair;
    missing schema falls back to seg_owner (parseDDLSQL getSchemaName)."""
    m = _QUAL.match(text)
    if not m:
        raise ValueError(f"unparseable object name: {text!r}")
    schema = norm_ident(m.group(1)) if m.group(1) else norm_ident(seg_owner)
    return schema, norm_ident(m.group(2))


# ---------------------------------------------------------------------------
# Oracle type -> MySQL type (oracleTp2MySQLTp, sql_parse.go:249-420;
# every branch below has a golden in log_miner_test.go)
# ---------------------------------------------------------------------------

_LIMIT_SCALE = 30  # LimitSize: MySQL DECIMAL scale cap


def _number_type(prec: str | None, scale: str | None) -> str:
    if prec is None or prec == "*":
        return "DOUBLE"
    p = int(prec)
    s = int(scale) if scale is not None else 0
    if s != 0:
        return f"DECIMAL({p},{min(s, _LIMIT_SCALE)})"
    if p <= 0:
        return "DOUBLE"
    if p < 3:
        return "TINYINT"
    if p < 5:
        return "SMALLINT"
    if p < 9:
        return "INT"
    if p < 19:
        return "BIGINT"
    return f"DECIMAL({p})"


def oracle_type_to_mysql(type_text: str) -> str:
    """One Oracle column type declaration -> MySQL type text."""
    t = type_text.strip()
    up = t.upper()
    m = re.match(r"^([A-Z_][A-Z_0-9]*(?:\s+(?:PRECISION|RAW|VARYING))?)\s*(?:\(\s*([^)]*?)\s*\))?(.*)$", up)
    if not m:
        raise ValueError(f"unparseable Oracle type: {type_text!r}")
    base, args, rest = m.group(1), m.group(2), m.group(3).strip()
    arg_list = [a.strip() for a in (args.split(",") if args else [])]

    def size() -> int:
        return int(arg_list[0])

    if base in ("NUMBER",):
        return _number_type(arg_list[0] if arg_list else None,
                            arg_list[1] if len(arg_list) > 1 else None)
    if base in ("DECIMAL", "DEC", "NUMERIC"):
        p = int(arg_list[0]) if arg_list else 38
        s = int(arg_list[1]) if len(arg_list) > 1 else 0
        return f"DECIMAL({p},{min(s, _LIMIT_SCALE)})" if s else f"DECIMAL({p})"
    if base in ("VARCHAR", "VARCHAR2", "NVARCHAR2", "NCHAR VARYING"):
        return f"VARCHAR({size()})"
    if base in ("CHAR", "CHARACTER", "NCHAR"):
        n = size() if arg_list else 1
        return f"CHAR({n})" if 1 <= n <= 255 else f"VARCHAR({n})"
    if base == "RAW":
        return f"VARBINARY({size()})"
    if base == "LONG RAW":
        return "LONGBLOB"
    if base == "LONG":
        return "LONGTEXT"
    if base == "BLOB":
        return "LONGBLOB"
    if base == "CLOB":
        return "LONGTEXT"
    if base == "NCLOB":
        return "TEXT"
    if base == "DATE":
        return "DATETIME"
    if base == "TIMESTAMP":
        frac = min(size() if arg_list else 6, 6)
        # WITH [LOCAL] TIME ZONE collapses to DATETIME too (golden)
        return f"DATETIME({frac})" if frac else "DATETIME"
    if base == "INTERVAL":
        return "VARCHAR(30)"
    if base in ("BINARY_FLOAT",):
        return "FLOAT"
    if base in ("BINARY_DOUBLE", "FLOAT", "REAL", "DOUBLE", "DOUBLE PRECISION"):
        return "DOUBLE"
    if base in ("INT", "INTEGER"):
        return "INT"
    if base == "SMALLINT":
        return "DECIMAL(38)"
    if base == "ROWID":
        return "CHAR(100)"
    if base == "UROWID":
        return f"VARCHAR({size() if arg_list else 4000})"
    if base == "BFILE":
        return "VARCHAR(255)"
    if base == "XMLTYPE":
        return "LONGTEXT"
    if rest.startswith("YEAR") or rest.startswith("DAY"):  # INTERVAL forms
        return "VARCHAR(30)"
    raise ValueError(f"unmapped Oracle type: {type_text!r}")


# INTERVAL YEAR(n) TO MONTH / INTERVAL DAY(n) TO SECOND(m): the args
# regex above only eats the first parens; normalize those specially.
_INTERVAL = re.compile(r"^\s*INTERVAL\s+(YEAR|DAY)\b.*$", re.I)
_TS_TZ = re.compile(r"^\s*TIMESTAMP\s*(?:\(\s*(\d+)\s*\))?\s*WITH(?:\s+LOCAL)?\s+TIME\s+ZONE\s*$", re.I)


def _map_type(type_text: str) -> str:
    if _INTERVAL.match(type_text):
        return "VARCHAR(30)"
    m = _TS_TZ.match(type_text)
    if m:
        frac = min(int(m.group(1)) if m.group(1) else 6, 6)
        return f"DATETIME({frac})" if frac else "DATETIME"
    return oracle_type_to_mysql(type_text)


# ---------------------------------------------------------------------------
# DDL translation (parseDDLSQL)
# ---------------------------------------------------------------------------


@dataclass
class OracleDdlEvent:
    query: str
    schema_name: str
    table_name: str
    create_schema_if_not_exists: bool = False
    columns: list[str] = field(default_factory=list)  # ordinal-ordered names


_CREATE = re.compile(r"^\s*CREATE\s+TABLE\s+(?P<name>[^(]+?)\s*\((?P<body>.*)\)\s*;?\s*$", re.I | re.S)
_DROP = re.compile(r"^\s*DROP\s+TABLE\s+(?P<name>.+?)\s*;?\s*$", re.I)
_ALTER = re.compile(r"^\s*ALTER\s+TABLE\s+(?P<name>\S+(?:\s*\.\s*\S+)?)\s+(?P<rest>.*?);?\s*$", re.I | re.S)
_COL = re.compile(r'^\s*("[^"]+"|[\w$#\\]+)\s+(.+?)\s*$', re.S)


def _render_col(name: str, type_text: str) -> str:
    return f"`{name}` {_map_type(type_text)}"


def _strip_col_options(defn: str) -> str:
    """Drop trailing column options the type mapper doesn't consume
    (NOT NULL / DEFAULT ... / inline constraints)."""
    out = re.sub(r"\s+(NOT\s+NULL|NULL|PRIMARY\s+KEY|UNIQUE)\b.*$", "", defn, flags=re.I)
    out = re.sub(r"\s+DEFAULT\s+.*$", "", out, flags=re.I)
    return out.strip()


def translate_oracle_ddl(redo_sql: str, seg_owner: str = "") -> OracleDdlEvent:
    """One Oracle DDL redo statement -> MySQL DDL text + attribution
    (parseDDLSQL). Raises ValueError outside the translated subset."""
    m = _CREATE.match(redo_sql)
    if m:
        schema, table = parse_qualified(m.group("name"), seg_owner)
        cols, constraints, names = [], [], []
        for item in _split_top_level(m.group("body")):
            cm = re.match(r"^\s*(?:CONSTRAINT\s+(\S+)\s+)?(PRIMARY\s+KEY|UNIQUE)\s*\(([^)]*)\)\s*$",
                          item, re.I)
            if cm:
                keys = ",".join(f"`{norm_ident(k)}`" for k in cm.group(3).split(","))
                if cm.group(2).upper().startswith("PRIMARY"):
                    constraints.append(f"PRIMARY KEY({keys})")
                else:
                    cname = f" `{norm_ident(cm.group(1))}`" if cm.group(1) else ""
                    constraints.append(f"UNIQUE KEY{cname}({keys})")
                continue
            colm = _COL.match(item)
            if not colm:
                raise ValueError(f"unparseable column def: {item!r}")
            name = norm_ident(colm.group(1))
            names.append(name)
            cols.append(_render_col(name, _strip_col_options(colm.group(2))))
        body = ",".join(cols + constraints)
        return OracleDdlEvent(
            query=f"CREATE TABLE `{schema}`.`{table}` ({body}) DEFAULT CHARACTER SET = UTF8MB4",
            schema_name=schema,
            table_name=table,
            create_schema_if_not_exists=True,
            columns=names,
        )

    m = _ALTER.match(redo_sql)
    if m:
        schema, table = parse_qualified(m.group("name"), seg_owner)
        rest = m.group("rest").strip()
        specs: list[str] = []
        qual = f"`{schema}`.`{table}`"
        # Oracle ALTER clauses: ADD (...), MODIFY (...) [MODIFY (...)]*,
        # DROP (...)/DROP COLUMN x, RENAME COLUMN a TO b
        pos = 0
        while pos < len(rest):
            chunk = rest[pos:]
            grp = _paren_group(chunk, "ADD")
            if grp is not None:
                body, consumed = grp
                cols = []
                for item in _split_top_level(body):
                    colm = _COL.match(item)
                    cols.append(_render_col(norm_ident(colm.group(1)),
                                            _strip_col_options(colm.group(2))))
                specs.append(f"ADD COLUMN ({', '.join(cols)})")
                pos += consumed
                continue
            am = re.match(r"^\s*ADD\s+(?P<def>[^,(]+?)\s*(?:,|$)", chunk, re.I)
            if am:
                colm = _COL.match(am.group("def"))
                specs.append("ADD COLUMN (" + _render_col(
                    norm_ident(colm.group(1)), _strip_col_options(colm.group(2))) + ")")
                pos += am.end()
                continue
            grp = _paren_group(chunk, "MODIFY")
            if grp is not None:
                body, consumed = grp
                for item in _split_top_level(body):
                    colm = _COL.match(item)
                    specs.append(f"MODIFY COLUMN `{norm_ident(colm.group(1))}` "
                                 f"{_map_type(_strip_col_options(colm.group(2)))}")
                pos += consumed
                continue
            dm = re.match(r"^\s*DROP\s*\((?P<body>[^)]*)\)\s*", chunk, re.I)
            if dm:
                for c in dm.group("body").split(","):
                    specs.append(f"DROP COLUMN {qual}.`{norm_ident(c)}`")
                pos += dm.end()
                continue
            dm = re.match(r"^\s*DROP\s+COLUMN\s+(\S+)\s*", chunk, re.I)
            if dm:
                specs.append(f"DROP COLUMN {qual}.`{norm_ident(dm.group(1))}`")
                pos += dm.end()
                continue
            rm = re.match(r"^\s*RENAME\s+COLUMN\s+(\S+)\s+TO\s+(\S+)\s*", chunk, re.I)
            if rm:
                specs.append(f"RENAME COLUMN {qual}.`{norm_ident(rm.group(1))}` "
                             f"TO {qual}.`{norm_ident(rm.group(2))}`")
                pos += rm.end()
                continue
            raise ValueError(f"untranslated ALTER clause: {chunk!r}")
        return OracleDdlEvent(
            query=f"ALTER TABLE {qual} " + ", ".join(specs),
            schema_name=schema,
            table_name=table,
        )

    m = _DROP.match(redo_sql)
    if m:
        schema, table = parse_qualified(m.group("name"), seg_owner)
        return OracleDdlEvent(
            query=f"DROP TABLE `{schema}`.`{table}`",
            schema_name=schema,
            table_name=table,
        )
    raise ValueError(f"untranslated Oracle DDL: {redo_sql!r}")


def _paren_group(chunk: str, keyword: str) -> tuple[str, int] | None:
    """Match `KEYWORD ( <balanced body> )` at the start of chunk;
    returns (body, chars_consumed) or None."""
    m = re.match(rf"^\s*{keyword}\s*\(", chunk, re.I)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(chunk) and depth:
        if chunk[i] == "(":
            depth += 1
        elif chunk[i] == ")":
            depth -= 1
        i += 1
    if depth:
        return None
    body = chunk[m.end():i - 1]
    while i < len(chunk) and chunk[i].isspace():
        i += 1
    return body, i


# ---------------------------------------------------------------------------
# LogMiner V$LOGMNR_CONTENTS filter (buildFilterSchemaTable,
# log_miner.go:194-232 — string-exact, goldens log_miner_test.go:108-130)
# ---------------------------------------------------------------------------


def build_filter_schema_table(
    do: list[tuple[str, list[str]]],
    ignore: list[tuple[str, list[str]]],
) -> str:
    """(schema, tables) lists -> the LogMiner WHERE fragment, exactly
    as the reference renders it (including its quirky leading ' AND(')."""
    out = ""
    for schema, tables in do:
        if not tables:
            out += f" OR ( seg_owner = '{schema}')"
        else:
            tl = ",".join(f"'{t}'" for t in tables)
            out += f" OR ( seg_owner = '{schema}' AND table_name in ({tl}))"
    if out:
        out = out.replace("OR", "AND(", 1) + ")"
    for schema, tables in ignore:
        if not tables:
            out += f" AND ( seg_owner <> '{schema}')"
        else:
            tl = ",".join(f"'{t}'" for t in tables)
            out += f" AND ( seg_owner = '{schema}' AND table_name not in ({tl}))"
    return out


# ---------------------------------------------------------------------------
# DML redo SQL -> row arrays (parseDMLSQL; goldens log_miner_test.go:141-280)
# ---------------------------------------------------------------------------

_INSERT = re.compile(
    r'^\s*INSERT\s+INTO\s+(?P<name>[^(]+?)\s*\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)\s*;?\s*$',
    re.I | re.S)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<name>.+?)\s+SET\s+(?P<set>.*?)\s+WHERE\s+(?P<where>.*?)\s*;?\s*$",
    re.I | re.S)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>.+?)\s+WHERE\s+(?P<where>.*?)\s*;?\s*$",
    re.I | re.S)

# literals the reference nulls out in DML rows: unquoted NULL, the
# string 'NULL', and non-finite float spellings
_NULLISH = {"NULL", "'NULL'", "'INF'", "'-INF'", "'NAN'"}


def _dml_value(text: str):
    """One redo-SQL value -> Python value, with the reference's DML
    conventions: TO_DATE keeps its first argument VERBATIM (the applier
    re-parses downstream), UNISTR decodes UTF-16 escapes, quoted
    strings unescape '' only (backslash is literal), and
    NULL/'NULL'/Inf/Nan map to None."""
    s = text.strip()
    if s.upper() in _NULLISH:
        return None
    m = re.match(r"^TO_DATE\s*\(\s*'((?:[^']|'')*)'", s, re.I)
    if m:
        return m.group(1).replace("''", "'")
    m = re.match(r"^TO_TIMESTAMP\s*\(\s*'((?:[^']|'')*)'", s, re.I)
    if m:
        return m.group(1).replace("''", "'")
    m = re.match(r"^UNISTR\s*\(\s*'((?:[^']|'')*)'\s*\)$", s, re.I | re.S)
    if m:
        body = m.group(1).replace("''", "'")
        return re.sub(r"\\([0-9a-fA-F]{4})", lambda g: chr(int(g.group(1), 16)), body)
    if s.startswith("'") and s.endswith("'") and len(s) >= 2:
        return s[1:-1].replace("''", "'")
    return s


def _parse_where(where: str) -> dict[str, object]:
    """Top-level AND conjunction of `"COL" = value` / `"COL" IS NULL`."""
    out: dict[str, object] = {}
    for cond in _split_and(where):
        m = re.match(r'^\s*("[^"]+"|[\w$#\\]+)\s+IS\s+NULL\s*$', cond, re.I)
        if m:
            out[norm_ident(m.group(1))] = None
            continue
        m = re.match(r'^\s*("[^"]+"|[\w$#\\]+)\s*=\s*(.+?)\s*$', cond, re.S)
        if m:
            out[norm_ident(m.group(1))] = _dml_value(m.group(2))
            continue
        raise ValueError(f"unparseable WHERE condition: {cond!r}")
    return out


def _split_and(text: str) -> list[str]:
    """Split on top-level AND keywords (outside quotes/parens)."""
    parts, cur, depth, in_q = [], [], 0, False
    tokens = re.split(r"(\s+[Aa][Nn][Dd]\s+)", text)
    # re-join tokens that fall inside quotes/parens
    for tok in tokens:
        probe = "".join(cur)
        quotes = probe.count("'") - 2 * probe.count("''")
        if re.fullmatch(r"\s+[Aa][Nn][Dd]\s+", tok) and quotes % 2 == 0 and probe.count("(") == probe.count(")"):
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(tok)
    parts.append("".join(cur))
    return [p for p in parts if p.strip()]


# ---------------------------------------------------------------------------
# LogMiner record stream -> wire rows (the tx cache the reference keeps
# in log_miner.go:745-780: START opens, COMMIT flushes, ROLLBACK drops,
# DDL bypasses the cache as its own entry)
# ---------------------------------------------------------------------------

OP_CODE_INSERT = 1
OP_CODE_DELETE = 2
OP_CODE_UPDATE = 3
OP_CODE_DDL = 5
OP_CODE_START = 6
OP_CODE_COMMIT = 7
OP_CODE_MISS_SCN = 34
OP_CODE_ROLLBACK = 36


class LogMinerRecordTranslator:
    """V$LOGMNR_CONTENTS records -> wire-form change rows.

    Record dicts carry the columns the reference's poll query selects
    (log_miner.go:238-255): scn, seg_owner, table_name, sql_redo,
    sql_undo, operation_code, xid, timestamp. DML buffers per xid and
    emits at COMMIT (rollback discards — the reference's txCache);
    DDL translates to MySQL dialect and emits immediately. Oracle has
    no GTID: ``sid`` is the configured source id, ``gno`` the commit
    SCN, ``seq`` each record's SCN (monotone per source — the ordering
    contract the engine's merge needs).

    ``columns`` maps (schema, table) -> ordinal column list (the
    reference's OriginalTableColumns.Ordinals); rows parse through
    :func:`parse_dml_sql`, so partial images (LogMiner WHERE/SET carry
    only touched columns) surface as None exactly like the reference.
    """

    _OPS = {OP_CODE_INSERT: "i", OP_CODE_UPDATE: "u", OP_CODE_DELETE: "d"}

    def __init__(self, source_id: str, columns: dict[tuple[str, str], list[str]]):
        self.source_id = source_id
        self.columns = columns
        self._tx: dict[str, list[dict]] = {}

    def _wire(self, rec: dict, op: str, gno: int, before, after, query=None) -> dict:
        import json as _json

        return {
            "sid": self.source_id,
            "gno": int(gno),
            "seq": int(rec["scn"]),
            "lc": 0,
            "op": op,
            "ts": rec.get("timestamp"),
            "schema_name": rec.get("seg_owner"),
            "table_name": rec.get("table_name"),
            "before": None if before is None else _json.dumps(before, default=str),
            "after": None if after is None else _json.dumps(after, default=str),
            "query": query,
        }

    def feed(self, rec: dict) -> list[dict]:
        code = int(rec["operation_code"])
        xid = rec.get("xid", "")
        if code == OP_CODE_START:
            self._tx.setdefault(xid, [])
            return []
        if code == OP_CODE_ROLLBACK:
            self._tx.pop(xid, None)
            return []
        if code == OP_CODE_COMMIT:
            buffered = self._tx.pop(xid, [])
            commit_scn = int(rec["scn"])
            for w in buffered:
                w["gno"] = commit_scn
            return buffered
        if code == OP_CODE_DDL:
            ev = translate_oracle_ddl(rec["sql_redo"], rec.get("seg_owner", ""))
            out = self._wire(rec, "ddl", rec["scn"], None, None, query=ev.query)
            out["schema_name"], out["table_name"] = ev.schema_name, ev.table_name
            if ev.columns:
                self.columns[(ev.schema_name, ev.table_name)] = ev.columns
            return [out]
        if code in self._OPS:
            schema, table = rec.get("seg_owner", ""), rec.get("table_name", "")
            cols = self.columns.get((norm_ident(schema), norm_ident(table))) or \
                self.columns.get((schema, table))
            if cols is None:
                raise ValueError(f"no column map for {schema}.{table}")
            ev = parse_dml_sql(rec["sql_redo"], rec.get("sql_undo", ""), cols, schema)
            named = lambda row: dict(zip(cols, row))  # noqa: E731
            if ev.op == "i":
                w = self._wire(rec, "i", rec["scn"], None, named(ev.rows[0]))
            elif ev.op == "d":
                w = self._wire(rec, "d", rec["scn"], named(ev.rows[0]), None)
            else:
                w = self._wire(rec, "u", rec["scn"], named(ev.rows[0]), named(ev.rows[1]))
            self._tx.setdefault(xid, []).append(w)
            return []
        return []  # START/MISS_SCN bookkeeping codes

    def feed_all(self, records: list[dict]) -> list[dict]:
        out: list[dict] = []
        for r in records:
            out.extend(self.feed(r))
        return out


@dataclass
class OracleDmlEvent:
    op: str  # 'i' | 'u' | 'd'
    schema_name: str
    table_name: str
    rows: list[list[object]]  # ordinal-ordered; update: [before, after]


_ASSIGN = re.compile(r'^\s*("[^"]+"|[\w$#\\]+)\s*=\s*(.+?)\s*$', re.S)


def _parse_set(set_text: str) -> dict[str, object]:
    """SET clause -> {col: value}. LogMiner joins multiple assignments
    with `` and `` (log_miner.go:963 comment shows ``set "COL2" ='500'
    and "COL1" = 'ss'``) while plain SQL uses commas — accept both."""
    parts = _split_top_level(set_text)
    if len(parts) == 1:
        ands = _split_and(parts[0])
        if len(ands) > 1 and all(_ASSIGN.match(a) for a in ands):
            parts = ands
    out: dict[str, object] = {}
    for assign in parts:
        am = _ASSIGN.match(assign)
        if not am:
            raise ValueError(f"unparseable SET clause: {assign!r}")
        out[norm_ident(am.group(1))] = _dml_value(am.group(2))
    return out


def parse_dml_sql(redo_sql: str, undo_sql: str, columns: list[str],
                  seg_owner: str = "") -> OracleDmlEvent:
    """One LogMiner DML redo statement -> ordinal row arrays, matching
    parseDMLSQL's goldens (log_miner_test.go:141-280): insert ->
    [values], delete -> [redo where], update -> [before, after] where
    **before = redo WHERE and after = undo WHERE** — the undo statement
    reverses the change, so its WHERE carries the full logged after
    image (log_miner.go:1039-1063 parses oracleUndoSQL and takes
    undoVisitor.Before as the second row). Without an undo statement
    the after image falls back to the redo SET values merged over the
    before image (the SET alone loses every untouched column, including
    the unique key — the silent-corruption case ADVICE r02 flagged)."""
    ords = {c: i for i, c in enumerate(columns)}

    def to_row(vals: dict[str, object]) -> list[object]:
        row: list[object] = [None] * len(columns)
        for k, v in vals.items():
            if k in ords:
                row[ords[k]] = v
        return row

    m = _INSERT.match(redo_sql)
    if m:
        schema, table = parse_qualified(m.group("name"), seg_owner)
        cols = [norm_ident(c) for c in _split_top_level(m.group("cols"))]
        vals = [_dml_value(v) for v in _split_top_level(m.group("vals"))]
        if len(cols) != len(vals):
            raise ValueError("INSERT column/value count mismatch")
        return OracleDmlEvent("i", schema, table, [to_row(dict(zip(cols, vals)))])

    m = _UPDATE.match(redo_sql)
    if m:
        schema, table = parse_qualified(m.group("name"), seg_owner)
        before_vals = _parse_where(m.group("where"))
        um = _UPDATE.match(undo_sql) if undo_sql else None
        if um is not None:
            # undo reverses the change: its WHERE is the full after image
            after_vals = _parse_where(um.group("where"))
        else:
            # no undo logged: SET carries only the touched columns, so
            # merge it over the before image to keep untouched columns
            after_vals = {**before_vals, **_parse_set(m.group("set"))}
        return OracleDmlEvent(
            "u", schema, table, [to_row(before_vals), to_row(after_vals)]
        )

    m = _DELETE.match(redo_sql)
    if m:
        schema, table = parse_qualified(m.group("name"), seg_owner)
        return OracleDmlEvent("d", schema, table, [to_row(_parse_where(m.group("where")))])

    raise ValueError(f"untranslated Oracle DML: {redo_sql!r}")
