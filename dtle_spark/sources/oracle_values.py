"""Oracle LogMiner redo-SQL value conversion (reference S9, adapter tier).

The reference parses LogMiner's reconstructed SQL and converts Oracle
literal expressions to plain values
(/root/reference/driver/oracle/extractor/sql_parse.go:151-193; test
corpus sql_parse_test.go:7). This module re-implements that value
grammar as pure Python — it runs in the source adapter (driver side,
per-statement), never in a Spark hot path.

Handled forms: TO_DATE/TO_TIMESTAMP with format model, HEXTORAW,
UNISTR, EMPTY_BLOB()/EMPTY_CLOB(), NULL, quoted strings with doubled
quotes.
"""

from __future__ import annotations

import re
from datetime import datetime

_TO_DATE = re.compile(r"^TO_DATE\('([^']*)'\s*,\s*'([^']*)'\)$", re.I)
_TO_TS = re.compile(r"^TO_TIMESTAMP\('([^']*)'(?:\s*,\s*'([^']*)')?\)$", re.I)
_HEXTORAW = re.compile(r"^HEXTORAW\('([0-9a-fA-F]*)'\)$", re.I)
# quotes optional: LogMiner sometimes reconstructs UNISTR(...) bare
# (reference sql_parse_test.go coverage values)
_UNISTR = re.compile(r"^UNISTR\('?(.*?)'?\)$", re.I | re.S)
_QUOTED = re.compile(r"^'(.*)'$", re.S)
_INTERVAL = re.compile(r"^TO_(?:DS|YM)INTERVAL\('?(.*?)'?\)$", re.I | re.S)

# Oracle datetime format model -> strptime (the subset the reference's
# corpus exercises)
_ORA_FMT = [
    ("YYYY", "%Y"),
    ("MM", "%m"),
    ("DD", "%d"),
    ("HH24", "%H"),
    ("MI", "%M"),
    ("SS", "%S"),
    ("FF6", "%f"),
    ("FF", "%f"),
]


def _fmt(oracle_fmt: str) -> str:
    out = oracle_fmt
    for o, p in _ORA_FMT:
        out = out.replace(o, p)
    return out


def _unistr_decode(body: str) -> str:
    """UNISTR escapes: \\XXXX is a UTF-16 code unit; everything else
    passes through (reference UnitstrDecode semantics)."""
    body = body.replace("''", "'")
    return re.sub(
        r"\\([0-9a-fA-F]{4})", lambda g: chr(int(g.group(1), 16)), body
    )


def parse_oracle_value(text: str):
    """Convert one Oracle literal expression to a Python value."""
    # LogMiner doubles backslashes in reconstructed SQL; collapse first
    # (reference columnsValueConverter:152)
    s = text.strip().replace("\\\\", "\\")
    if s.upper() == "NULL":
        return None
    # Oracle float specials have no MySQL representation (reference
    # maps them to nil)
    if s in ("Inf", "-Inf", "Nan"):
        return None
    # concatenated UNISTR('..') || UNISTR('..') chains, any spacing
    # (reference UnitstrConvert splits on || before decoding parts)
    if "||" in s and re.match(r"^\s*UNISTR\(", s, re.I):
        out = []
        for part in s.split("||"):
            m = _UNISTR.match(part.strip())
            if not m:
                raise ValueError(f"non-UNISTR part in concatenation: {part!r}")
            out.append(_unistr_decode(m.group(1)))
        return "".join(out)
    m = _INTERVAL.match(s)
    if m:
        return m.group(1)
    if s.upper() in ("EMPTY_BLOB()", "EMPTY_CLOB()"):
        return b"" if "BLOB" in s.upper() else ""
    m = _TO_DATE.match(s)
    if m:
        return datetime.strptime(m.group(1), _fmt(m.group(2)))
    m = _TO_TS.match(s)
    if m:
        val, fmt = m.group(1), m.group(2) or "YYYY-MM-DD HH24:MI:SS.FF"
        # normalize fractional part to 6 digits for %f
        return datetime.strptime(val, _fmt(fmt))
    m = _HEXTORAW.match(s)
    if m:
        return bytes.fromhex(m.group(1))
    m = _UNISTR.match(s)
    if m:
        return _unistr_decode(m.group(1))
    m = _QUOTED.match(s)
    if m:
        return m.group(1).replace("''", "'")
    # numeric literal
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        raise ValueError(f"unparseable Oracle value literal: {text!r}")
