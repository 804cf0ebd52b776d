"""Column projection / reorder / rename (reference F8-F11).

ColumnMap in the reference is a positional int map applied to snapshot
rows (/root/reference/driver/mysql/dumper.go:227-236) and stream rows
(binlog_reader.go:1985-1998), built from ``ColumnMapFrom``
(mysqlconfig/types.go:204-214). Schema/table renames rewrite event
metadata (binlog_reader.go:1901-1909). In Spark both are one
``select`` with aliases — Catalyst turns the projection into parquet
column pruning on the snapshot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dtle_spark.model import TableConfig


def column_map(df: DataFrame, src_cols: list[str], dst_cols: list[str] | None = None) -> DataFrame:
    """F8: project + reorder + optionally rename. ``src_cols`` selects and
    orders source columns; ``dst_cols`` (same length) renames them."""
    dst_cols = dst_cols or src_cols
    if len(src_cols) != len(dst_cols):
        raise ValueError("column_map_from/to length mismatch")
    return df.select([F.col(s).alias(d) for s, d in zip(src_cols, dst_cols)])


def _map_image(image: Column, src_cols: list[str], dst_cols: list[str]) -> Column:
    mapped = F.struct(*[image.getField(s).alias(d) for s, d in zip(src_cols, dst_cols)])
    return F.when(image.isNotNull(), mapped).otherwise(F.lit(None))


def map_changes(changes: DataFrame, cfg: TableConfig) -> DataFrame:
    """Apply rename (F9) + column map (F8) to a change stream: rewrites
    ``schema_name``/``table_name`` to target identifiers and projects the
    ``before``/``after`` structs through the column map."""
    out = changes.withColumn("schema_name", F.lit(cfg.target_schema)).withColumn(
        "table_name", F.lit(cfg.target_table)
    )
    if cfg.column_map_from:
        dst = cfg.column_map_to or cfg.column_map_from
        out = out.withColumn(
            "before", _map_image(F.col("before"), cfg.column_map_from, dst)
        ).withColumn("after", _map_image(F.col("after"), cfg.column_map_from, dst))
    return out


def to_utc(df: DataFrame, ts_cols: list[str], source_tz: str) -> DataFrame:
    """F11 timezone conversion: the reference wraps applied values in
    ``convert_tz(?, tz, '+00:00')`` (sql/builder.go:189-194); Spark
    equivalent is ``to_utc_timestamp`` per column."""
    for c in ts_cols:
        df = df.withColumn(c, F.to_utc_timestamp(F.col(c), source_tz))
    return df


def charset_to_utf8(df: DataFrame, col_charsets: dict[str, str]) -> DataFrame:
    """F10 charset conversion: per-column decode of legacy-charset bytes
    to UTF-8 strings (reference mysqlconfig/types.go:87-113 converts at
    row-decode time; here the binary column decodes via JVM charsets).
    Spark 4 whitelists a few charsets by default; MySQL sources need the
    full Java set (gbk/latin1/...). The whitelist conf is captured when
    each encode/decode EXPRESSION is constructed (not at execution), so
    it is set here BEFORE the decode columns are built — callers that
    construct their own legacy-charset expressions must set it first
    too (gated by the charset_decode_utf8 registry query)."""
    df.sparkSession.conf.set("spark.sql.legacy.javaCharsets", "true")
    for c, cs in col_charsets.items():
        df = df.withColumn(c, F.decode(F.col(c), cs))
    return df
