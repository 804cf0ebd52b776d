"""Preflight inspection: fail a job at create time, not mid-stream.

The reference validates everything about a table before the job runs
(Inspector.ValidateOriginalTable, driver/mysql/inspect.go:89-180:
table exists, unique-key choice rejects FLOAT/JSON/nullable key
columns, ColumnMapFrom resolves via BuildColumnMapIndex, the Where
expression parses) plus connection-level preflights (grants, GTID
mode, binlog format — inspect.go:57-88, which have no analogue on a
lake source). This module is that layer for the Spark engine: a pure
config+catalog sanity check invoked by ``JobManager.create``.

Checks, per table:

1. schema.table registered in the catalog (validateTable).
2. ``column_map_from`` names resolve in the table schema, and
   ``column_map_to`` (when given) matches its length
   (BuildColumnMapIndex, mysqlconfig/types.go:204-214).
3. ``unique_key`` columns exist post-column-map; FLOAT/DOUBLE-typed
   key columns are rejected (inspect.go:118-124 — float equality is
   not a key), MAP-typed rejected (the JSON-index case :125-130).
4. ``where`` parses as a Catalyst boolean expression over the SOURCE
   columns (NewWhereCtx parse check, inspect.go:171-176).
5. duplicate TARGET tables across the job's table list are rejected
   (two sources merging into one target silently interleave).
6. when ``check_reversible`` — the bidirectional-job case — the column
   map must be invertible (api/handler/v2/job.go:1999-2004).

Returns every problem at once (operators fix configs in one pass, not
one error per submit)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.model import JobConfig, TableConfig


class PreflightError(ValueError):
    def __init__(self, problems: list[str]):
        self.problems = problems
        super().__init__(
            "job preflight failed:\n" + "\n".join(f"  - {p}" for p in problems)
        )


_BAD_KEY_TYPES = (T.FloatType, T.DoubleType, T.MapType)


def _mapped_names(cfg: TableConfig, source_fields: list[str]) -> list[str]:
    """Column names after map_changes: the post-projection row."""
    if cfg.column_map_from:
        return list(cfg.column_map_to or cfg.column_map_from)
    return source_fields


def inspect_table(
    cfg: TableConfig,
    catalog: SchemaCatalog,
    spark: SparkSession | None = None,
    check_reversible: bool = False,
) -> list[str]:
    ident = f"{cfg.schema_name}.{cfg.table_name}"
    meta = catalog.get(cfg.schema_name, cfg.table_name)
    if meta is None:
        return [f"{ident}: not registered in the schema catalog"]
    problems: list[str] = []
    fields = {f.name: f for f in meta.schema.fields}

    # 2. column map resolves
    for c in cfg.column_map_from:
        if c not in fields:
            problems.append(f"{ident}: column_map_from column {c!r} does not exist")
    if cfg.column_map_to and len(cfg.column_map_to) != len(cfg.column_map_from):
        problems.append(
            f"{ident}: column_map_to has {len(cfg.column_map_to)} names for "
            f"{len(cfg.column_map_from)} mapped columns"
        )

    # 3. unique key exists (post-map names) and has key-able types
    post_map = _mapped_names(cfg, list(fields))
    to_source = dict(zip(cfg.column_map_to, cfg.column_map_from))
    for k in cfg.unique_key:
        if k not in post_map:
            problems.append(
                f"{ident}: unique_key column {k!r} not present after column map"
            )
            continue
        src_name = to_source.get(k, k)
        f = fields.get(src_name)
        if f is not None and isinstance(f.dataType, _BAD_KEY_TYPES):
            problems.append(
                f"{ident}: unique_key column {k!r} has type "
                f"{f.dataType.simpleString()} — not usable as a key"
            )

    # 4. where parses against source columns
    if cfg.where:
        if spark is not None:
            try:
                # analysis is eager in classic PySpark: an unresolvable
                # column or non-boolean condition raises right here
                spark.createDataFrame([], meta.schema).filter(F.expr(cfg.where))
            except Exception as e:
                msg = str(e).splitlines()[0][:200]
                problems.append(f"{ident}: where {cfg.where!r} does not resolve: {msg}")
        else:  # parse-only (no session): syntax check
            try:
                F.expr(cfg.where)
            except Exception as e:
                problems.append(f"{ident}: where {cfg.where!r} does not parse: {e}")

    # 6. reverse invertibility
    if check_reversible and cfg.column_map_from and not cfg.column_map_to:
        problems.append(
            f"{ident}: column map is a projection without column_map_to — "
            "job cannot be reversed"
        )
    return problems


def preflight(
    job: JobConfig,
    catalog: SchemaCatalog,
    spark: SparkSession | None = None,
    check_reversible: bool = False,
) -> None:
    """Validate the whole job; raises :class:`PreflightError` listing
    EVERY problem found. Cheap (catalog + expression analysis only —
    no data is read), so it runs on every ``JobManager.create``."""
    problems: list[str] = []
    seen_targets: dict[tuple[str, str], str] = {}
    for cfg in job.tables:
        problems.extend(inspect_table(cfg, catalog, spark, check_reversible))
        tgt = (cfg.target_schema, cfg.target_table)
        prev = seen_targets.get(tgt)
        if prev is not None:
            problems.append(
                f"{cfg.schema_name}.{cfg.table_name}: target {tgt[0]}.{tgt[1]} "
                f"already written by {prev}"
            )
        seen_targets[tgt] = f"{cfg.schema_name}.{cfg.table_name}"
    if problems:
        raise PreflightError(problems)
