"""Row filters over change streams (reference F1-F7).

The reference evaluates a qlbridge-parsed SQL boolean per row — pushed
into the snapshot SQL (/root/reference/driver/mysql/dumper.go:96-150)
and VM-evaluated per binlog row (tabletypes.go:151-235). In Spark the
same expression string goes through Catalyst (``F.expr``), so snapshot
and stream share one filter and the snapshot path gets pushdown for
free. The registered function surface (tabletypes.go:15-27: pow, now,
sqrt, replace, uuid, char_length, upper, lower, ucase, lcase,
unix_timestamp) is a subset of Spark SQL built-ins; ``ucase``/``lcase``
are registered as aliases by :func:`register_compat_functions`.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.model import OP_DDL, OP_DELETE, OP_INSERT, OP_UPDATE

_COMPAT_REGISTERED: set[int] = set()


def register_compat_functions(spark: SparkSession) -> None:
    """Register reference-grammar aliases missing from Spark SQL.

    Everything else in the reference's registry (tabletypes.go:15-27)
    already exists as a Spark built-in with identical semantics.
    """
    if id(spark) in _COMPAT_REGISTERED:
        return
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION ucase AS 'org.apache.spark.sql.catalyst.expressions.Upper'")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION lcase AS 'org.apache.spark.sql.catalyst.expressions.Lower'")
    _COMPAT_REGISTERED.add(id(spark))


def snapshot_filter(df: DataFrame, where: str | None) -> DataFrame:
    """F1, snapshot side: the Where expression applied to a batch scan.

    Catalyst pushes supported predicates into the parquet/JDBC scan —
    the Spark equivalent of the reference building the filter into its
    chunk SQL (dumper.go:96-150).
    """
    return df if not where else df.filter(F.expr(where))


def apply_where_to_changes(changes: DataFrame, where: str | None) -> DataFrame:
    """F1+F3: Where filter over a change stream with update-pair semantics.

    Reference behavior (binlog_reader.go:1927-1983):
      - insert: keep iff after passes
      - delete: keep iff before passes
      - update: evaluate before and after independently;
          * both pass  -> stays an update
          * after only -> degrade to pure INSERT (before image nulled)
          * before only-> degrade to pure DELETE (after image nulled)
          * both fail  -> drop the row
        (the applier consumes the nulled half at applier_incr.go:747-790)
      - DDL rows pass through untouched.

    Implemented as pure column expressions — no UDF, stays in codegen.
    The ``where`` string references source column names; we evaluate it
    against each image by temporarily flattening the struct.
    """
    if not where:
        return changes

    def passes(image: str) -> Column:
        # Evaluate the boolean over the image struct's fields: expand
        # `colname` references by scoping the expression to the struct
        # with a lateral-style rewrite: struct fields are addressable as
        # `image.field`, so wrap the expr in a `CASE WHEN image IS NULL`.
        fields = changes.schema[image].dataType.names
        scoped = where
        # longest-first to avoid prefix collisions (e.g. `a` vs `ab`)
        for f_name in sorted(fields, key=len, reverse=True):
            scoped = _rewrite_ident(scoped, f_name, f"{image}.{f_name}")
        return F.col(image).isNotNull() & F.expr(scoped)

    before_ok = passes("before")
    after_ok = passes("after")

    new_op = (
        F.when(F.col("op") == OP_DDL, F.lit(OP_DDL))
        .when((F.col("op") == OP_INSERT) & after_ok, F.lit(OP_INSERT))
        .when((F.col("op") == OP_DELETE) & before_ok, F.lit(OP_DELETE))
        .when((F.col("op") == OP_UPDATE) & before_ok & after_ok, F.lit(OP_UPDATE))
        .when((F.col("op") == OP_UPDATE) & after_ok, F.lit(OP_INSERT))
        .when((F.col("op") == OP_UPDATE) & before_ok, F.lit(OP_DELETE))
        .otherwise(F.lit(None))
    )
    out = changes.withColumn("op", new_op).filter(F.col("op").isNotNull())
    # null out the failed half of a degraded update (applier_incr.go:747-790)
    out = out.withColumn(
        "before",
        F.when(F.col("op").isin(OP_DELETE, OP_UPDATE), F.col("before")).otherwise(F.lit(None)),
    ).withColumn(
        "after",
        F.when(F.col("op").isin(OP_INSERT, OP_UPDATE), F.col("after")).otherwise(F.lit(None)),
    )
    return out


def _rewrite_ident(expr: str, name: str, repl: str) -> str:
    """Replace bare identifier ``name`` in ``expr`` with ``repl``.

    Word-boundary textual rewrite; identifiers inside string literals are
    not protected (acceptable for the reference's filter grammar, which
    the docs show as simple column/function expressions).
    """
    return re.sub(rf"(?<![\w.`']){re.escape(name)}(?![\w.`'])", repl, expr)


def statement_class_filter(
    changes: DataFrame,
    no_dml_insert: bool = False,
    no_dml_update: bool = False,
    no_dml_delete: bool = False,
    no_ddl: bool = False,
) -> DataFrame:
    """F6 SqlFilter: drop whole statement classes
    (binlog_reader.go:110-178, :1866-1873)."""
    dropped = []
    if no_dml_insert:
        dropped.append(OP_INSERT)
    if no_dml_update:
        dropped.append(OP_UPDATE)
    if no_dml_delete:
        dropped.append(OP_DELETE)
    if no_ddl:
        dropped.append(OP_DDL)
    return changes if not dropped else changes.filter(~F.col("op").isin(dropped))


def origin_filter(changes: DataFrame, local_sid: str | None) -> DataFrame:
    """A11 cycle prevention for bidirectional sync: skip transactions that
    originated at this server (reference reads SID out of the peer's
    gtid_executed writes, applier_incr.go:292-294 + binlog_reader.go:1276-1307;
    with an explicit origin column the filter is one predicate)."""
    return changes if not local_sid else changes.filter(F.col("sid") != local_sid)


def table_filter(changes: DataFrame, schema_name: str, table_name: str) -> DataFrame:
    """F4 table selection for a multi-table stream (matchTable,
    binlog_reader.go:1332-1372 — exact-name form; regex selection happens
    at job-config build time, not per row)."""
    return changes.filter(
        (F.col("schema_name") == schema_name) & (F.col("table_name") == table_name)
    )


SYSTEM_SCHEMAS = ("mysql", "sys", "information_schema", "performance_schema", "dtle")


def system_schema_filter(changes: DataFrame, expand_syntax_support: bool = False) -> DataFrame:
    """F5: always skip internal schemas (binlog_reader.go:1276-1330);
    `mysql` passes through only under ExpandSyntaxSupport."""
    skip = [s for s in SYSTEM_SCHEMAS if not (expand_syntax_support and s == "mysql")]
    return changes.filter(~F.lower(F.col("schema_name")).isin(skip))


_SKIP_QUERY_RE = re.compile(
    r"^\s*create\s+(definer\s*=\s*\S+\s+)?"
    r"(trigger|function|procedure|event)\b|^\s*(grant|revoke|flush)\b",
    re.I,
)


def is_skip_query(query: str) -> bool:
    """F7: trigger/event/procedure/grant DDL is never replicated
    (regex skip, binlog_reader.go:1228-1265)."""
    return bool(_SKIP_QUERY_RE.match(query or ""))


def skip_query_filter(changes: DataFrame) -> DataFrame:
    """F7 applied to a change stream's DDL rows (non-DDL rows pass)."""
    pattern = r"(?i)^\s*(create\s+(definer\s*=\s*\S+\s+)?(trigger|function|procedure|event)|grant|revoke|flush)\b"
    return changes.filter(
        (F.col("op") != OP_DDL) | ~F.coalesce(F.col("query"), F.lit("")).rlike(pattern)
    )
