"""Declarative data-quality constraint checking — the expectations
layer a 100 TB ingest pipeline runs before promoting data (the Deequ
/ dbt-tests feature family), Spark-first: every row-level check
compiles into ONE aggregation pass over the table (conditional
counts), so N checks cost one scan, not N.

Check specs (dicts, JSON-serializable so suites can live in config):

- ``{"check": "not_null", "col": c}`` — violations = rows with NULL c
- ``{"check": "unique", "cols": [c, ...]}`` — violations = rows in
  excess of one per distinct key (count - distinct count)
- ``{"check": "accepted_values", "col": c, "values": [...]}`` —
  rows whose c is outside the set (NULL counts as a violation)
- ``{"check": "range", "col": c, "lo": x, "hi": y}`` — rows with
  c < lo or c > hi (bounds optional, NULL is a violation)
- ``{"check": "expression", "name": n, "sql": bool_sql}`` — rows
  where the SQL predicate is NOT satisfied (NULL = violation)

Referential integrity needs a second table and therefore its own
(anti-join) pass: :func:`dq_referential`.

Report shape: (check_name string, violations BIGINT, n_rows BIGINT) — one
row per check, integral counts only (hash-gate-safe). ``passed`` is
derivable (violations = 0) and deliberately not stored as a boolean:
thresholded acceptance (e.g. <0.1% nulls) is the caller's policy.

Scale shape: the single agg partial-aggregates to one row per
partition (a handful of longs) before a one-row shuffle; unique adds
count(distinct struct) which Catalyst plans as a two-stage
partial-distinct aggregate on the key — the only check whose cost is
key-cardinality-shaped. dq_referential is a broadcast or shuffled
anti join on the FK — the same join the fact load itself performs.

Reference context: the reference validates connections/privileges at
job create (driver/mysql/validator) but has no content-level
constraint surface; SURVEY §2.6 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _zsum(col: F.Column) -> F.Column:
    """SUM that reports 0 (not NULL) over zero rows — an empty or
    fully-filtered table has zero violations, and callers comparing
    ``violations == 0`` must not get NULL (a threshold policy would
    silently mis-evaluate)."""
    return F.coalesce(F.sum(col), F.lit(0))


def _violation_expr(spec: dict) -> tuple[str, F.Column]:
    kind = spec["check"]
    if kind == "not_null":
        c = spec["col"]
        return f"not_null:{c}", _zsum(
            F.when(F.col(c).isNull(), 1).otherwise(0)
        )
    if kind == "unique":
        cols = list(spec["cols"])
        label = "unique:" + ",".join(cols)
        return label, (
            F.count(F.lit(1))
            - F.countDistinct(*[F.col(c) for c in cols])
        )
    if kind == "accepted_values":
        c, vals = spec["col"], list(spec["values"])
        ok = F.col(c).isin(*vals)
        return f"accepted_values:{c}", _zsum(
            F.when(ok, 0).otherwise(1)
        )
    if kind == "range":
        c, lo, hi = spec["col"], spec.get("lo"), spec.get("hi")
        ok = F.col(c).isNotNull()
        if lo is not None:
            ok = ok & (F.col(c) >= F.lit(lo))
        if hi is not None:
            ok = ok & (F.col(c) <= F.lit(hi))
        return f"range:{c}", _zsum(F.when(ok, 0).otherwise(1))
    if kind == "expression":
        name, sql = spec["name"], spec["sql"]
        ok = F.expr(sql)
        return f"expression:{name}", _zsum(F.when(ok, 0).otherwise(1))
    raise ValueError(f"unknown check kind {kind!r}")


def dq_report(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run every row-level check in ONE aggregation pass.

    Returns (check_name, violations, n_rows), one row per check, in a
    deterministic order (the check label). Unknown check kinds raise
    at plan time, not per row."""
    if not checks:
        raise ValueError("dq_report needs at least one check")
    labeled = [_violation_expr(s) for s in checks]
    aggs = [
        expr.cast("long").alias(f"__v{i}")
        for i, (_, expr) in enumerate(labeled)
    ]
    one = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
    pairs = ", ".join(
        f"'{label}', __v{i}" for i, (label, _) in enumerate(labeled)
    )
    return (
        one.selectExpr(
            f"stack({len(labeled)}, {pairs}) AS (check_name, violations)", "__n"
        )
        .select("check_name", "violations", F.col("__n").alias("n_rows"))
        .orderBy("check_name")
    )


def dq_referential(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """Referential-integrity check: child rows whose non-null ``fk``
    has no matching ``parent.pk`` (one anti join). Same report shape,
    label ``referential:<fk>-><pk>`` — returned lazily (two one-row
    aggregates under a broadcast crossJoin), so it unions with
    dq_report without forcing execution."""
    n = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    orphans = (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), [fk], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return orphans.crossJoin(F.broadcast(n)).select(
        F.lit(f"referential:{fk}->{pk}").alias("check_name"),
        "violations",
        "n_rows",
    )
