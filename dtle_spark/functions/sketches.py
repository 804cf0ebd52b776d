"""Deterministic sketch operators.

Probabilistic-structure results normally can't be oracle-gated (they
depend on engine-internal hashing); these sketches are built on the
md5-derived 40-bit uniform both engines share, so the SKETCH ITSELF is
bit-identical in Spark and DuckDB — estimates become hash-comparable
fixtures while keeping true sketch economics at scale.

KMV (k minimum values) distinct-count: keep the k smallest distinct
hash values; D-hat = (k-1) * 2^40 / h_(k). Standard error ~ 1/sqrt(k-2)
(Beyer et al. 2007, "On synopses for distinct-value estimation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.functions.dedup import hex_window_sql

_U_DENOM = 1 << 40


def hash40_expr(col_sql: str, dialect: str = "spark") -> str:
    """The shared 40-bit uniform of an expression (stringified md5)."""
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    return hex_window_sql(f"md5(CAST({col_sql} AS {cast}))", 1, dialect)

def kmv_distinct(
    df: DataFrame,
    col_sql: str,
    k: int = 256,
) -> DataFrame:
    """One-row (k, got_k, kth_min, kmv_estimate) distinct-count sketch
    of ``col_sql``. When the true cardinality is below k the sketch is
    exact (estimate = got_k).

    Scale shape: the distinct aggregate is combiner-friendly (partial
    per-partition dedup before the shuffle — hashes are 8 bytes, not
    the source column), and the ordered limit compiles to
    TakeOrderedAndProject: per-partition k-smallest heaps merged on the
    driver, never a global sort. At 100 TB the wire cost is the
    distinct-hash shuffle; for repeated profiling keep the k-minima per
    partition file and merge sketches instead (same estimator).
    """
    h = F.expr(hash40_expr(col_sql, "spark"))
    kth = (
        df.select(h.alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("kth_min"), F.count(F.lit(1)).alias("got_k"))
    )
    est = (
        f"CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)"
        f" ELSE CAST({(k - 1) * _U_DENOM} AS DOUBLE) / kth_min END"
    )
    return kth.select(
        F.lit(k).alias("k"),
        "got_k",
        "kth_min",
        F.expr(est).alias("kmv_estimate"),
    )


def kmv_minima(df: DataFrame, col_sql: str, k: int = 256) -> DataFrame:
    """The sketch STATE: the k smallest distinct hashes as one-row
    (hvs array<bigint>). Persist per partition/day/table and merge —
    the mergeability is what makes KMV a fleet-wide profiling tool
    (sketch once per ingest batch, union later, never re-scan)."""
    h = F.expr(hash40_expr(col_sql, "spark"))
    return (
        df.select(h.alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.expr("sort_array(collect_list(hv))").alias("hvs"))
    )


def kmv_merge(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union N sketch states -> one (k, got_k, kth_min, kmv_estimate)
    row estimating the DISTINCT UNION of the original inputs: explode,
    re-dedup, keep the k global minima. Exactly the estimator
    kmv_distinct computes on the concatenated raw data (same hashes,
    same k-minima), so its accuracy bound carries over unchanged."""
    kth = (
        sketches.select(F.explode("hvs").alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("kth_min"), F.count(F.lit(1)).alias("got_k"))
    )
    est = (
        f"CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)"
        f" ELSE CAST({(k - 1) * _U_DENOM} AS DOUBLE) / kth_min END"
    )
    return kth.select(
        F.lit(k).alias("k"), "got_k", "kth_min", F.expr(est).alias("kmv_estimate")
    )


def kmv_distinct_sql(
    col_sql: str,
    table: str,
    k: int = 256,
) -> str:
    """DuckDB mirror of kmv_distinct (identical hash, fold, and
    estimate arithmetic)."""
    h = hash40_expr(col_sql, "duckdb")
    return f"""
    WITH h AS (SELECT DISTINCT {h} AS hv FROM {table}),
    kk AS (SELECT MAX(hv) AS kth_min, COUNT(*) AS got_k
           FROM (SELECT hv FROM h ORDER BY hv LIMIT {k}))
    SELECT {k} AS k, got_k, kth_min,
      CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)
      ELSE CAST({(k - 1) * _U_DENOM} AS DOUBLE) / kth_min END AS kmv_estimate
    FROM kk
    """
