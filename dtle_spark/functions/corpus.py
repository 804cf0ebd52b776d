"""Corpus-assembly operators for the training-data pipeline: the
steps AFTER cleaning/dedup that turn a document pool into training
input — deterministic stratified sampling (language/source mixing
weights) and sequence packing (token-budget binning).

Both are pure Column expressions (no UDFs) with integer-exact
arithmetic, so each is oracle-checkable against DuckDB.

Scale notes:
- stratified_sample is a map-only stage: the keep/drop decision is a
  per-row hash compare against a broadcast rates literal — no shuffle,
  no sort, resumable (the same doc always draws the same uniform).
- pack_sequences windows per `part_col` (source): packing is
  embarrassingly parallel across partitions, sequential only within
  one (the cumsum). For a single giant source, pre-shard with
  `F.pmod(F.hash(id), shards)` as the partition column and accept
  shard-local packing — bin ids stay globally unique via (shard, bin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dtle_spark.functions.dedup import hex_window_sql
from dtle_spark.functions.textstats import token_count, tokens

# the md5-derived 40-bit uniform: same construction both engines
_U_DENOM = 1 << 40


def hash_uniform_expr(id_col: str, dialect: str = "spark") -> str:
    """Deterministic per-id 40-bit integer draw in [0, 2^40): the first
    10 hex chars of md5(id as string). Dividing by 2^40 would give a
    float uniform — callers should instead compare integers:
    keep iff draw * denom < num * 2^40 (exact cross-multiply)."""
    cast = "CAST" if dialect == "spark" else "CAST"
    m = f"md5({cast}({id_col} AS STRING))" if dialect == "spark" else f"md5(CAST({id_col} AS VARCHAR))"
    return hex_window_sql(m, 1, dialect)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, tuple[int, int]],
    id_col: str = "doc_id",
    strata_col: str = "lang",
    default_rate: tuple[int, int] = (0, 1),
) -> DataFrame:
    """Keep each row of stratum s with probability num/denom — exactly,
    deterministically: row kept iff hash40(id) * denom < num * 2^40.
    `rates` maps stratum -> (num, denom) as INTEGERS (e.g. ('en', (1,2))
    = 50%) so the comparison never touches a float. The same doc_id
    always draws the same uniform -> re-runs and incremental extensions
    of the corpus sample consistently (the property reservoir sampling
    cannot give you on a growing 100 TB corpus)."""
    draw = F.expr(hash_uniform_expr(id_col, "spark"))
    keep = None
    for stratum, (num, denom) in rates.items():
        cond = (F.col(strata_col) == stratum) & (draw * denom < num * _U_DENOM)
        keep = cond if keep is None else (keep | cond)
    num, denom = default_rate
    other = ~F.col(strata_col).isin(*rates.keys()) & (draw * denom < num * _U_DENOM)
    keep = other if keep is None else (keep | other)
    return docs.filter(keep)


def stratified_sample_sql(
    rates: dict[str, tuple[int, int]],
    id_col: str = "doc_id",
    strata_col: str = "lang",
    default_rate: tuple[int, int] = (0, 1),
) -> str:
    """DuckDB WHERE-clause mirror of stratified_sample."""
    draw = hash_uniform_expr(id_col, "duckdb")
    parts = [
        f"({strata_col} = '{s}' AND {draw} * {denom} < {num} * {_U_DENOM})"
        for s, (num, denom) in rates.items()
    ]
    num, denom = default_rate
    in_list = ", ".join(f"'{s}'" for s in rates)
    parts.append(
        f"({strata_col} NOT IN ({in_list}) AND {draw} * {denom} < {num} * {_U_DENOM})"
    )
    return " OR ".join(parts)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-pretraining layout):
    within each `part_col` partition, documents concatenate in id order
    and split into fixed `budget`-token bins. A document starting at
    running offset c lands in bin c DIV budget at offset c % budget
    (documents may straddle bins — the trainer's loader handles the
    continuation, as in standard packed-LM input pipelines).

    Returns (part, id, n_tokens, bin, bin_offset). Integer-exact:
    token counts and cumulative sums are longs.
    """
    w = (
        Window.partitionBy("part")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nt = token_count(tokens(F.col(text_col))).cast("long")
    return (
        docs.select(
            F.col(part_col).alias("part"),
            F.col(id_col).alias("id"),
            nt.alias("n_tokens"),
        )
        .withColumn("__c", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "part",
            "id",
            "n_tokens",
            F.expr(f"__c DIV {budget}").alias("bin"),
            (F.col("__c") % budget).alias("bin_offset"),
        )
    )
