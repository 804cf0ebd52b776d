"""Keyword retrieval (BM25, rational-idf lane) and reciprocal-rank
fusion — the lexical half of hybrid retrieval, complementing the
vector half (functions/similarity.py ANN tiers + rp embeddings).

**Rational idf** (the textstats.py:175 N/df precedent): cross-engine
hash gates cannot use ``ln`` — transcendental functions are not
correctly-rounded and JVM/DuckDB differ at the ULP level — so the
gated lane scores with ``idf_r(df) = (N - df + 0.5) / (df + 0.5)``,
the exponential of Robertson's log-idf. Strictly monotone in df, so
single-term orderings are identical to textbook BM25; multi-term
mixes weight rare terms more steeply (documented as RBM25). Every
operation in the score is +/*/÷ on doubles — IEEE-deterministic on
both engines.

**Determinism of the term sum**: floating-point addition order must
match the oracle, so per-term scores are computed as PIVOTED COLUMNS
(one per query term, conditional aggregation) and summed left-to-right
in query-term order — never a cross-row float SUM, whose order Spark
does not define.

Scale shape: one token explode filtered to the query terms (the
filter reaches the scan side of the explode), partial-aggregated
tf/df, and a broadcast 1-row global-stats table — per-query cost is
O(matching postings), never a corpus-wide shuffle of non-matching
tokens. RRF is a |k|-row outer join.

Reference context: the reference has no text-retrieval surface; this
extends the training-data/analytics family (SURVEY §2.6 north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dtle_spark.functions.dedup import TOKEN_PATTERN
from dtle_spark.util import spread

__all__ = ["bm25_scores", "bm25_topk", "rrf_fuse"]


def _score_expr(i: int, k1: float, b: float) -> str:
    """Per-term RBM25 contribution from the pivoted tf_i/df_i columns —
    the EXACT arithmetic shape the DuckDB oracle restates."""
    return (
        f"IF(tf_{i} IS NULL, CAST(0 AS DOUBLE),"
        f" ((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f"  / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * ({k1} + 1.0))"
        f" / (CAST(tf_{i} AS DOUBLE)"
        f"    + {k1} * (1.0 - {b} + {b} * CAST(dl AS DOUBLE)"
        f"              * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))"
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id, score) for every document matching >= 1 query term. The
    avgdl division is expressed as ``dl * n_docs / sum_dl`` (integer
    numerators, one double division) so the oracle can restate it
    byte-for-byte.

    ``toks`` (r16): a pre-tokenized (id, toks array<string>) frame —
    pass it when the caller tokenizes the same corpus for another
    stage (hybrid retrieval's vector half), so the scan + regexp runs
    once per query, not once per stage. Built internally otherwise."""
    if not terms:
        # a punctuation-only query tokenizes to nothing; fail with a
        # clear contract error, not a zero-expr groupBy deep inside
        raise ValueError("bm25 needs at least one query term")
    if toks is None:
        # ONE tokenize pass per query (r16): lens and the posting
        # explode both read the token arrays, and without a pin each
        # re-runs the scan + regexp (the pin's first consumer is the
        # broadcast glob_stats build, so materialization is strictly
        # ordered — the lens/pivot reads are block scans). A
        # caller-provided ``toks`` frame is used as-is: the caller
        # owns its pinning (hybrid_rrf pins one shared frame).
        toks = spread(docs).select(
            F.col(id_col).alias("id"),
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
            ).alias("toks"),
        ).localCheckpoint(eager=False)
    lens = toks.select("id", F.size("toks").cast("long").alias("dl"))
    glob_stats = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    posting = (
        toks.select("id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)  # consumed by the pivot AND the df row
    )
    dfs_row = posting.groupBy().agg(*[
        F.countDistinct(F.when(F.col("term") == t, F.col("id")))
        .cast("long").alias(f"df_{i}")
        for i, t in enumerate(terms)
    ])
    pivoted = posting.groupBy("id").agg(*[
        F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ])
    score = " + ".join(f"({_score_expr(i, k1, b)})" for i in range(len(terms)))
    return (
        pivoted.join(lens, "id")
        .crossJoin(F.broadcast(glob_stats))
        .crossJoin(F.broadcast(dfs_row))
        .withColumn("score", F.expr(score))
        .select("id", "score")
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks: DataFrame | None = None,
) -> DataFrame:
    """Top-k matching documents: (id, rank, score), score desc then id
    — the same deterministic tie-break as the ANN tiers."""
    s = bm25_scores(docs, terms, k1=k1, b=b, id_col=id_col,
                    text_col=text_col, toks=toks)
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "rank", "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    k: int = 10,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): fuse rankings by
    ``sum over r of 1/(k0 + rank_r)``, absent entries contributing 0 —
    the standard hybrid lexical+vector combiner. The sum is a fixed
    left-to-right chain over the rankings in argument order, so the
    oracle restates it with COALESCE in the same positions."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    out = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(id_col).alias("id"),
                      F.col(rank_col).alias(f"__r{i}"))
        out = ri if out is None else out.join(ri, "id", "outer")
    score = " + ".join(
        f"coalesce(1.0 / ({k0} + CAST(__r{i} AS DOUBLE)), CAST(0 AS DOUBLE))"
        for i in range(len(rankings))
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("id"))
    return (
        out.withColumn("rrf", F.expr(score))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "rank", "rrf")
    )
