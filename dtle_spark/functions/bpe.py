"""Distributed BPE tokenizer training (Sennrich et al. 2016) as
DataFrame ops — the "train the tokenizer on the corpus" step of a
training-data pipeline, next to the BPE-ish token COUNTER in
textstats.py (which uses a fixed regex, no learned merges).

Algorithm (exactly the reference algorithm, restated Spark-first):

1. One corpus pass builds the WORD-FREQUENCY table (word -> count) —
   this is the standard trick that makes BPE training cheap: all
   subsequent iterations run over the vocabulary (|V| distinct words,
   ~10^5-10^7), never the corpus again. At 100 TB this is the only
   corpus-sized shuffle.
2. Each word starts as a char-symbol array with a '</w>' end marker.
3. Per merge iteration: count adjacent symbol pairs weighted by word
   count (one groupBy over |V| rows), pick the max (count desc, then
   lexicographic pair — fully deterministic), then rewrite the symbol
   arrays with a leftmost-first non-overlapping fold (pure Column
   aggregate; after a merge the new symbol a||b no longer equals a, so
   the single-pass fold IS the leftmost-first semantics).

The driver loop collects ONE row per iteration (the argmax pair) —
bounded metadata, not data. Symbol tables localCheckpoint each round
(lineage would otherwise grow by one fold per merge).

Determinism: counts are exact integers, ties break lexicographically,
so the merge list is a pure function of the corpus — pinned against a
pure-Python reference implementation in tests/test_custom_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the one corpus-sized aggregation."""
    from dtle_spark.functions.textstats import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """Char-split each word, append the end-of-word marker."""
    return wf.select(
        "word",
        "cnt",
        F.expr(f"concat(split(word, ''), array({_sql_quote(END)}))").alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency. The zip_with of
    the array against its own tail emits each adjacency; explode +
    groupBy is combiner-friendly (partial aggregation map-side)."""
    pairs = syms.select(
        "cnt",
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1),"
                " (a, b) -> struct(a AS a, b AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("cnt").alias("n"))


def _merge_expr(a: str, b: str) -> str:
    """Leftmost-first non-overlapping merge of adjacent (a, b) as one
    fold: if the accumulated tail is `a` and the next symbol is `b`,
    replace the tail with a||b, else append. Overlaps resolve left-first
    because the merged symbol no longer equals `a`."""
    qa, qb = _sql_quote(a), _sql_quote(b)
    qab = _sql_quote(a + b)
    return (
        f"aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) ->"
        f" CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {qa} AND s = {qb}"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array({qab}))"
        f" ELSE concat(acc, array(s)) END)"
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` BPE merges from the corpus. Returns the ordered
    merge list and the final (word, cnt, syms) symbol table (its
    distinct exploded symbols are the learned vocabulary).

    Stops early when no pair reaches ``min_count`` (merging singletons
    memorizes noise — same default cutoff as the reference algorithm).
    """
    syms = _initial_symbols(word_freq(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(syms)
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        syms = syms.select(
            "word", "cnt", F.expr(_merge_expr(a, b)).alias("syms")
        ).localCheckpoint()
    return merges, syms


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Tokenize with a LEARNED merge list: per word, apply every merge
    in training order (the standard apply semantics). Map-only — the
    merge list folds into the plan as literals; no shuffle at all, so
    applying a tokenizer to 100 TB is embarrassingly parallel.

    Returns (id, word, pieces)."""
    from dtle_spark.functions.textstats import tokens

    out = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("word")
    ).withColumn(
        "syms", F.expr(f"concat(split(word, ''), array({_sql_quote(END)}))")
    )
    for a, b in merges:
        out = out.withColumn("syms", F.expr(_merge_expr(a, b)))
    return out.select("id", "word", F.col("syms").alias("pieces"))
