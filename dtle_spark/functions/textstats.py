"""Text-analysis operators for the training-data pipeline surface.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs. Each helper has an exact DuckDB restatement in the oracle registry
so the driver's differential gate covers it. This is the
"beyond-parity" surface SURVEY §2.6 calls out: the reference has no
analytics operators at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# tiny per-language stopword profiles for the n-gram/heuristic lang-id
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "que", "de", "los", "es"),
}


def tokens(text: Column) -> Column:
    """Lowercased alnum tokens (the whitespace+regex tokenizer)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def token_count(toks: Column) -> Column:
    return F.size(toks)


def char_count_tokens(toks: Column) -> Column:
    """Total characters across tokens (exact integer arithmetic)."""
    return F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    quoted = ", ".join(f"'{s}'" for s in stopwords)
    return F.size(F.filter(toks, lambda x: x.isin(*stopwords)))


def stopword_ratio(toks: Column) -> Column:
    return stopword_count(toks).cast("double") / F.nullif(F.size(toks), F.lit(0))


def quality_score(text: Column) -> Column:
    """Deterministic length/stopword/character-class quality heuristic.

    score = 0.4 * min(1, n_tokens/100)            (length prior)
          + 0.3 * (1 - stop_ratio)                (informativeness)
          + 0.3 * alnum_ratio                     (junk penalty)
    Fixed double-op order so any engine computes bit-identical values.
    """
    toks = tokens(text)
    n = F.size(toks).cast("double")
    stop = stopword_count(toks).cast("double") / F.nullif(F.size(toks), F.lit(0))
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")).cast(
        "double"
    ) / F.nullif(F.length(text), F.lit(0))
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - F.coalesce(stop, F.lit(0.0)))
        + F.lit(0.3) * F.coalesce(alnum, F.lit(0.0))
    )


def lang_guess(toks: Column) -> Column:
    """Stopword-profile language ID: argmax of per-language hit counts
    with a fixed precedence (en, de, fr, es) on ties; 'und' when no
    profile hits at all."""
    hits = {lang: stopword_count(toks, words) for lang, words in LANG_PROFILES.items()}
    best = F.greatest(*hits.values())
    out = F.when(best == 0, F.lit("und"))
    for lang in ("en", "de", "fr", "es"):
        out = out.when(hits[lang] == best, F.lit(lang))
    return out


def doc_fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    md5 is engine-portable (identical hex in Spark and DuckDB), which is
    why it backs fingerprinting/minhash here instead of Spark-internal
    xxhash64 — the values themselves become comparable fixtures.
    """
    return F.md5(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")))


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
# marks — the shape GPT-style byte-pair pre-tokenization produces
# before merges (whitespace handled by exclusion)
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_piece_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (cost estimation
    for LLM-pipeline budgeting)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0))


# --- PII scrubbing (training-data hygiene pass) ------------------------

# Pattern subset where Java regex (Spark) and RE2 (DuckDB) agree; the
# replace order (email -> ip -> phone) is part of the operator contract
# since the patterns could otherwise nest.
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_PATTERN = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
PHONE_PATTERN = "\\+[0-9]{7,15}"  # E.164-ish international form

_PII = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def pii_counts(text: Column) -> list[Column]:
    """(n_emails, n_ips, n_phones) — counted on the ORIGINAL text."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)) for pat, _ in _PII
    ]


def pii_scrub(text: Column) -> Column:
    """Redact emails/IPv4s/phones with typed placeholder tokens —
    map-only, codegen'd; the core hygiene pass before corpus assembly."""
    out = text
    for pat, repl in _PII:
        out = F.regexp_replace(out, pat, repl)
    return out


# --- Unicode text normalization (pre-tokenization hygiene) ------------

# curly quotes -> ASCII, en/em dash -> hyphen, NBSP -> space (7:7 map)
NORM_FROM = "“”‘’–— "
NORM_TO = '""\'\'-- '
# zero-width space/joiners + BOM: removed outright
ZERO_WIDTH_CLASS = "[​‌‍﻿]"


def normalize_text(text: Column) -> Column:
    """Deterministic unicode normalization: smart punctuation to ASCII
    (codepoint translate), zero-width characters removed, whitespace
    collapsed, trimmed. The ftfy-lite pass a corpus runs before
    tokenization — map-only, codegen'd, and restateable in DuckDB
    (translate/regexp_replace operate on codepoints in both engines;
    NBSP becomes ASCII space BEFORE the ASCII-\\s collapse, so the two
    engines' regex space classes agree)."""
    t = F.translate(text, NORM_FROM, NORM_TO)
    t = F.regexp_replace(t, ZERO_WIDTH_CLASS, "")
    return F.trim(F.regexp_replace(t, "\\s+", " "))


# --- TF-IDF keyword extraction ----------------------------------------


def tfidf_topk(
    docs,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    df_join: str = "auto",
):
    """Per-document top-k keywords by a rational tf-idf score:
    score = tf * N / df computed as CAST(tf * N AS DOUBLE) / df — a
    single IEEE division of exact integers, so both engines rank
    identically (a log-idf would hit libm differences across engines;
    the N/df rational preserves the df ordering log(N/df) gives).

    Returns (id, term, tf, df, score, rnk), rnk 1..k by
    (score DESC, term ASC).

    Scale shape: explode tokens -> groupBy (doc, term) for tf [shuffle
    1, combiner-friendly] -> groupBy term for df [shuffle 2] -> join df
    back onto tf -> per-doc top-k window [shuffle 3 on doc id].

    The df join is NOT always broadcastable: web-scale vocabularies
    grow with the corpus (Heaps' law — URLs, typos, code identifiers),
    so at 100 TB the df table can reach 10^8+ terms. Two mitigations,
    both semantics-preserving:
    - min-df prune: only terms with df >= 2 enter the join side; the
      hapax mass (typically >50% of vocab) is recovered exactly via a
      LEFT join + COALESCE(df, 1), since absence from the pruned table
      proves df = 1.
    - `df_join`: "auto" (default) adds no hint — Spark's cost-based
      planner + AQE broadcast the pruned table when it is under
      `spark.sql.autoBroadcastJoinThreshold` and shuffle-join it
      otherwise; "broadcast" forces the hint (bench tier / known-small
      vocab); "shuffle" forbids it (known-huge vocab)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).filter(~F.col("term").isin(*stopwords))
    # materialized once: df_t derives FROM tf, so without a barrier the
    # scored join recomputes the whole explode+tf shuffle for each
    tf = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    df_t = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .filter(F.col("df_t") >= 2)
    )
    if df_join == "broadcast":
        df_t = F.broadcast(df_t)
    elif df_join == "shuffle":
        df_t = df_t.hint("shuffle_hash")
    elif df_join != "auto":
        raise ValueError(f"df_join must be auto|broadcast|shuffle: {df_join!r}")
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(df_t, "term", "left")
        .withColumn("df", F.coalesce(F.col("df_t"), F.lit(1)))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.expr("CAST(tf * n AS DOUBLE) / df"))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "term", "tf", "df", "score", "rnk")
    )


# --- Gopher-style quality rule battery --------------------------------

# (min_words, max_words, min_mean_len, max_mean_len, alpha_ratio, stop_hits)
GOPHER_BOUNDS = (50, 100_000, 3.0, 10.0, 0.8, 2)


def gopher_metrics(text: Column) -> dict[str, Column]:
    """The Gopher quality-filter signals (Rae et al. 2021 §A1.1) that
    are computable from text alone, as pure Column expressions:
    word count bounds, mean word length bounds, alpha-word ratio,
    required stopword hits. Ratios are single IEEE divisions of exact
    integers — engine-portable. (The repetition signal is separate:
    dup_ratio below.)"""
    toks = tokens(text)
    n = F.size(toks)
    chars = char_count_tokens(toks)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return {
        "n_words": n,
        "mean_word_len": chars.cast("double") / F.nullif(n, F.lit(0)),
        "alpha_ratio": alpha.cast("double") / F.nullif(n, F.lit(0)),
        "stop_hits": stopword_count(toks),
    }


def gopher_flags(text: Column) -> dict[str, Column]:
    """Per-rule booleans + the overall keep decision."""
    m = gopher_metrics(text)
    lo, hi, mlo, mhi, aratio, shits = GOPHER_BOUNDS
    flags = {
        "words_ok": m["n_words"].between(lo, hi),
        "mean_len_ok": m["mean_word_len"].between(mlo, mhi),
        "alpha_ok": m["alpha_ratio"] > aratio,
        "stop_ok": m["stop_hits"] >= shits,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return {**m, **flags, "keep": F.coalesce(keep, F.lit(False))}


# --- intra-document repetition (Gopher-style quality signal) ----------


def word_ngrams_sql(toks_sql: str, n: int = 3) -> Column:
    """Ordered word n-grams from a token-array SQL fragment (empty when
    < n tokens). SQL-text ``slice``+``concat_ws`` form — the shape the
    winnowing shingles use; a Python-lambda ``element_at`` per gram
    re-evaluates the token expression per element and is ~30x slower."""
    return F.expr(
        f"CASE WHEN size({toks_sql}) < {n} THEN CAST(array() AS ARRAY<STRING>)"
        f" ELSE transform(sequence(1, size({toks_sql}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({toks_sql}, i, {n}))) END"
    )


def word_ngrams(text_col: str, n: int = 3) -> Column:
    """Ordered word n-grams of a text column (by name), tokenizing with
    the standard pattern. NOTE: prefer tokenizing at a SEPARATE select
    boundary and calling word_ngrams_sql on the token COLUMN — inlining
    the tokenizer here puts regexp_extract_all inside the per-gram
    lambda (slice argument), re-running the regex per element."""
    toks_sql = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    return word_ngrams_sql(toks_sql, n)


def dup_ratio(grams: Column) -> Column:
    """Fraction of duplicate n-grams (0 = no repetition) — the Gopher
    repetition-filter signal. Apply to a MATERIALIZED gram-array column
    (one select boundary upstream), and keep the fixed operand order:
    1.0 - distinct/total, computed as one double division."""
    return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
    )


def unigram_commonness(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc unigram LM quality proxy with exact-integer arithmetic:
    each token contributes floor(log2(corpus frequency)) "commonness
    bits" (length of the binary representation minus one — no floating
    log, so the score is bit-for-bit portable across engines). High
    mean = bland high-frequency text, low mean = rare-token text;
    pipelines threshold both tails, the cheap stand-in for a real
    KenLM perplexity gate.

    Scale shape: corpus frequency is one combiner-friendly groupBy on
    the term; the score join (tokens ⋈ vocabulary) keys on the term and
    is broadcastable whenever the vocabulary fits (AQE converts it at
    runtime); the rollup re-keys on the doc id. Zero-token docs score
    (0, 0, 0.0).
    """
    from pyspark.sql import DataFrame  # local: avoid module-level cycle

    assert isinstance(docs, DataFrame)
    tok = spread_docs_tokens(docs, id_col, text_col)
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    bits = freq.select(
        "term", (F.length(F.bin(F.col("cnt"))) - 1).cast("long").alias("bits")
    )
    per_doc = (
        tok.join(bits, "term")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").alias("info_bits"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("info_bits"), F.lit(0)).cast("long").alias("info_bits"),
            F.expr(
                "CASE WHEN coalesce(n_tokens, 0) = 0 THEN CAST(0.0 AS DOUBLE)"
                " ELSE CAST(info_bits AS DOUBLE) / n_tokens END"
            ).alias("mean_bits"),
        )
    )


def dsir_importance(
    docs,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """DSIR-style importance score (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") with exact-integer
    arithmetic: rank raw-corpus documents by how much they resemble a
    target distribution (``is_target`` marks the in-domain subset, e.g.
    a curated source). The per-token log-likelihood ratio
    ``log p_target(tok) - log p_raw(tok)`` is approximated by
    ``floor(log2(target_freq + 1)) - floor(log2(raw_freq + 1))`` —
    binary-string lengths, no floating log, so the score is bit-for-bit
    portable across engines. Normalizer terms (corpus token totals) are
    a per-token constant, so they shift every document's mean equally
    and cancel for ranking/resampling — documented, not computed.

    Returns (id, n_tokens, dsir_bits, mean_dsir): the integer bit sum
    and its length-normalized mean (single IEEE division at the end).
    High mean = target-like text; DSIR samples proportionally to it.

    Scale shape: ONE combiner-friendly groupBy on the term builds both
    frequency tables (conditional count — no second pass over the
    tokens); the score join keys on the term and broadcasts whenever
    the vocabulary fits (AQE converts at runtime); the rollup re-keys
    on the doc id. Zero-token docs score (0, 0, 0.0).
    """
    from pyspark.sql import DataFrame  # local: avoid module-level cycle

    assert isinstance(docs, DataFrame)
    from dtle_spark.util import spread

    tok = spread(docs).select(
        F.col(id_col).alias("id"),
        is_target.alias("is_tgt"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    vocab = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.count(F.when(F.col("is_tgt"), F.lit(1))).alias("cnt_t"),
    )
    weights = vocab.select(
        "term",
        (
            (F.length(F.bin(F.col("cnt_t") + 1)) - 1)
            - (F.length(F.bin(F.col("cnt_r") + 1)) - 1)
        )
        .cast("long")
        .alias("w"),
    )
    per_doc = (
        tok.join(weights, "term")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("dsir_bits"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("dsir_bits"), F.lit(0)).cast("long").alias("dsir_bits"),
            F.expr(
                "CASE WHEN coalesce(n_tokens, 0) = 0 THEN CAST(0.0 AS DOUBLE)"
                " ELSE CAST(dsir_bits AS DOUBLE) / n_tokens END"
            ).alias("mean_dsir"),
        )
    )


def spread_docs_tokens(docs, id_col: str, text_col: str):
    """(id, term) exploded token rows, partition-spread for CPU work."""
    from dtle_spark.util import spread

    return spread(docs).select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )


def perplexity_buckets(docs, id_col: str = "doc_id", text_col: str = "text",
                       buckets: int = 3):
    """CCNet-style quality partition (Wenzek et al. 2020): rank docs by
    the unigram-LM commonness score and cut into equal ntiles —
    bucket 1 = "head" (most common/bland, the LM-likeliest text),
    last = "tail" (rare-token text). Pipelines sample each bucket at
    different rates instead of hard-filtering.

    The score is the integer-exact unigram_commonness mean, so the
    ordering (score desc, id) is bit-identical across engines and the
    ntile boundaries hash-gate. The global ntile window is the
    oracle-gatable tier; at 100 TB use perplexity_buckets_sampled —
    bucket THRESHOLDS fitted once on a sample (CCNet's own procedure —
    it fits on a Wikipedia reference corpus), making the banding pass
    map-only; exact ntile needs this global sort."""
    from pyspark.sql import Window

    u = unigram_commonness(docs, id_col, text_col)
    w = Window.orderBy(F.col("mean_bits").desc(), F.col("id"))
    out = u.withColumn("bucket", F.ntile(buckets).over(w).cast("long"))
    return out.select("id", "mean_bits", "bucket", _band_label(buckets))


def _band_label(buckets: int):
    if buckets == 3:
        return (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        ).alias("band")
    return F.concat(F.lit("b"), F.col("bucket")).alias("band")


BAND_SAMPLE_HEX = "0123"  # leading md5 nibble -> deterministic 25% draw


def fit_band_thresholds(
    scores, buckets: int = 3,
    hex_chars: str | tuple[str, ...] = BAND_SAMPLE_HEX,
) -> list[float]:
    """Fit CCNet-style band thresholds on a deterministic sample of the
    per-doc scores: exact percentiles of ``mean_bits`` over the rows
    whose md5(id) leads with one of the ``hex_chars`` prefixes (a pure
    function of the id, so reruns fit identical thresholds; the same
    draw family the PQ train uses). No global sort of the CORPUS
    anywhere — but Spark's exact `percentile` buffers one counter per
    DISTINCT sampled value in the final merge, so the SAMPLE must be
    bounded, sized by the prefixes:

    - a plain ``str`` is a SET OF SINGLE NIBBLES — ``"0123"`` keeps
      4/16 of docs (iterating a string yields chars, so a string can
      never express a multi-nibble prefix);
    - pass a tuple/list for finer draws — ``("ab",)`` keeps 1/256,
      ``("abc", "d01")`` keeps 2/4096. Entries must share one length.

    (CCNet itself fits on a bounded reference corpus, not the full
    crawl.) Swap in `approx_percentile` for an unbounded-sample
    variant when threshold tolerance allows (not oracle-restatable —
    its t-digest is engine-specific). Returns buckets-1 descending cut
    points (driver-side floats — a bounded, fail-loud control-plane
    collect)."""
    plens = {len(c) for c in hex_chars}
    if len(plens) != 1:
        raise ValueError(f"hex_chars entries must share one length: {hex_chars!r}")
    plen = plens.pop()
    fracs = ", ".join(
        f"CAST({1 - i / buckets} AS DOUBLE)" for i in range(1, buckets)
    )
    nibbles = ", ".join(f"'{c}'" for c in hex_chars)
    row = (
        scores.filter(
            F.expr(f"substring(md5(CAST(id AS STRING)), 1, {plen}) IN ({nibbles})")
        )
        .agg(F.expr(f"percentile(mean_bits, array({fracs}))").alias("ts"))
        .collect()
    )
    ts = row[0]["ts"]
    if ts is None or any(t is None for t in ts):
        raise ValueError(
            f"band-threshold sample is empty (hex_chars={hex_chars!r}); "
            "widen the draw or check the id column"
        )
    return list(ts)


def apply_band_thresholds(scores, thresholds: list[float],
                          buckets: int | None = None):
    """Map-only banding: bucket = 1 + number of (descending) thresholds
    strictly above the score — band 1 ("head") is the most-common/bland
    text, matching perplexity_buckets' ordering. Pure Column arithmetic
    against literal cut points: no join, no window, no shuffle — THE
    production scoring pass (CCNet applies pre-fitted thresholds the
    same way)."""
    buckets = buckets if buckets is not None else len(thresholds) + 1
    bucket = F.lit(1)
    for t in thresholds:
        bucket = bucket + F.when(F.col("mean_bits") < F.lit(float(t)), 1).otherwise(0)
    out = scores.withColumn("bucket", bucket.cast("long"))
    return out.select("id", "mean_bits", "bucket", _band_label(buckets))


def perplexity_buckets_sampled(docs, id_col: str = "doc_id",
                               text_col: str = "text", buckets: int = 3,
                               hex_chars: str = BAND_SAMPLE_HEX):
    """The 100 TB lane of perplexity_buckets: score every doc (the
    unigram vocab groupBy + broadcast join — unavoidable and scalable),
    fit band thresholds ONCE on a deterministic 25% sample of the
    scores, then band map-only. vs the ntile lane: no global
    single-partition sort anywhere; bands approximate the equal-mass
    ntile cut to sampling accuracy (pytest-pinned: tie-aware agreement
    on the fixtures + near-equal masses on distinct scores, same
    pairing as the xxhash64-vs-md5 dedup lanes).
    Docs with EQUAL scores always land in the same band (ntile splits
    ties by id to force equal counts — thresholds never separate
    ties)."""
    # lazy: the threshold fit's percentile collect is the first
    # consumer and materializes the scores; banding then reads blocks
    u = unigram_commonness(docs, id_col, text_col).localCheckpoint(eager=False)
    ts = fit_band_thresholds(u, buckets=buckets, hex_chars=hex_chars)
    return apply_band_thresholds(u, ts, buckets=buckets)
