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


def source_mixing(
    docs: DataFrame,
    targets: dict[str, tuple[int, int]],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Downsample each source so the kept corpus approaches the target
    mix `targets[source] = (num, denom)` (share of the ORIGINAL total).
    Sources absent from `targets` are dropped.

    Per-source keep rate r_s = min(1, share_s * N_total / N_s) realized
    as a deterministic per-id hash draw: keep iff
    draw40(id) < floor(num * N_total * 2^40 / (denom * N_s)).
    The threshold is computed in DECIMAL(38,0) (the product overflows
    int64 at corpus scale: 2^40 * denom * N_s), the comparison is a
    plain int64 compare; no float touches the decision, so the sample
    is exact, reproducible, and stable under corpus growth — the same
    resumability property stratified_sample has.

    Scale: pass 1 is a tiny groupBy(source) count; pass 2 is map-only —
    the per-source thresholds broadcast-join onto the stream.
    """
    counts = docs.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    total = counts.agg(F.sum("__n").alias("__total"))
    tgt = F.create_map(
        *[F.lit(x) for s, (num, denom) in targets.items() for x in (s, f"{num}/{denom}")]
    )
    thr = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("__t", tgt[F.col("__src")])
        .filter(F.col("__t").isNotNull())
        .withColumn("__num", F.split("__t", "/")[0].cast("long"))
        .withColumn("__denom", F.split("__t", "/")[1].cast("long"))
        .select(
            "__src",
            F.expr(
                "CAST((CAST(__num AS DECIMAL(38,0)) * __total * 1099511627776)"
                " DIV (CAST(__denom AS DECIMAL(38,0)) * __n) AS BIGINT)"
            ).alias("__thr"),
        )
    )
    draw = F.expr(hash_uniform_expr(id_col, "spark"))
    return (
        docs.join(F.broadcast(thr), docs[source_col] == thr["__src"])
        .filter(draw < F.col("__thr"))
        .drop("__src", "__thr")
    )


def source_mixing_sql(
    targets: dict[str, tuple[int, int]],
    id_col: str = "doc_id",
    source_col: str = "source",
    table: str = "documents",
) -> str:
    """DuckDB mirror of source_mixing (HUGEINT where Spark uses
    DECIMAL(38,0); `//` == Spark's `DIV` floor for positives)."""
    values = ", ".join(
        f"('{s}', {num}, {denom})" for s, (num, denom) in targets.items()
    )
    draw = hash_uniform_expr(id_col, "duckdb")
    return f"""
    WITH cnt AS (SELECT {source_col} AS src, COUNT(*) AS n FROM {table} GROUP BY 1),
    tot AS (SELECT SUM(n) AS total FROM cnt),
    tgt AS (SELECT * FROM (VALUES {values}) t(src, num, denom)),
    thr AS (
      SELECT c.src,
        CAST(CAST(t.num AS HUGEINT) * tot.total * 1099511627776
             // (CAST(t.denom AS HUGEINT) * c.n) AS BIGINT) AS thr
      FROM cnt c JOIN tgt t USING (src), tot
    )
    SELECT d.* FROM {table} d JOIN thr ON d.{source_col} = thr.src
    WHERE {draw} < thr.thr
    """


def explode_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """(id, pos, line): one row per line, position preserved."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    )


def strip_boilerplate(
    docs: DataFrame,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """CCNet-style line-level boilerplate removal: a line occurring in
    >= `min_docs` DISTINCT documents (nav bars, cookie banners, license
    footers) is stripped from every document. Returns one row per input
    doc: (id, n_lines, n_kept, clean_text) with surviving lines
    rejoined in original order.

    Scale shape: lines carry only (16-byte md5, doc_id) into the
    frequency groupBy; the boilerplate set joins back as a left_anti on
    the digest (shuffle on the same key — AQE reuses the exchange); the
    reassembly groupBy shuffles (pos, line) once per surviving line.
    The alternative pass-the-text-twice design would move full document
    bodies through two shuffles instead of one.
    """
    # materialized once: the frequency groupBy and the anti-join both
    # read the line table — without a barrier the explode+md5 runs twice
    lines = explode_lines(docs, id_col, text_col, delim).withColumn(
        "fp", F.md5(F.col("line"))
    ).localCheckpoint(eager=False)
    boiler = (
        lines.groupBy("fp")
        .agg(F.count_distinct(F.col("id")).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("fp")
    )
    kept = lines.join(boiler, "fp", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            delim,
            F.expr("transform(sort_array(collect_list(struct(pos, line))), s -> s.line)"),
        ).alias("clean_text"),
    )
    n_lines = F.size(F.split(F.col(text_col), delim))
    return (
        docs.select(F.col(id_col).alias("id"), n_lines.alias("n_lines"))
        .join(rebuilt, "id", "left")
        .select(
            "id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


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


def corpus_shuffle(
    docs: DataFrame, id_col: str = "doc_id", shards: int = 16
) -> DataFrame:
    """Deterministic global training-order shuffle: the step between
    corpus assembly and sequence packing that destroys source/time
    locality (training batches must not see a million consecutive docs
    from one crawl). Each doc draws its md5 40-bit uniform; shard =
    draw mod shards, position = rank of (draw, id) within the shard.
    Readers consume shards in any order, positions in order — a
    reproducible permutation with no RNG state, stable under corpus
    growth the same way stratified_sample is (a doc's draw never
    changes, so re-runs after appends move no existing doc across
    shards).

    Scale shape: one exchange keyed on the shard + a shard-local sort
    (the window). Shard count is the sort-memory knob: 100 TB / 64k
    shards ≈ 1.6 GB per sort — executor-sized. No global sort at any
    scale.
    """
    u = F.expr(hash_uniform_expr(id_col, "spark"))
    d = docs.select(F.col(id_col).alias("id"), u.alias("u"))
    d = d.withColumn("shard", (F.col("u") % shards).cast("long"))
    w = Window.partitionBy("shard").orderBy("u", "id")
    return d.select(
        "id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


def export_training_shards(
    docs: DataFrame,
    out_dir: str,
    budget: int = 2048,
    shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """The assembled corpus EXPORT: deterministic shuffle ->
    shard-local sequence packing -> one parquet directory per shard,
    sealed by a JSON manifest written LAST (readers that find the
    manifest find complete data — the same manifest-last protocol as
    sinks/manifest.py). Output rows: (shard, pos, id, n_tokens, bin,
    bin_offset, text), partitioned by shard; a trainer streams shard
    files in any order and rows by pos within one.

    Scale shape: corpus_shuffle's shard exchange IS the packing
    partition — shuffle once, then the pack window and the partitioned
    write both reuse shard locality. Manifest is O(shards) small.
    """
    import json as _json
    import os as _os

    order = corpus_shuffle(docs, id_col, shards)
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")).join(
        order, "id"
    )
    packed = pack_sequences(
        d.withColumnRenamed("pos", "posn"),
        budget=budget,
        id_col="posn",
        text_col="text",
        part_col="shard",
    ).withColumnRenamed("part", "shard").withColumnRenamed("id", "posn")
    out = (
        d.select("id", F.col("pos").alias("posn"), "shard", "text")
        .join(packed, ["shard", "posn"])
        .select(
            "shard", F.col("posn").alias("pos"), "id", "n_tokens", "bin",
            "bin_offset", "text",
        )
    )
    data_dir = _os.path.join(out_dir, "data")
    out.repartition("shard").write.partitionBy("shard").mode("overwrite").parquet(data_dir)
    stats = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.countDistinct("shard", "bin")).alias("n_bins"),
    ).collect()[0]
    manifest = {
        "format": "packed-corpus-v1",
        "shards": shards,
        "budget": budget,
        "n_docs": stats["n_docs"],
        "total_tokens": stats["total_tokens"],
        "n_bins": stats["n_bins"],
        "data_dir": "data",
    }
    tmp = _os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(manifest, f, indent=1)
    _os.replace(tmp, _os.path.join(out_dir, "_manifest.json"))
    return manifest


# 2^80 as a decimal literal: the cross-multiply bound for the squared
# 40-bit draw (temperature_mixing below)
_U2_DENOM = "1208925819614629174706176"


def temperature_mixing(
    docs: DataFrame,
    k2: int = 4,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """UniMax/temperature-scaled source balancing at tau = 0.5: keep
    each doc of source s with probability p_s = min(1, sqrt(k2/n_s)).
    Big sources are downsampled toward the square root of their size
    (the standard multilingual-corpus rebalancing; tau=1 is
    proportional = no-op, tau=0 is uniform — 0.5 is the published
    sweet spot), sources with n_s <= k2 are kept whole.

    Exactly, without a float: p_s involves sqrt, but the DRAW condition
    U/2^40 < sqrt(k2/n_s) squares into U^2 * n_s < k2 * 2^80 — an
    integer compare both engines evaluate identically (DECIMAL(38,0)
    here, HUGEINT in DuckDB). Same md5 draw as stratified_sample, so
    the selection is reproducible and append-stable.

    Scale: tiny per-source count + broadcast join; decision is map-only.
    """
    counts = docs.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        docs.join(F.broadcast(counts), docs[source_col] == counts["__src"])
        # hash once per row (md5 is the expensive part of this map stage)
        .withColumn("__u", F.expr(hash_uniform_expr(id_col, "spark")))
        .filter(
            F.expr(
                f"CAST(__u AS DECIMAL(38,0)) * __u * __n"
                f" < CAST({k2} AS DECIMAL(38,0)) * {_U2_DENOM}"
            )
        )
        .drop("__src", "__n", "__u")
    )


def temperature_mixing_sql(
    k2: int = 4, id_col: str = "doc_id", source_col: str = "source"
) -> str:
    """DuckDB restatement (HUGEINT cross-multiply)."""
    u = hash_uniform_expr(id_col, "duckdb")
    return f"""
    WITH n AS (SELECT {source_col} AS src, count(*) AS cnt FROM documents GROUP BY 1)
    SELECT d.doc_id, d.{source_col}
    FROM documents d JOIN n ON d.{source_col} = n.src
    WHERE CAST({u} AS HUGEINT) * {u} * cnt < CAST({k2} AS HUGEINT) * {_U2_DENOM}
    """


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-prep chunking: split each doc's token stream into
    fixed windows of ``window`` tokens advancing by ``stride``
    (window - stride tokens of overlap preserve context across chunk
    boundaries — the standard long-document pretraining treatment).
    Output: (doc_id, chunk_idx, start_tok, n_tok, chunk_text).

    Scale shape: map-only — tokens/sequence/posexplode all run inside
    the row, no keyed shuffle; 100 TB in, chunks out, embarrassingly
    parallel. Chunk count per doc is ceil(max(n-1,0)/stride)+1-ish:
    starts at 0, stride, 2*stride, ... while start < n."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(F.col(text_col))
    d = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).withColumn("__n", F.size("__toks")).filter(F.col("__n") > 0)
    d = d.withColumn(
        "__starts", F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
    ).select(
        "doc_id", "__toks", "__n",
        F.posexplode("__starts").alias("chunk_idx", "start_tok"),
    )
    n_tok = F.least(F.lit(window), F.col("__n") - F.col("start_tok"))
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        n_tok.cast("long").alias("n_tok"),
        F.concat_ws(
            " ", F.slice("__toks", F.col("start_tok") + 1, n_tok)
        ).alias("chunk_text"),
    )


def length_buckets(
    docs: DataFrame,
    bucket_width: int = 32,
    max_bucket: int = 8,
    batch_size: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-grouped batching assignment: bucket docs by token count
    (bucket = min(n_tok DIV width, max)) and number deterministic
    batches within each bucket — the padding-efficiency step before
    batch materialization (batching similar lengths together wastes
    no pad tokens). Order within a bucket is the md5-draw shuffle
    order (append-stable), batch_idx = seq DIV batch_size.

    Scale shape: one exchange keyed on bucket + shard-local sort —
    identical economics to corpus_shuffle; bucket count bounds skew."""
    n = token_count(tokens(F.col(text_col)))
    u = F.expr(hash_uniform_expr(id_col, "spark"))
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tok"),
        u.alias("__u"),
    ).withColumn(
        "bucket",
        F.least(F.expr(f"n_tok DIV {bucket_width}"), F.lit(max_bucket)).cast("long"),
    )
    w = Window.partitionBy("bucket").orderBy("__u", "doc_id")
    seq = (F.row_number().over(w) - 1).cast("long")
    return d.withColumn("__seq", seq).select(
        "doc_id", "n_tok", "bucket",
        F.expr(f"__seq DIV {batch_size}").alias("batch_idx"),
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    val_rate: tuple[int, int] = (1, 10),
) -> DataFrame:
    """Train/val split whose UNIT is the near-dup cluster, not the
    document: every member of a duplicate cluster draws from its
    cluster representative (singletons from their own id), so
    near-duplicates can never straddle the split — the leakage mode a
    plain per-document hash split cannot prevent (Lee et al. 2022
    measure exactly this eval contamination). Deterministic integer
    draw (hash_uniform_expr) -> growth-stable and resumable like
    stratified_sample; no floats, no RNG state.

    ``clusters`` is connected-components output (node, component).
    Returns (id, unit_id, split) with split in {'train','val'}.

    Scale: one left join of docs against the (far smaller) cluster
    membership table keyed on id, then a map-only draw — the CC input
    is the dedup pipeline's existing byproduct, so the split adds one
    digest-keyed join to a pipeline that already paid for clustering."""
    c = clusters.select(
        F.col("node").alias(id_col), F.col("component").alias("__unit0")
    )
    num, denom = val_rate
    out = (
        docs.select(id_col)
        .join(c, id_col, "left")
        .withColumn("unit_id", F.coalesce(F.col("__unit0"), F.col(id_col)).cast("long"))
    )
    draw = F.expr(hash_uniform_expr("unit_id", "spark"))
    return out.select(
        F.col(id_col),
        "unit_id",
        F.when(draw * denom < num * _U_DENOM, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def priority_sample(
    docs: DataFrame,
    n: int,
    weight_sql: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sample WITHOUT replacement by priority sampling
    (Duffield, Lund & Thorup 2007, "Priority sampling for estimation
    of arbitrary subset sums"): each row draws priority q = w/u with u
    uniform in (0,1]; the n largest priorities are the sample, and
    est_weight = max(w, tau) — tau the (n+1)-th priority — is an
    UNBIASED estimator of any subset's total weight (sum est_weight
    over sampled members of the subset).

    Determinism/cross-engine: u = (hash40(id)+1)/2^40 — the md5 draw
    both engines share — and every comparison is on (hash40(id)+1)/w
    as one IEEE double DIVISION of two exact integers. Unlike pow/ln
    (whose libm rounding differs per engine — the bm25 rational-idf
    lesson), IEEE division is correctly rounded everywhere, so the
    selected SET and the emitted doubles are bit-identical in DuckDB.

    Scale shape: the score is map-only; orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-(n+1) heaps merged on the
    driver) — no global sort, no shuffle of the corpus. Rows with
    non-positive weight cannot be sampled (w <= 0 is filtered)."""
    u_int = hash_uniform_expr(id_col, "spark")
    key = f"CAST({u_int} + 1 AS DOUBLE) / CAST({weight_sql} AS DOUBLE)"
    scored = (
        docs.filter(F.expr(f"{weight_sql} > 0"))
        .withColumn("w", F.expr(f"CAST({weight_sql} AS DOUBLE)"))
        .withColumn("inv_priority", F.expr(key))
        .orderBy("inv_priority", id_col)
        .limit(n + 1)
        .localCheckpoint()  # consumed twice: threshold + sample
    )
    # tau = the (n+1)-th LARGEST priority = 2^40 / max(inv_priority)
    # among the n+1 smallest inverse priorities (broadcast scalar)
    tau = scored.agg(
        (F.lit(float(_U_DENOM)) / F.max("inv_priority")).alias("tau"),
        F.count(F.lit(1)).alias("got"),
    )
    w = Window.orderBy("inv_priority", id_col)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .crossJoin(F.broadcast(tau))
        .withColumn(
            "est_weight",
            # when the population is <= n the sample is exhaustive and
            # the estimator degenerates to the true weight
            F.when(F.col("got") <= n, F.col("w")).otherwise(
                F.greatest(F.col("w"), F.col("tau"))
            ),
        )
        .drop("__rn", "got", "tau", "inv_priority")
    )


def priority_sample_sql(
    table: str,
    n: int,
    weight_sql: str = "n_chars",
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source",
) -> str:
    """DuckDB mirror of priority_sample (same draw, same IEEE
    division, same threshold estimator)."""
    u_int = hash_uniform_expr(id_col, "duckdb")
    key = f"CAST({u_int} + 1 AS DOUBLE) / CAST({weight_sql} AS DOUBLE)"
    return f"""
    WITH scored AS (
      SELECT {cols}, CAST({weight_sql} AS DOUBLE) AS w,
             {key} AS inv_priority
      FROM {table} WHERE {weight_sql} > 0
      ORDER BY inv_priority, {id_col} LIMIT {n + 1}
    ),
    th AS (
      SELECT CAST({_U_DENOM} AS DOUBLE) / MAX(inv_priority) AS tau,
             COUNT(*) AS got
      FROM scored
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY inv_priority, {id_col}) AS rn
      FROM scored
    )
    SELECT {cols}, w,
      CASE WHEN th.got <= {n} THEN w ELSE greatest(w, th.tau) END AS est_weight
    FROM ranked, th WHERE rn <= {n}
    """
