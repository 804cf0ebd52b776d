"""Deduplication operators for the training-data pipeline surface:
exact, MinHash+LSH, SimHash, n-gram Jaccard.

Engine-portability: all hashing is md5-based (identical hex in Spark
and DuckDB) so every stage — signatures, bands, candidate pairs,
verified pairs — is oracle-checkable. All stages are pure Column
expressions (no UDFs): tokenize -> shingle -> 24 md5-min lanes ->
band digests -> bucket self-join -> exact-Jaccard verify.

Scale design (the point of LSH): the only shuffle over the corpus is
the explode+self-join on (band_idx, band_digest) — 100 TB of documents
becomes ~BANDS rows of (16-byte digest, doc_id) each, and candidate
generation touches only bucket-mates. Exact Jaccard runs on candidate
pairs alone. Degenerate buckets (boilerplate text) should be capped
(count per bucket, drop > cap) before the join at production scale —
noted inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dtle_spark.util import spread

TOKEN_PATTERN = "[a-z0-9]+"

# MinHash parameters: 24 lanes in 12 bands of 2 rows -> P(catch) at
# jaccard .5 = 1-(1-.25)^12 ≈ .97, at .8 ≈ 1-(1-.64)^12 ≈ 1.0
NUM_HASHES = 24
BANDS = 12
ROWS_PER_BAND = 2
# 3-gram shingles: same recall on true near-dups as 2-grams on these
# fixtures, but the background jaccard of unrelated docs drops ~26x
# (0.027 -> 0.001), which collapses LSH false-positive candidates from
# ~1% of all pairs to ~zero — the candidate set stays O(true pairs)
SHINGLE_N = 3

# Two-base-hash lane construction (one md5 per shingle instead of one
# per lane — 24x fewer digests): base hashes x, y are the md5's first
# two 40-bit hex windows; lane i = (A[i]*x + B[i]*y) mod 2^40. The mod
# wrap is what de-monotonizes the lanes (without it every lane would
# share one argmin). Constants from a fixed LCG — odd, < 2^13, so the
# products stay within int64 in both engines.
_LANE_MOD = 1 << 40


def _lane_constants(n: int = NUM_HASHES) -> list[tuple[int, int]]:
    state, out = 42, []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = ((state >> 33) % (1 << 12)) * 2 + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = ((state >> 33) % (1 << 12)) * 2 + 1
        out.append((a, b))
    return out


LANE_CONSTANTS = _lane_constants()


def hex_window_sql(operand: str, start: int, dialect: str, width: int = 10) -> str:
    """Portable hex->int parse of a digest window, one native call per
    engine (Spark ``conv(..., 16, 10)``, DuckDB ``'0x...'::BIGINT``) —
    verified to agree bit-for-bit."""
    if dialect == "spark":
        return f"CAST(conv(substr({operand}, {start}, {width}), 16, 10) AS BIGINT)"
    if dialect == "duckdb":
        return f"CAST('0x' || substr({operand}, {start}, {width}) AS BIGINT)"
    raise ValueError(dialect)


def _toks(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"


def shingles_expr(text_col: str, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles as an array<string> column."""
    t = _toks(text_col)
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size({t}) - {n} + 1, 1)),"
        f" i -> concat_ws(' ', slice({t}, i, {n}))))"
    )


def base_hash_columns(
    df: DataFrame, shingle_col: str = "sh", hash_fn: str = "md5"
) -> DataFrame:
    """Two 40-bit base-hash int arrays (hx, hy) per shingle array.

    hash_fn="md5" (default): one md5 per shingle, hx/hy are its first
    two 40-bit hex windows — identical hex in DuckDB, so every
    downstream stage stays oracle-checkable. The digest array is
    materialized first so each md5 runs once.

    hash_fn="xxhash64": the PRODUCTION lane — xxHash64 is a JVM
    intrinsic an order of magnitude cheaper than md5 (no hex
    round-trip either); hx/hy are two independently-seeded hashes
    masked to the same 40-bit domain, so every downstream consumer
    (signature fold, band digests, jaccard verify) is unchanged.
    Not oracle-gated (DuckDB's hash() is a different function);
    equivalence to the md5 lane is pinned by
    tests/test_custom_ops.py::test_minhash_hash_fn_lanes_agree."""
    if hash_fn == "md5":
        return (
            df.withColumn("__mh", F.expr(f"transform({shingle_col}, s -> md5(s))"))
            .withColumn("hx", F.expr(f"transform(__mh, m -> {hex_window_sql('m', 1, 'spark')})"))
            .withColumn("hy", F.expr(f"transform(__mh, m -> {hex_window_sql('m', 11, 'spark')})"))
            .drop("__mh")
        )
    if hash_fn == "xxhash64":
        mask = _LANE_MOD - 1
        return df.withColumn(
            "hx", F.expr(f"transform({shingle_col}, s -> xxhash64(s) & {mask})")
        ).withColumn(
            "hy", F.expr(f"transform({shingle_col}, s -> xxhash64(s, 1) & {mask})")
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r} (md5 | xxhash64)")


def minhash_signature(hx_col: str = "hx", hy_col: str = "hy") -> Column:
    """INTERPRETED REFERENCE implementation of the MinHash signature —
    kept only to pin bit-identity of the production ``minhash_sigs``
    rewrite (tests/test_custom_ops.py). Not on any query path.

    MinHash signature from the base-hash arrays: lane i keeps
    min((A[i]*x + B[i]*y) mod 2^40), serialized as decimal strings so
    band digests concat portably. ONE aggregate fold over the shingle
    hashes accumulating all 24 lane minima at once. Retired from the
    hot paths in r14: ``aggregate``/``zip_with`` lambdas run on Spark's
    interpreted expression-eval path, whose shared call sites go
    megamorphic in a long-lived JVM (~100+ distinct queries) and make
    the SAME plan run 3-5x slower — the r11 text_rp_embedding disease,
    re-diagnosed on the simhash family in the r13 bench adjudication."""
    consts = ", ".join(
        f"struct({a}L AS a, {b}L AS b)" for a, b in LANE_CONSTANTS
    )
    n = len(LANE_CONSTANTS)
    return F.expr(
        f"transform("
        f" aggregate("
        f"  zip_with({hx_col}, {hy_col}, (x, y) -> struct(x AS x, y AS y)),"
        f"  array_repeat(CAST({_LANE_MOD} AS BIGINT), {n}),"
        f"  (acc, e) -> zip_with(acc, array({consts}),"
        f"   (m, c) -> least(m, (c.a * e.x + c.b * e.y) % {_LANE_MOD}))),"
        f" v -> CAST(v AS STRING))"
    )


def minhash_sigs(
    df: DataFrame,
    key_cols: list[str],
    hx_col: str = "hx",
    hy_col: str = "hy",
) -> DataFrame:
    """(key_cols..., sig): the PRODUCTION MinHash signature — explode
    the zipped base hashes and fold the 24 lane minima in a codegen'd
    hash aggregate (24 ``min`` columns), instead of the per-row
    ``aggregate(zip_with(...))`` lambda fold.

    Why (r13 bench adjudication, same root cause r11 bisected for
    text_rp_embedding): higher-order-function lambdas evaluate on
    Spark's INTERPRETED expression path; after ~100+ distinct codegen'd
    queries in one JVM the shared eval call sites go megamorphic and
    the fold form runs a consistent 3-5x slower than fresh. The
    explode + groupBy form stays inside whole-stage codegen's hash
    aggregate and is immune. Scale cost: the explode is partition-local
    and map-side partial aggregation folds each doc's shingles to ONE
    25-column row before the exchange, so the shuffle carries one
    narrow row per doc per partition — smaller than the sig itself
    moves in every downstream band explode.

    Bit-identical to ``minhash_signature`` (pinned by
    tests/test_custom_ops.py::test_minhash_sigs_matches_reference):
    min is order-free, empty shingle arrays keep the 2^40 lane init
    via explode_outer's NULL row + coalesce, products stay < 2^54, and
    a NULL hash array yields a NULL sig (the interpreted fold's
    ``aggregate(NULL, ...)`` semantics — NOT the all-init sig, which
    would put every NULL-array doc in the same band bucket and hand
    pair generation a quadratic clique; ADVICE r14). ``key_cols`` must
    uniquely identify rows (doc ids do)."""
    # arrays_zip, not zip_with: same pair array, but arrays_zip is a
    # regular codegen'd expression while zip_with is a lambda HOF on
    # the interpreted path — the class this function exists to retire.
    # The struct is flattened to top-level (x, y) columns BEFORE the
    # aggregate so the 24 lane expressions read two long slots instead
    # of each re-extracting struct fields per row (measured ~25% off
    # the aggregate stage at 50k docs x 115 shingles).
    pairs = df.select(
        *key_cols,
        (F.col(hx_col).isNull() | F.col(hy_col).isNull())
        .cast("int").alias("__nul"),
        F.explode_outer(
            F.arrays_zip(F.col(hx_col).alias("x"), F.col(hy_col).alias("y"))
        ).alias("__e"),
    ).select(
        *key_cols, "__nul",
        F.col("__e.x").alias("__x"), F.col("__e.y").alias("__y"),
    )
    aggs = [F.max("__nul").alias("__nul")] + [
        F.coalesce(
            F.min(F.expr(f"({a}L * __x + {b}L * __y) % {_LANE_MOD}")),
            F.lit(_LANE_MOD).cast("bigint"),
        ).alias(f"__l{i}")
        for i, (a, b) in enumerate(LANE_CONSTANTS)
    ]
    sig = F.array(*[
        F.col(f"__l{i}").cast("string")
        for i in range(len(LANE_CONSTANTS))
    ])
    # re-spread: AQE coalesces the doc-grain aggregate to few
    # partitions, and every consumer does CPU-heavy per-row work
    # (band digests) — same rationale as rp_text_embedding's
    return spread(
        pairs.groupBy(*key_cols).agg(*aggs)
        .select(
            *key_cols,
            F.when(F.col("__nul") == 0, sig).alias("sig"),
        )
    )


def shingle_hash_rows(
    df: DataFrame,
    key_cols: list[str],
    text_col: str | None = None,
    tok_col: str | None = None,
    hash_fn: str = "md5",
    n: int = SHINGLE_N,
) -> DataFrame:
    """(keys..., __x, __y): per-SHINGLE base hashes as exploded ROWS —
    the CODEGEN lane for every consumer that does not need the per-doc
    hash ARRAYS (r16, VERDICT task 3; the rp_text_embedding / r14
    minhash_sigs precedent).

    Why rows instead of the base_hash_columns arrays: the array form
    rides three ``transform()`` lambdas (shingle build, md5, hex
    window), and HOF lambdas evaluate on Spark's INTERPRETED
    expression path — in a long-lived JVM (~100+ codegen'd queries)
    the shared eval call sites go megamorphic and the same map stage
    runs 3-5x slower (the r11/r13 diagnosis). Here the shingle index
    is EXPLODED (Generate participates in whole-stage codegen) and the
    shingle/md5/conv work runs per ROW as ordinary codegen'd
    expressions. Still map-only: no shuffle is added — the signature
    aggregation downstream was already the first exchange.

    Duplicate shingles are NOT deduplicated (the array lane applies
    ``array_distinct``): the only consumer of this form is the MinHash
    lane-minimum fold, and min() is insensitive to duplicates —
    consumers that need true set semantics (jaccard verify) must use
    the array lane (hx_from_tokens). Degenerate docs match the array
    lane exactly: the shingle count is ``greatest(size - n + 1, 1)``,
    so an empty or NULL token array yields one '' shingle — the same
    single element ``shingles_expr`` produces."""
    if tok_col is None:
        df = df.select(*key_cols, F.expr(_toks(text_col)).alias("__t"))
    else:
        df = df.select(*key_cols, F.col(tok_col).alias("__t"))
    rows = df.select(
        *key_cols,
        "__t",
        F.explode(
            F.expr(f"sequence(1, greatest(size(__t) - {n} + 1, 1))")
        ).alias("__i"),
    ).select(
        *key_cols,
        F.expr(f"concat_ws(' ', slice(__t, __i, {n}))").alias("__s"),
    )
    if hash_fn == "md5":
        return rows.select(*key_cols, F.md5("__s").alias("__m")).select(
            *key_cols,
            F.expr(hex_window_sql("__m", 1, "spark")).alias("__x"),
            F.expr(hex_window_sql("__m", 11, "spark")).alias("__y"),
        )
    if hash_fn == "xxhash64":
        mask = _LANE_MOD - 1
        return rows.select(
            *key_cols,
            F.expr(f"xxhash64(__s) & {mask}").alias("__x"),
            F.expr(f"xxhash64(__s, 1) & {mask}").alias("__y"),
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r} (md5 | xxhash64)")


def minhash_sigs_from_rows(rows: DataFrame, key_cols: list[str]) -> DataFrame:
    """(key_cols..., sig) from exploded (keys..., __x, __y) shingle-hash
    rows — the same 24-lane codegen min fold as ``minhash_sigs``, minus
    the NULL-array machinery (a shingle_hash_rows feed always emits
    >= 1 non-NULL row per doc, so no doc is lost and no sig is NULL).
    Bit-identical to minhash_sigs(doc_hash_sets(...)) — pinned by
    tests/test_custom_ops.py::test_minhash_sigs_from_rows_matches."""
    aggs = [
        F.coalesce(
            F.min(F.expr(f"({a}L * __x + {b}L * __y) % {_LANE_MOD}")),
            F.lit(_LANE_MOD).cast("bigint"),
        ).alias(f"__l{i}")
        for i, (a, b) in enumerate(LANE_CONSTANTS)
    ]
    sig = F.array(*[
        F.col(f"__l{i}").cast("string")
        for i in range(len(LANE_CONSTANTS))
    ])
    # re-spread for the same reason minhash_sigs does: every consumer
    # (band digests) is CPU-heavy per-row work on an AQE-coalesced agg
    return spread(
        rows.groupBy(*key_cols).agg(*aggs).select(*key_cols, sig.alias("sig"))
    )


def _shingles_sql(tok_col: str, n: int = SHINGLE_N) -> str:
    """``shingles_expr`` minus the tokenize, as a SQL fragment —
    distinct word n-gram shingles from a pre-tokenized array column
    (same expressions, so bit-identical downstream hashes)."""
    return (
        f"array_distinct(transform(sequence(1, greatest(size({tok_col}) - {n} + 1, 1)),"
        f" i -> concat_ws(' ', slice({tok_col}, i, {n}))))"
    )


def hx_from_tokens(tok_col: str, hash_fn: str = "md5", n: int = SHINGLE_N) -> Column:
    """Per-doc DISTINCT hashed-shingle set (the with_jaccard operand)
    from a pre-tokenized array column — the array lane kept for the
    verify tier, where set sizes matter. Interpreted-HOF cost is
    bounded by the caller: apply this to CANDIDATE docs only (the
    scale-correct shape — candidates << corpus at 100 TB)."""
    sh = _shingles_sql(tok_col, n)
    if hash_fn == "md5":
        return F.expr(
            f"transform(transform({sh}, s -> md5(s)),"
            f" m -> {hex_window_sql('m', 1, 'spark')})"
        )
    if hash_fn == "xxhash64":
        mask = _LANE_MOD - 1
        return F.expr(f"transform({sh}, s -> xxhash64(s) & {mask})")
    raise ValueError(f"unknown hash_fn {hash_fn!r} (md5 | xxhash64)")


def lsh_bands(
    sig_col: str = "sig",
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
    hash_fn: str = "md5",
) -> Column:
    """Band digests: band b = digest(concat of its `rows` lanes) —
    md5 hex for the oracle-parity lane, xxhash64 (as a decimal string,
    8 bytes vs 16 on the wire) for the production lane."""
    digest = (
        "md5(concat_ws('|', slice({s}, {off}, {rows})))"
        if hash_fn == "md5"
        else "CAST(xxhash64(concat_ws('|', slice({s}, {off}, {rows}))) AS STRING)"
    )
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.expr(
                    digest.format(s=sig_col, off=b * rows + 1, rows=rows)
                ).alias("band_digest"),
            )
            for b in range(bands)
        ]
    )


def doc_hash_sets(
    docs: DataFrame, id_col: str, text_col: str, hash_fn: str = "md5"
) -> DataFrame:
    """(id, hx, hy): per-doc 40-bit hashed shingle arrays. Downstream
    set operations (jaccard verify) run on the int arrays, never on the
    shingle strings — integer compares and a ~10x lighter shuffle
    footprint; the 115^2/2^40 within-pair collision odds are noise and
    identical in both engines."""
    return base_hash_columns(
        spread(docs).select(id_col, shingles_expr(text_col).alias("sh")),
        hash_fn=hash_fn,
    ).drop("sh")


def minhash_buckets(
    docs: DataFrame, id_col: str, text_col: str, hash_fn: str = "md5"
) -> DataFrame:
    """(id, band_idx, band_digest) — the LSH bucket assignment. Carries
    only the 16-byte digest + id through the explode/shuffle.

    r16: rides the exploded codegen shingle-hash lane end to end — no
    interpreted array lambdas, no per-doc hash arrays built. Sigs from
    this lane are never NULL (every doc, even NULL text, emits the ''
    shingle row — same as shingles_expr's [''] — so the r14 NULL-sig
    banding hazard is unreachable by construction, not by filter)."""
    return (
        minhash_sigs_from_rows(
            shingle_hash_rows(spread(docs), [id_col], text_col=text_col, hash_fn=hash_fn),
            [id_col],
        )
        .select(id_col, F.explode(lsh_bands("sig", hash_fn=hash_fn)).alias("band"))
        .select(id_col, "band.band_idx", "band.band_digest")
    )


def with_jaccard(pairs: DataFrame, a: str = "hs_1", b: str = "hs_2") -> DataFrame:
    """Jaccard over hashed shingle sets; the intersection size is
    materialized once (it appears in numerator and denominator)."""
    return pairs.withColumn(
        "__inter", F.expr(f"size(array_intersect({a}, {b}))")
    ).withColumn(
        "jaccard",
        F.expr(f"CAST(__inter AS DOUBLE) / (size({a}) + size({b}) - __inter)"),
    ).drop("__inter")


MAX_BUCKET = 64


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard
    over the hashed shingle sets.

    Returns (id_1, id_2, jaccard) with id_1 < id_2, jaccard >= threshold.

    Skew guard: buckets larger than `max_bucket` are dropped before the
    self-join — a hot boilerplate bucket of k docs would otherwise emit
    O(k^2) candidate pairs (one stuck straggler task at corpus scale).
    Recall is preserved for genuinely near-dup CLUSTERS by the other
    BANDS-1 bands (a cluster hot in one band is hot in all its bands
    only when the docs are full duplicates — catch those upstream with
    exact dedup). The count runs as a window over the same key the join
    shuffles on, so AQE reuses one exchange.
    """
    # ONE materialization of the token arrays — the bucket branch and
    # the verify branch both read it. r16 (VERDICT task 3): the pin
    # moved from the hashed ARRAYS (base_hash_columns — three
    # interpreted transform() lambdas over the whole corpus) to the
    # raw token arrays; the signature path re-derives per-shingle
    # hashes through the exploded CODEGEN lane (min is duplicate-
    # insensitive, so no per-doc arrays are needed there), and the
    # hash-SET arrays for the jaccard verify are built once from the
    # pinned tokens (one interpreted transform pass instead of three).
    # A candidate-only rebuild (semi-join on the candidate ids before
    # the transform — even better at 100 TB where candidates <<
    # corpus) was measured and declined: its extra stages (cand pin,
    # id-union distinct, semi join) cost ~0.6 s against a ~0.25 s
    # transform at bench scale (OPTIMIZATION_r16.md).
    toks = (
        spread(docs)
        .select(F.col(id_col), F.expr(_toks(text_col)).alias("__t"))
        .localCheckpoint()
    )
    b = (
        minhash_sigs_from_rows(
            shingle_hash_rows(toks, [id_col], tok_col="__t", hash_fn=hash_fn),
            [id_col],
        )
        .select(id_col, F.explode(lsh_bands("sig", hash_fn=hash_fn)).alias("band"))
        .select(id_col, "band.band_idx", "band.band_digest")
    )
    bw = Window.partitionBy("band_idx", "band_digest")
    b = (
        b.withColumn("__bn", F.count(F.lit(1)).over(bw))
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )
    cand = (
        b.select(F.col(id_col).alias("id_1"), "band_idx", "band_digest")
        .join(
            b.select(F.col(id_col).alias("id_2"), "band_idx", "band_digest"),
            ["band_idx", "band_digest"],
        )
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .dropDuplicates(["id_1", "id_2"])
    )
    sets = (
        toks.select(id_col, hx_from_tokens("__t", hash_fn=hash_fn).alias("hs"))
        # both verify joins read this; without the pin the hash-set
        # transform runs once per side
        .localCheckpoint(eager=False)
    )
    verified = (
        cand.join(sets.select(F.col(id_col).alias("id_1"), F.col("hs").alias("hs_1")), "id_1")
        .join(sets.select(F.col(id_col).alias("id_2"), F.col("hs").alias("hs_2")), "id_2")
    )
    return (
        with_jaccard(verified)
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def incremental_neardup_filter(
    history: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """The daily-ingest operator: drop each INCOMING doc that exactly or
    nearly duplicates the HISTORICAL corpus, return the survivors (with
    incoming's original columns). Exact tier = fingerprint membership;
    near tier = LSH band-digest lookup against the history index,
    verified by hashed-shingle jaccard >= threshold. Unlike the batch
    pair finder, incoming-vs-incoming pairs are NOT compared — that is
    the point (run the batch dedup within the increment separately if
    wanted).

    Scale shape: the history side is an INDEX — in production its band
    digests and hash sets are precomputed once and stored (16-byte
    digest rows), so a daily increment touches |increment| * bands
    index lookups (equi-join on the digest), never re-fingerprinting
    the 100 TB history. The verify join reads only candidate hash sets
    by id."""
    tagged = (
        history.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("txt"), F.lit(0).alias("side")
        )
        .unionByName(
            incoming.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("txt"), F.lit(1).alias("side")
            )
        )
    )
    # r16 (VERDICT task 3): the pin holds (id, side, fp, tokens) — ONE
    # scan, same bytes-per-doc class as the old hashed-array pin — the
    # signature tier re-derives per-shingle hashes through the exploded
    # CODEGEN lane (no interpreted lambdas), and the hash-SET arrays
    # for the jaccard verify are built once from the pinned tokens
    # (one interpreted transform pass instead of three; the
    # candidate-only rebuild was measured and declined — see
    # minhash_dedup_pairs).
    base = tagged.select(
        "id",
        "side",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("txt")), "\\s+", " "))
        ).alias("fp"),
        F.expr(_toks("txt")).alias("__t"),
    ).localCheckpoint()
    buckets = (
        minhash_sigs_from_rows(
            shingle_hash_rows(base, ["id", "side"], tok_col="__t"), ["id", "side"]
        )
        .select("id", "side", F.explode(lsh_bands("sig")).alias("band"))
        .select("id", "side", "band.band_idx", "band.band_digest")
        # both side-branches read this: without the barrier the
        # signature fold + band digests run twice (once per branch)
        .localCheckpoint(eager=False)
    )
    hist_b = buckets.filter(F.col("side") == 0).select(
        F.col("id").alias("hist_id"), "band_idx", "band_digest"
    )
    inc_b = buckets.filter(F.col("side") == 1).select(
        F.col("id").alias("inc_id"), "band_idx", "band_digest"
    )
    cand = (
        inc_b.join(hist_b, ["band_idx", "band_digest"])
        .select("inc_id", "hist_id")
        .dropDuplicates(["inc_id", "hist_id"])
    )
    sets = base.select(
        "id", hx_from_tokens("__t").alias("hs")
    ).localCheckpoint(eager=False)  # read by both verify joins (see minhash_dedup_pairs)
    near_dup = (
        cand.join(sets.select(F.col("id").alias("inc_id"), F.col("hs").alias("hs_1")), "inc_id")
        .join(sets.select(F.col("id").alias("hist_id"), F.col("hs").alias("hs_2")), "hist_id")
    )
    near_dup = (
        with_jaccard(near_dup)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("inc_id").alias("id"))
        .distinct()
    )
    hist_fp = base.filter(F.col("side") == 0).select("fp").distinct()
    exact_dup = (
        base.filter(F.col("side") == 1)
        .join(hist_fp, "fp", "left_semi")
        .select("id")
    )
    dropped = near_dup.unionByName(exact_dup).distinct()
    return incoming.join(
        dropped, incoming[id_col] == dropped["id"], "left_anti"
    )


SIMHASH_BITS = 60  # 15 md5 hex chars parse into a signed BIGINT safely
SIMHASH_CHUNKS = 6  # 6 x 10-bit chunks: pigeonhole-exact for distance <= 5


def simhash_bits_expr(hash_col: str = "th", bits: int = SIMHASH_BITS) -> Column:
    """INTERPRETED REFERENCE implementation of the SimHash signature —
    kept only to pin bit-identity of the production
    ``simhash_signatures`` rewrite (tests/test_custom_ops.py). Not on
    any query path: the ``aggregate``/``transform`` lambdas evaluate
    interpreted, and the r13 bench adjudication traced the
    dedup_simhash(_pairs) position-dependent 2-4x slowdowns to exactly
    this construct going megamorphic in a long-lived JVM (the r11
    text_rp_embedding disease).

    SimHash bits from a pre-computed token-hash int array: bit b is
    set when more tokens have bit b set than clear (sum of +-1 > 0
    <=> 2*count_set > n_tokens). ONE ``aggregate`` pass over the array
    accumulating a ``bits``-slot count vector (index lambda picks the
    bit per slot), then a fold of the counts into the signature."""
    one = "CAST(1 AS BIGINT)"
    return F.expr(
        f"""aggregate(
          {hash_col},
          array_repeat(0, {bits}),
          (acc, h) -> transform(acc, (c, i) ->
              c + CAST((h DIV shiftleft({one}, i)) % 2 AS INT)),
          acc -> aggregate(
              transform(acc, (c, i) ->
                  IF(2 * c > size({hash_col}), shiftleft({one}, i), 0 * {one})),
              0 * {one}, (s, x) -> s + x)
        )"""
    ).cast("long")


def simhash_signatures(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash over token frequency, pure integer expressions.
    60 not 64: the hex window (first 15 md5 hex chars, positional
    parse — portable, one digest per token) must parse into a SIGNED
    64-bit int in both engines, so the top nibble is left clear.

    Shape (r14, the r11 rp_text_embedding precedent applied here after
    the r13 bench adjudication): explode the doc's token hashes and
    accumulate the 60 per-bit set-counts + token count in a codegen'd
    hash aggregate, then threshold (2*count_set > n_tokens) and fold
    the bits in one flat 60-term sum. The previous per-row
    ``aggregate(transform(...))`` fold (kept as ``simhash_bits_expr``
    for the equivalence pin) evaluates its lambdas on the interpreted
    expression path, which goes megamorphic after ~100+ distinct
    queries in one JVM — the same plan then runs a consistent 2-4x
    slower (dedup_simhash's r13 'regression' verdicts). This form
    stays inside WholeStageCodegen; its one exchange carries a single
    62-column partial row per doc per partition (map-side combine), far
    lighter than the text scan feeding it. Bit-identical: counts are
    order-free, an empty token list keeps simhash=0 via explode_outer's
    NULL row + coalesce(sum, 0) with n_tokens=count(hh)=0, and a NULL
    text (NULL token array) yields a NULL simhash — the interpreted
    fold's ``aggregate(NULL, ...)`` semantics, NOT 0, which would merge
    every NULL-text doc into the all-zero signature's buckets and hand
    pair generation a quadratic clique (ADVICE r14)."""
    h = hex_window_sql("md5(x)", 1, "spark", width=15)
    # text IS NULL <=> _toks(text) IS NULL (regexp_extract_all over
    # lower(NULL) null-propagates) — checked on the raw column so the
    # regex isn't evaluated a second time just for the flag
    tok = spread(docs).select(
        id_col,
        F.expr(f"CAST({text_col} IS NULL AS INT)").alias("__nul"),
        F.explode_outer(F.expr(_toks(text_col))).alias("x"),
    ).select(id_col, "__nul", F.expr(h).alias("hh"))
    one = "CAST(1 AS BIGINT)"
    aggs = [F.max("__nul").alias("__nul"), F.count("hh").alias("__n")] + [
        F.coalesce(
            F.sum(F.expr(f"CAST((hh DIV shiftleft({one}, {i})) % 2 AS INT)")),
            F.lit(0),
        ).alias(f"__b{i}")
        for i in range(SIMHASH_BITS)
    ]
    bits = " + ".join(
        f"IF(2 * __b{i} > __n, shiftleft({one}, {i}), 0 * {one})"
        for i in range(SIMHASH_BITS)
    )
    return spread(
        tok.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col,
            F.when(
                F.col("__nul") == 0, F.expr(f"CAST({bits} AS BIGINT)")
            ).alias("simhash"),
        )
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
    chunks: int = SIMHASH_CHUNKS,
) -> DataFrame:
    """Hamming-near pairs via multi-window bucketing (Manku/Jain/
    Sarma, "Detecting Near-Duplicates for Web Crawling"): split the
    60-bit signature into `chunks` equal windows; a pair within
    distance d has its differing bits in at most d windows, so it
    agrees EXACTLY on some (chunks - d)-window COMBINATION — bucket on
    every combination (C(chunks, chunks-d) join passes), then exact
    bit_count filter. Exact (no misses) for the given max_distance.

    Why combinations and not single windows: a single 10-bit window has
    only 1024 distinct values, so at corpus scale every bucket holds
    N/1024 docs and the self-join is quadratic (measured: 60 s at 50k
    docs vs 12.6 s on 30-bit window-triples, identical output — and the
    gap itself grows quadratically in N). The triple key's 2^30 space
    keeps buckets at true-collision size; the remaining cost is genuine
    duplicate cliques, which ARE the answer."""
    if max_distance > chunks - 1:
        raise ValueError(f"max_distance {max_distance} needs >= {max_distance + 1} chunks")
    width = SIMHASH_BITS // chunks
    # materialize the narrow (id, simhash) table once: the window
    # structs reference `simhash` per chunk and the self-join reads it
    # from BOTH sides — without a barrier, project-collapse inlines the
    # md5 token hashing + 60-bit fold into every reference (measured
    # ~2x on the pairs query). At production scale this is the standard
    # persisted-signatures table of any LSH pipeline.
    # NULL simhash (NULL text) never enters bucketing: its window keys
    # would all be NULL (no equi-join match, dead rows through every
    # pass) — and the doc has no content to be near-duplicate of
    s = (
        simhash_signatures(docs, id_col, text_col)
        .filter(F.col("simhash").isNotNull())
        .localCheckpoint(eager=False)
    )
    from itertools import combinations

    keep = chunks - max_distance
    combos = list(combinations(range(chunks), keep))
    windows = F.array(
        *[
            F.struct(
                F.lit(ci).alias("h"),
                F.expr(
                    " + ".join(
                        f"((simhash DIV {1 << (width * w)}) % {1 << width})"
                        f" * {1 << (width * pos)}"
                        for pos, w in enumerate(combo)
                    )
                ).alias("v"),
            )
            for ci, combo in enumerate(combos)
        ]
    )
    halves = s.select(id_col, "simhash", F.explode(windows).alias("w")).select(
        id_col, "simhash", "w.h", "w.v"
    )
    a = halves.select(F.col(id_col).alias("id_1"), F.col("simhash").alias("sh_1"), "h", "v")
    b2 = halves.select(F.col(id_col).alias("id_2"), F.col("simhash").alias("sh_2"), "h", "v")
    return (
        a.join(b2, ["h", "v"])
        .filter(F.col("id_1") < F.col("id_2"))
        # distance filter + signature-column drop BEFORE the pair-dedup
        # exchange (r16, guide §2.3): the dedup shuffle then carries
        # only surviving (id_1, id_2, distance) rows instead of every
        # bucket collision with both 8-byte signatures attached.
        # Output-identical: distance is a function of the pair, so
        # filter-then-dedup == dedup-then-filter.
        .withColumn(
            "distance",
            F.expr("bit_count(sh_1 ^ sh_2)"),
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_1", "id_2", "distance")
        .dropDuplicates(["id_1", "id_2"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.3,
    n: int = SHINGLE_N,
) -> DataFrame:
    """Exact blocked n-gram Jaccard: all pairs within a block column
    (e.g. source/partition key). The exact counterpart to MinHash —
    quadratic per block, so blocks must be bounded; LSH is the
    unblocked scale path."""
    t = spread(docs).select(
        F.col(id_col),
        F.col(block_col).alias("block"),
        shingles_expr(text_col, n).alias("sh"),
    )
    # materialized once: both join sides read the hashed sets, and
    # without a barrier the md5 shingling runs twice. (The unused hy
    # lane is already pruned by projection collapse — verified r16 —
    # so only the hx transforms evaluate here.)
    t = (
        base_hash_columns(t)
        .select(id_col, "block", F.col("hx").alias("hs"))
        .localCheckpoint(eager=False)
    )
    # few distinct blocks = few join partitions -> salt the left side by
    # id and replicate the right across salts: same pair set, SALTS x
    # the parallelism (the classic skew/low-cardinality join fix)
    salts = 16
    a = t.select(
        F.col(id_col).alias("id_1"),
        "block",
        F.col("hs").alias("hs_1"),
        (F.col(id_col) % salts).alias("salt"),
    )
    b = t.select(
        F.col(id_col).alias("id_2"),
        "block",
        F.col("hs").alias("hs_2"),
        F.explode(F.expr(f"sequence(0, {salts - 1})")).alias("salt"),
    )
    pairs = a.join(b, ["block", "salt"]).filter(F.col("id_1") < F.col("id_2"))
    return (
        with_jaccard(pairs)
        .filter(F.col("jaccard") >= threshold)
        .select("block", "id_1", "id_2", "jaccard")
    )


WINNOW_WINDOW = 4


def winnowing_fingerprints(
    docs: DataFrame, id_col: str, text_col: str, window: int = WINNOW_WINDOW
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    MOSS scheme): rolling k-gram hashes, keep the minimum of every
    `window` consecutive hashes, distinct per doc -> (id, fp) rows.
    Guarantees any shared substring of length >= k + window - 1 shares
    a fingerprint; the sampled set is ~2/(window+1) of all hashes —
    sublinear storage for corpus-scale overlap detection.

    Rolling hash = the shingle base hash (md5 40-bit window) — the same
    portable construction the MinHash lanes use; ordering (not just
    set membership) is preserved by winnowing over hash POSITIONS.
    """
    # materialize the hash array: `hx` is referenced inside the
    # per-window lambda, and without a barrier project-collapse inlines
    # the md5 shingle hashing into every element evaluation
    base = base_hash_columns(
        spread(docs).select(id_col, shingles_ordered_expr(text_col).alias("sh"))
    ).select(id_col, "hx").localCheckpoint(eager=False)
    fps = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(hx) - {window} + 1, 1)),"
        f" j -> array_min(slice(hx, j, {window}))))"
    )
    return base.select(id_col, F.explode(fps).alias("fp"))


def shingles_ordered_expr(text_col: str, n: int = SHINGLE_N) -> Column:
    """Positional (non-distinct) n-gram shingles — winnowing needs the
    rolling ORDER, unlike the set-semantics shingles_expr."""
    t = _toks(text_col)
    return F.expr(
        f"transform(sequence(1, greatest(size({t}) - {n} + 1, 1)),"
        f" i -> concat_ws(' ', slice({t}, i, {n})))"
    )


SPAN_WINDOW = 8


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SPAN_WINDOW,
) -> DataFrame:
    """Per-doc duplicated-span fraction: the substring-level dedup
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (ExactSubstr). Every exact k-token window is
    fingerprinted (md5); a window is *duplicated* if its fingerprint
    occurs more than once anywhere in the corpus (another doc OR a
    repeat inside the same doc). Returns
    (id, n_windows, n_dup, dup_frac) per doc — the per-doc score a
    pipeline thresholds on, where the reference suffix-array approach
    would emit byte ranges.

    Scale shape: windows are positional (no distinct), one md5 each;
    the corpus-sized shuffles are keyed on the 16-byte fingerprint
    (count-over-window) and then the doc id (re-aggregate) — never a
    pair join, never quadratic. Docs shorter than k tokens have zero
    windows and dup_frac 0.0.
    """
    # Two load-bearing boundaries:
    # 1. tokenize at its own select (the word_ngrams pitfall);
    # 2. md5 AFTER the explode, not inside the window array — Spark's
    #    Generate collapse re-evaluates the generator's array expr per
    #    OUTPUT row, turning an md5-inside-transform explode into
    #    O(windows^2) per doc (measured 8.7s -> 0.7s at sf0.1).
    toked = spread(docs).select(
        F.col(id_col).alias("id"), F.expr(_toks(text_col)).alias("toks")
    )
    wins = F.expr(
        f"CASE WHEN size(toks) < {k} THEN array() ELSE"
        f" transform(sequence(1, size(toks) - {k} + 1),"
        f" i -> concat_ws(' ', slice(toks, i, {k}))) END"
    )
    ex = toked.select("id", F.explode(wins).alias("s")).select(
        "id", F.md5("s").alias("fp")
    )
    # corpus occurrence count per fingerprint, then per-doc rollup
    cnt = ex.withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("fp")))
    per_doc = cnt.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).alias("n_dup"),
    )
    stats = docs.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")
    return stats.select(
        "id",
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup"),
        F.expr(
            "CASE WHEN coalesce(n_windows, 0) = 0 THEN CAST(0.0 AS DOUBLE)"
            " ELSE CAST(n_dup AS DOUBLE) / n_windows END"
        ).alias("dup_frac"),
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.5,
    n: int = SHINGLE_N,
) -> DataFrame:
    """Exact blocked n-gram CONTAINMENT: |A ∩ B| / min(|A|, |B|) for
    all pairs within a block. Containment catches what Jaccard misses —
    a short doc quoted wholesale inside a long one scores near 1.0
    containment but low Jaccard (the union is dominated by the long
    doc). The asymmetric-duplication screen of a training pipeline.

    Same block+salt join skeleton (and therefore the same scale
    economics) as ngram_jaccard_pairs: quadratic only within bounded
    blocks, LSH being the unblocked sibling.
    """
    t = spread(docs).select(
        F.col(id_col),
        F.col(block_col).alias("block"),
        shingles_expr(text_col, n).alias("sh"),
    )
    # materialized once: both join sides read the hashed sets
    t = (
        base_hash_columns(t)
        .select(id_col, "block", F.col("hx").alias("hs"))
        .localCheckpoint(eager=False)
    )
    salts = 16
    a = t.select(
        F.col(id_col).alias("id_1"),
        "block",
        F.col("hs").alias("hs_1"),
        (F.col(id_col) % salts).alias("salt"),
    )
    b = t.select(
        F.col(id_col).alias("id_2"),
        "block",
        F.col("hs").alias("hs_2"),
        F.explode(F.expr(f"sequence(0, {salts - 1})")).alias("salt"),
    )
    pairs = a.join(b, ["block", "salt"]).filter(F.col("id_1") < F.col("id_2"))
    scored = pairs.withColumn(
        "containment",
        F.expr(
            "CAST(size(array_intersect(hs_1, hs_2)) AS DOUBLE)"
            " / least(size(hs_1), size(hs_2))"
        ),
    )
    return scored.filter(F.col("containment") >= threshold).select(
        "block", "id_1", "id_2", "containment"
    )


def remove_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SPAN_WINDOW,
) -> DataFrame:
    """The ExactSubstr dedup TRANSFORM (duplicated_span_stats is the
    signal): drop every token covered by a corpus-duplicated k-token
    window and reassemble the survivors in order. Matches the Lee et
    al. policy of removing repeated substrings wherever they occur
    (each occurrence is covered, so repeated boilerplate vanishes from
    every doc). Returns (id, n_tokens, n_kept, clean_text).

    Scale shape: window fingerprints shuffle as (16-byte fp, id, pos);
    the occurrence count is a window over fp; covered positions explode
    x k (bounded small multiplier); reassembly is one groupBy(id) with
    an ordered in-memory array sort per doc — docs, not the corpus,
    bound the sort. No pair join anywhere.
    """
    t = _toks(text_col)
    base = spread(docs).select(
        F.col(id_col).alias("id"), F.expr(t).alias("toks")
    ).localCheckpoint(eager=False)
    # md5 AFTER the explode (same Generate-collapse trap as
    # duplicated_span_stats: an md5 inside the exploded array is
    # re-evaluated per output row)
    wins = base.select(
        "id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) < {k} THEN array() ELSE"
                f" transform(sequence(1, size(toks) - {k} + 1),"
                f" i -> concat_ws(' ', slice(toks, i, {k}))) END"
            )
        ).alias("p0", "s"),
    ).select("id", (F.col("p0") + 1).alias("pos"), F.md5("s").alias("fp"))
    dup = wins.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).filter(F.col("cnt") >= 2)
    covered = dup.select(
        "id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("p")
    ).distinct()
    toks = base.select(
        "id", F.posexplode("toks").alias("p0", "tok")
    ).select("id", (F.col("p0") + 1).alias("p"), "tok")
    kept = toks.join(covered, ["id", "p"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "concat_ws(' ', transform(array_sort(collect_list(struct(p, tok))),"
            " s -> s.tok))"
        ).alias("clean_text"),
    )
    return (
        base.select("id", F.size("toks").cast("long").alias("n_tokens"))
        .join(rebuilt, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def rp_text_embedding(
    docs: DataFrame, id_col: str, text_col: str, dims: int = SIMHASH_BITS,
    toks: DataFrame | None = None,
) -> DataFrame:
    """Deterministic random-projection text embedding: dimension b is
    the sum of +-1 signs (bit b of each token's md5) over the doc's
    tokens — exactly the SimHash accumulator WITHOUT the sign
    threshold, so the full magnitude survives and cosine over these
    vectors is a model-free semantic-overlap measure (feature hashing
    a la Weinberger et al.; E[cos] tracks weighted token overlap).
    Bridges the text corpus into every vector operator (ANN tiers,
    embedding near-dup, semantic dedup) with zero model dependency.

    Integer-exact and engine-portable (same md5-bit formula as the
    SimHash oracle), hence registry-gatable.

    Shape note (r11 root-cause): this was first written as a map-only
    nested higher-order fold (aggregate over transform lambdas).
    HOF lambdas run on Spark's INTERPRETED expression-eval path, and
    in a long-lived JVM that has executed ~100+ distinct codegen'd
    queries the shared eval call sites go megamorphic — the same query
    then runs a CONSISTENT 3-5x slower than in a fresh session
    (bisected in r11: no GC, no code-cache pressure, not one culprit
    query — purely cumulative class count; the r8 rp_embed_neighbors
    and r10 text_rp_embedding bench 'regressions' were this). The
    explode + groupBy form below stays inside whole-stage codegen's
    hash aggregate, is immune to that pollution (measured 0.85 s
    steady in a 118-query session vs 1.6 s for the fold form), and at
    100 TB its one extra shuffle carries a single 61-long partial row
    per doc per partition — far smaller than the text it replaces."""
    h = hex_window_sql("md5(x)", 1, "spark", width=15)
    if toks is None:
        tok = spread(docs).select(
            id_col, F.explode_outer(F.expr(_toks(text_col))).alias("x")
        )
    else:
        # pre-tokenized (id_col, toks) frame from the caller (r16):
        # hybrid retrieval tokenizes the corpus once and shares the
        # pinned arrays between the lexical and vector stages
        tok = toks.select(id_col, F.explode_outer("toks").alias("x"))
    tok = tok.select(id_col, F.expr(h).alias("hh"))
    one = "CAST(1 AS BIGINT)"
    aggs = [F.count("hh").alias("n_tokens")] + [
        F.coalesce(
            F.sum(F.expr(f"CAST((hh DIV shiftleft({one}, {i})) % 2 AS INT)")),
            F.lit(0),
        ).alias(f"b{i}")
        for i in range(dims)
    ]
    emb = F.array(
        *[F.expr(f"CAST(2 * b{i} - n_tokens AS BIGINT)") for i in range(dims)]
    )
    out = (
        tok.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col,
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            emb.alias("emb"),
        )
    )
    # AQE coalesces the doc-grain aggregate to a few small partitions;
    # every consumer of these vectors does CPU-heavy per-row work
    # (cosine scoring, PQ encode), so re-spread — the shuffle moves
    # 61 longs per doc, the serialization it prevents cost 4x the
    # whole query (r11: rp_embed_neighbors 0.9 s -> 3.6 s without it)
    return spread(out)


# --- persisted dedup index (the production incremental-ingest path) ---

INDEX_COLS = ("__fp", "__hx", "__bands")


def with_dedup_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach the dedup INDEX columns to document rows: exact
    fingerprint (__fp), hashed shingle set (__hx), and LSH band digests
    (__bands, nested — exploded only at probe time). Stored WITH the
    corpus rows, history is fingerprinted ONCE at ingest; every later
    increment probes these columns instead of re-hashing 100 TB of
    text (the economics incremental_neardup_filter's docstring
    promises — this is the materialization of that index).

    Key contract (ADVICE r14): ``id_col`` must be NON-NULL and UNIQUE.
    The band digests are computed on the narrow (id, hx, hy) side and
    attached via an id equi-join, so a NULL id would silently drop the
    row from the index and duplicate ids would merge their hash arrays
    in the signature groupBy then fan back out. NULL ids raise at
    execution (per-row guard, free); uniqueness is the caller's
    contract — every production caller (corpus_ingest, the registry
    queries) keys on content-hashed or source-PK doc ids, which exact
    dedup has already collapsed. The join is LEFT so a row can never
    vanish even if a future sig definition yields NULLs."""
    from dtle_spark.functions.textstats import doc_fingerprint

    docs = docs.withColumn(
        id_col,
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(f"with_dedup_index: NULL {id_col} — index rows "
                      "must carry a non-null unique id")),
        ).otherwise(F.col(id_col)),
    )
    base = base_hash_columns(
        docs.withColumn("__sh", shingles_expr(text_col)), "__sh"
    ).drop("__sh")
    # signature on the NARROW side (id + hash arrays) via the codegen
    # explode+min-aggregate, then ONE equi-join attaches the band
    # digests back to the full rows. The join costs one shuffle of the
    # corpus at build time (a one-time, linear lake-write cost); what
    # it buys is keeping the signature fold out of the interpreted
    # HOF path on the 100 TB build, where the megamorphic 3-5x tax
    # would land on every row of history.
    bands = minhash_sigs(base.select(id_col, "hx", "hy"), [id_col]).select(
        id_col,
        F.when(F.col("sig").isNotNull(), lsh_bands("sig")).alias("__bands"),
    )
    return (
        base.withColumn("__fp", doc_fingerprint(F.col(text_col)))
        .withColumnRenamed("hx", "__hx")
        .drop("hy")
        .join(bands, id_col, "left")
    )


def probe_index(
    index: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Dropped-id table: which INCOMING docs exactly or nearly
    duplicate the indexed history. Both sides must carry INDEX_COLS
    (with_dedup_index). Exact tier = fingerprint semi-join; near tier =
    band-digest equi-join verified by hashed-shingle jaccard. No text
    is read and nothing is re-hashed — index lookups only.

    ``max_bucket`` is the production skew guard (same rationale as
    minhash_dedup_pairs MAX_BUCKET): a boilerplate band digest shared
    by k history docs multiplies every incoming hit by k — cap drops
    those buckets (full duplicates still die in the exact tier).
    Default None keeps the probe EXACTLY equivalent to the re-hashing
    operator (the pinned pytest contract); set ~64 at corpus scale."""
    inc = incoming.select(
        F.col(id_col).alias("id"), "__fp", "__hx", "__bands"
    ).localCheckpoint(eager=False)
    hist_fp = index.select("__fp").distinct()
    exact = inc.join(hist_fp, "__fp", "left_semi").select("id")
    # narrow band join: ids only — the hashed-shingle arrays (hundreds
    # of ints per doc) must not ride the band shuffle multiplied by
    # BANDS (same restructure as probe_index_self / minhash_dedup_pairs:
    # verify arrays join back AFTER candidate dedup)
    inc_b = inc.select("id", F.explode("__bands").alias("b")).select(
        "id", "b.band_idx", "b.band_digest"
    )
    hist_b = index.select(
        F.col(id_col).alias("hist_id"), F.explode("__bands").alias("b")
    ).select("hist_id", "b.band_idx", "b.band_digest")
    if max_bucket is not None:
        bw = Window.partitionBy("band_idx", "band_digest")
        hist_b = (
            hist_b.withColumn("__bn", F.count(F.lit(1)).over(bw))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    cand = (
        inc_b.join(hist_b, ["band_idx", "band_digest"])
        .select("id", "hist_id")
        .dropDuplicates(["id", "hist_id"])
    )
    verified = cand.join(
        inc.select("id", F.col("__hx").alias("hx_i")), "id"
    ).join(
        index.select(
            F.col(id_col).alias("hist_id"), F.col("__hx").alias("hx_h")
        ),
        "hist_id",
    )
    near = (
        with_jaccard(verified, "hx_i", "hx_h")
        .filter(F.col("jaccard") >= threshold)
        .select("id")
        .distinct()
    )
    return exact.unionByName(near).distinct()


def probe_index_self(
    indexed: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Within-set near-dup drops over already-indexed rows: ids that
    nearly duplicate a SMALLER-id row of the same set (greedy keep-min
    per pair). The streaming-ingest sibling of :func:`probe_index` —
    same index columns, same band-join + hashed-shingle-jaccard verify,
    no text re-read. Exact dups are assumed already collapsed (the
    fingerprint keep-min tier runs first).

    Semantics note (documented gap, ADVICE r4): per-PAIR keep-min is
    slightly more aggressive than one-doc-at-a-time sequential ingest
    on transitive chains (A~B, B~C, A!~C: sequential keeps {A, C},
    this drops both B and C because each pairs with a smaller id). The
    bias is toward dropping near-dups, never admitting them — the safe
    direction for a dedup gate — and makes batch-size a knob that only
    affects chain shapes, not whether duplicates survive."""
    # materialize the (id, hx, bands) projection once: the band
    # self-join's two sides AND the verify join all read it — without
    # a barrier the shingle/minhash pipeline runs three times
    # (measured: 22.6 s -> 5.9 s on 5k docs with the narrow join below)
    idx = indexed.select(
        F.col(id_col).alias("id"), F.col("__hx").alias("hx"), "__bands"
    ).localCheckpoint(eager=False)
    # narrow band join: ids only — the hx arrays (hundreds of ints per
    # doc) must NOT ride through the band shuffle multiplied by BANDS
    b = idx.select("id", F.explode("__bands").alias("bb")).select(
        "id", "bb.band_idx", "bb.band_digest"
    )
    if max_bucket is not None:
        bw = Window.partitionBy("band_idx", "band_digest")
        b = (
            b.withColumn("__bn", F.count(F.lit(1)).over(bw))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    cand = (
        b.select(F.col("id").alias("id_lo"), "band_idx", "band_digest")
        .join(
            b.select(F.col("id").alias("id_hi"), "band_idx", "band_digest"),
            ["band_idx", "band_digest"],
        )
        .filter(F.col("id_lo") < F.col("id_hi"))
        .select("id_lo", "id_hi")
        .dropDuplicates(["id_lo", "id_hi"])
    )
    sets = idx.select("id", "hx")
    verified = cand.join(
        sets.select(F.col("id").alias("id_lo"), F.col("hx").alias("hx_lo")), "id_lo"
    ).join(
        sets.select(F.col("id").alias("id_hi"), F.col("hx").alias("hx_hi")), "id_hi"
    )
    return (
        with_jaccard(verified, "hx_lo", "hx_hi")
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_hi").alias("id"))
        .distinct()
    )
