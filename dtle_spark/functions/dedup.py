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

TOKEN_PATTERN = "[a-z0-9]+"

# MinHash parameters: 24 lanes in 12 bands of 2 rows -> P(catch) at
# jaccard .5 = 1-(1-.25)^12 ≈ .97, at .8 ≈ 1-(1-.64)^12 ≈ 1.0
NUM_HASHES = 24
BANDS = 12
ROWS_PER_BAND = 2
SHINGLE_N = 2


def _toks(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"


def shingles_expr(text_col: str, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles as an array<string> column."""
    t = _toks(text_col)
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size({t}) - {n} + 1, 1)),"
        f" i -> concat_ws(' ', slice({t}, i, {n}))))"
    )


def minhash_signature(shingle_col: str = "sh", num_hashes: int = NUM_HASHES) -> Column:
    """MinHash signature: lane i keeps min(md5('i:' || shingle)).

    Min over fixed-length hex strings == min over the 128-bit values,
    so the signature is a plain array<string> and stays portable.
    """
    lanes = [
        F.expr(f"array_min(transform({shingle_col}, s -> md5(concat('{i}:', s))))")
        for i in range(num_hashes)
    ]
    return F.array(*lanes)


def lsh_bands(sig_col: str = "sig", bands: int = BANDS, rows: int = ROWS_PER_BAND) -> Column:
    """Band digests: band b = md5(concat of its `rows` lanes)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.expr(
                    f"md5(concat_ws('|', slice({sig_col}, {b * rows + 1}, {rows})))"
                ).alias("band_digest"),
            )
            for b in range(bands)
        ]
    )


def minhash_buckets(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, band_idx, band_digest, sh) — the LSH bucket assignment."""
    return (
        docs.select(id_col, shingles_expr(text_col).alias("sh"))
        .withColumn("sig", minhash_signature("sh"))
        .select(id_col, "sh", F.explode(lsh_bands("sig")).alias("band"))
        .select(id_col, "sh", "band.band_idx", "band.band_digest")
    )


def jaccard_expr(a: str, b: str) -> Column:
    inter = f"size(array_intersect({a}, {b}))"
    return F.expr(
        f"CAST({inter} AS DOUBLE) / (size({a}) + size({b}) - {inter})"
    )


def minhash_dedup_pairs(
    docs: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard.

    Returns (id_1, id_2, jaccard) with id_1 < id_2, jaccard >= threshold.
    At production scale add a bucket-size cap before the self-join
    (hot boilerplate buckets produce O(k^2) candidates).
    """
    b = minhash_buckets(docs, id_col, text_col)
    left = b.select(
        F.col(id_col).alias("id_1"), F.col("sh").alias("sh_1"), "band_idx", "band_digest"
    )
    right = b.select(
        F.col(id_col).alias("id_2"), F.col("sh").alias("sh_2"), "band_idx", "band_digest"
    )
    cand = (
        left.join(right, ["band_idx", "band_digest"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "sh_1", "sh_2")
        .dropDuplicates(["id_1", "id_2"])
    )
    return (
        cand.withColumn("jaccard", jaccard_expr("sh_1", "sh_2"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def simhash16_expr(text_col: str) -> Column:
    """16-bit SimHash over token frequency, pure integer expressions.

    Token hash = first 4 hex chars of md5 parsed positionally (instr
    into the hex alphabet — portable; no engine-specific hex-to-int).
    Bit b of the signature is set when more tokens have bit b set than
    clear (sum of +-1 > 0 <=> 2*count_set > n_tokens).
    """
    t = _toks(text_col)
    hexpos = "instr('0123456789abcdef', substr(md5(x), {p}, 1)) - 1"
    h = (
        f"(({hexpos.format(p=1)}) * 4096 + ({hexpos.format(p=2)}) * 256"
        f" + ({hexpos.format(p=3)}) * 16 + ({hexpos.format(p=4)}))"
    )
    bits = []
    for b in range(16):
        cnt = f"size(filter({t}, x -> ({h} DIV {1 << b}) % 2 = 1))"
        bits.append(f"(CASE WHEN 2 * {cnt} > size({t}) THEN {1 << b} ELSE 0 END)")
    return F.expr(" + ".join(bits)).cast("long")


def simhash_signatures(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(id_col, simhash16_expr(text_col).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, id_col: str, text_col: str, max_distance: int = 3
) -> DataFrame:
    """Hamming-near pairs via bucketing on the signature's two bytes:
    a pair within distance d<=7 must agree exactly on at least one byte
    half (pigeonhole) -> join on each half, then exact bit_count filter.
    Avoids the O(n^2) cross join the naive form needs."""
    s = simhash_signatures(docs, id_col, text_col)
    halves = s.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("h"), (F.col("simhash") % 256).alias("v")),
                F.struct(F.lit(1).alias("h"), F.expr("simhash DIV 256").alias("v")),
            )
        ).alias("half"),
    ).select(id_col, "simhash", "half.h", "half.v")
    a = halves.select(F.col(id_col).alias("id_1"), F.col("simhash").alias("sh_1"), "h", "v")
    b2 = halves.select(F.col(id_col).alias("id_2"), F.col("simhash").alias("sh_2"), "h", "v")
    return (
        a.join(b2, ["h", "v"])
        .filter(F.col("id_1") < F.col("id_2"))
        .dropDuplicates(["id_1", "id_2"])
        .withColumn(
            "distance",
            F.expr("bit_count(sh_1 ^ sh_2)"),
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_1", "id_2", "distance")
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
    t = docs.select(
        F.col(id_col), F.col(block_col).alias("block"), shingles_expr(text_col, n).alias("sh")
    )
    a = t.select(F.col(id_col).alias("id_1"), "block", F.col("sh").alias("sh_1"))
    b = t.select(F.col(id_col).alias("id_2"), "block", F.col("sh").alias("sh_2"))
    return (
        a.join(b, "block")
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn("jaccard", jaccard_expr("sh_1", "sh_2"))
        .filter(F.col("jaccard") >= threshold)
        .select("block", "id_1", "id_2", "jaccard")
    )
