"""Similarity search over embedding columns (array<float>).

Two paths, both pure Column expressions (portable + oracle-checkable):

- brute-force cosine top-k: the exactness baseline. O(|Q| * N) — fine
  for bounded query sets; the per-pair work is a fold over the dims.
- sign-LSH bucketed top-k: the scale path. Vectors bucket by the sign
  pattern of their leading dims (a fixed random-hyperplane LSH with
  axis-aligned planes); queries probe only their own bucket, so the
  join is equi on the bucket key — shuffle-partitionable at 100 TB.
  Production extension: multi-probe (flip one bit) and a trained IVF
  centroid table instead of sign planes; the plan shape is identical.

Determinism: element products are CAST(float AS DOUBLE) then folded
sequentially (aggregate in Spark == list_reduce over a prepended 0.0
in DuckDB) — identical IEEE operation order, bit-identical cosines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



def dot_expr(a: str, b: str) -> str:
    """Sequential-fold dot product of two float-array columns (SQL text).

    zip_with (pairwise walk) instead of sequence+element_at (per-index
    random access): measured 3.3x faster, and the product list is
    bit-identical — the DuckDB oracles keep their generate_series form
    because only the VALUES and fold ORDER must match, not the
    construction."""
    prods = f"zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
    return f"aggregate({prods}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"


def cosine_expr(a: str, b: str) -> Column:
    return F.expr(
        f"({dot_expr(a, b)}) / (sqrt({dot_expr(a, a)}) * sqrt({dot_expr(b, b)}))"
    )


def norm_expr(a: str) -> Column:
    """sqrt of the self-dot fold — precompute ONCE per row so pair
    scoring does 1 fold instead of 3. `norm(a) * norm(b)` multiplies the
    exact doubles `sqrt(dot(a,a)) * sqrt(dot(b,b))` cosine_expr would
    produce, so cosines stay bit-identical to the per-pair form (and to
    the DuckDB oracles, which keep their inline per-pair restatement)."""
    return F.expr(f"sqrt({dot_expr(a, a)})")


def cosine_with_norms(a: str, b: str, a_norm: str, b_norm: str) -> Column:
    """Pair cosine from a single dot fold plus precomputed row norms."""
    return F.expr(f"({dot_expr(a, b)}) / ({a_norm} * {b_norm})")


def sign_bucket_expr(vec_col: str, planes: int = 8) -> Column:
    """Sign-pattern bucket key over the leading `planes` dims."""
    bits = [
        f"(CASE WHEN CAST(element_at({vec_col}, {k}) AS DOUBLE) >= 0 THEN '1' ELSE '0' END)"
        for k in range(1, planes + 1)
    ]
    return F.expr("concat(" + ", ".join(bits) + ")")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine).

    The query side is broadcast (bounded query sets); the corpus streams
    through one stage — no corpus-wide shuffle at any scale.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(vec_col).alias("q_norm"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        norm_expr(vec_col).alias("n_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_with_norms("q_vec", "n_vec", "q_norm", "n_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k probing only the query's sign-LSH bucket."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(vec_col).alias("q_norm"),
        sign_bucket_expr(vec_col, planes).alias("bucket"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        norm_expr(vec_col).alias("n_norm"),
        sign_bucket_expr(vec_col, planes).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_with_norms("q_vec", "n_vec", "q_norm", "n_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "rank", "cosine")
    )


def lsh_multiprobe_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Multi-probe sign-LSH top-k: each query probes its own bucket AND
    every bucket at hamming distance 1 (one sign flipped) — the
    standard recall fix for LSH's hard bucket boundaries (Lv et al.
    2007). Cost grows by (planes+1)x on the QUERY side only; the plan
    stays an equi-join against the one-bucket-per-vector corpus, and a
    corpus vector can match a query through exactly one probe, so no
    dedup pass is needed."""
    probes_expr = (
        "explode(array(bucket, "
        + ", ".join(
            f"concat(substring(bucket, 1, {i - 1}),"
            f" CASE WHEN substring(bucket, {i}, 1) = '1' THEN '0' ELSE '1' END,"
            f" substring(bucket, {i + 1}, {planes - i}))"
            for i in range(1, planes + 1)
        )
        + "))"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(vec_col).alias("q_norm"),
        sign_bucket_expr(vec_col, planes).alias("bucket"),
    ).select(
        "query_id", "q_vec", "q_norm", F.expr(probes_expr).alias("bucket")
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        norm_expr(vec_col).alias("n_norm"),
        sign_bucket_expr(vec_col, planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_with_norms("q_vec", "n_vec", "q_norm", "n_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def train_centroids(
    vectors: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroid_stride: int = 25,
) -> DataFrame:
    """Spherical k-means refinement of the sampled centroid init:
    Lloyd iterations as plain DataFrame aggregations — assign each
    vector to its best cell (same argmax fold ivf_topk uses), then the
    new centroid is the per-cell mean, renormalized (spherical variant:
    direction is what cosine search cares about).

    Returns (cent_id, c_vec) with cent_id relabeled 0..k'-1 (cells that
    lose every member drop out — standard k-means shrinkage).

    NOT oracle-gated by design: the mean step averages doubles, whose
    value depends on aggregation order — fine for a trainer (any
    near-mean works), fatal for a hash-compared gate. The SEARCH path
    stays deterministic given whatever centroid table it receives.
    Scale: each iteration is one map-only assignment + one groupBy of
    |corpus| rows into k cells; for 100 TB train on a sample (k-means
    only needs a representative subset)."""
    cent = vectors.filter(F.col(id_col) % centroid_stride == 1).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("c_vec")
    )
    v = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    for _ in range(iters):
        cent_n = cent.withColumn("c_norm", F.expr(f"sqrt({dot_expr('c_vec', 'c_vec')})"))
        cents_arr = cent_n.agg(
            F.expr("sort_array(collect_list(struct(cent_id, c_vec, c_norm)))").alias("cents")
        )
        score = f"({dot_expr('vec', 'c.c_vec')}) / c.c_norm"
        assigned = v.crossJoin(F.broadcast(cents_arr)).withColumn(
            "cell",
            F.expr(f"array_max(transform(cents, c -> struct({score} AS cos, c.cent_id AS cell))).cell"),
        )
        mean = assigned.groupBy("cell").agg(
            F.array(*[F.avg(F.col("vec")[i]) for i in range(dim)]).alias("m")
        )
        # renormalize the mean direction (spherical k-means step)
        cent = mean.select(
            F.col("cell").alias("cent_id"),
            F.expr(f"transform(m, x -> CAST(x / sqrt({dot_expr('m', 'm')}) AS FLOAT))").alias("c_vec"),
        ).localCheckpoint()
    w = Window.orderBy("cent_id")
    return cent.withColumn("cent_id", F.row_number().over(w) - 1)


def ivf_exact_mean_centroids(
    vectors: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Deterministic "trained" centroid table: ONE Lloyd step from the
    fixed partition ``cell = id % k``, with component sums kept in
    scaled integers (round(x*1e6) as BIGINT) so the mean is
    order-free-exact — the oracle-gatable sibling of
    :func:`train_centroids` (whose double-mean is order-dependent and
    therefore deliberately not gated). Division and the downstream
    sqrt/dot are single IEEE ops on identical inputs, so both engines
    produce bit-identical centroids.

    Scale: one groupBy of N rows into k cells with 64 integer sums —
    partial-aggregable, one shuffle of k*65 longs."""
    cells = vectors.select(
        (F.col(id_col) % k).alias("cent_id"), F.col(vec_col).alias("v")
    )
    sums = [
        F.sum(F.round(F.col("v")[i].cast("double") * 1000000).cast("long")).alias(f"s{i}")
        for i in range(dim)
    ]
    m = cells.groupBy("cent_id").agg(*sums, F.count(F.lit(1)).alias("n"))
    c_vec = F.array(
        *[(F.col(f"s{i}").cast("double") / 1000000.0 / F.col("n")) for i in range(dim)]
    )
    return m.select("cent_id", c_vec.alias("c_vec"))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    centroid_stride: int = 25,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: a coarse centroid table partitions
    the corpus into cells; queries probe only their `nprobe` nearest
    cells. The FAISS IVF plan re-expressed as DataFrame ops.

    Centroids here are a deterministic corpus sample (id % stride) —
    the cheap-init stand-in for a k-means train step; the search plan
    is identical either way (oracle determinism forbids the mean step:
    averaging doubles is order-dependent across engines).

    Scale shape — the whole search is shuffle-free over the corpus:
    - the centroid table folds into ONE array row, broadcast; cell
      assignment is `array_max(transform(...))` per corpus row — a
      map-only stage, no per-centroid row explosion, no window.
    - query probing runs on the bounded query set (windowed top-nprobe
      over |Q| x |C| rows — tiny).
    - probes broadcast into the assigned corpus: equi-join on cell,
      map-only again. Only the final per-query top-k windows a small
      intermediate (|Q| x avg cell size).
    Struct-max ties (duplicate vectors) break to the highest cell id —
    verified identical in Spark `array_max` and DuckDB `list_max`.

    Pass `centroids` (cent_id, c_vec) to search against a trained
    table (train_centroids) instead of the sampled default — the plan
    is identical either way.
    """
    if centroids is not None:
        cent = centroids.select("cent_id", "c_vec")
    else:
        cent = vectors.filter(F.col(id_col) % centroid_stride == 1).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("c_vec")
        )
    # centroid norms precompute ONCE into the broadcast array — the
    # assignment fold then does one dot + one divide per centroid
    # instead of re-deriving |centroid| per (row, centroid) pair
    cent_n = cent.withColumn("c_norm", F.expr(f"sqrt({dot_expr('c_vec', 'c_vec')})"))
    cents_arr = cent_n.agg(
        F.expr("sort_array(collect_list(struct(cent_id, c_vec, c_norm)))").alias("cents")
    )
    def _best(vec: str) -> str:
        # argmax over centroids: the row's own norm is a constant
        # factor, so score = dot / |centroid| picks the same cell as
        # full cosine with one fewer fold per centroid
        score = f"({dot_expr(vec, 'c.c_vec')}) / c.c_norm"
        return (
            f"array_max(transform(cents, c -> struct({score} AS cos, c.cent_id AS cell))).cell"
        )

    assigned = (
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
        .crossJoin(F.broadcast(cents_arr))
        .withColumn("cell", F.expr(_best("vec")))
        .select(
            "neighbor_id",
            F.col("vec").alias("n_vec"),
            norm_expr("vec").alias("n_norm"),
            "cell",
        )
        # materialize the assignment: this table IS the IVF index (in
        # production it is built once and persisted; FAISS's add()
        # phase). Without the barrier, the probe equi-join's inferred
        # isnotnull(cell) constraint pushes the whole argmax fold into
        # the upstream join condition and evaluates it a second time
        # per corpus row (observed: 2x assignment cost in the plan).
        .localCheckpoint(eager=False)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(vec_col).alias("q_norm"),
    )
    qscored = q.crossJoin(F.broadcast(cent)).withColumn(
        "c_cos", cosine_expr("q_vec", "c_vec")
    )
    qw = Window.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("cent_id"))
    probes = (
        qscored.withColumn("__r", F.row_number().over(qw))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "q_vec", "q_norm", F.col("cent_id").alias("cell"))
    )
    hits = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_with_norms("q_vec", "n_vec", "q_norm", "n_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "neighbor_id", "rank", "cosine")
    )


def truncate_normalize(
    vectors: DataFrame,
    dim_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style truncation: keep the leading ``dim_out`` dims
    and renormalize to unit length — the cheap search tier for
    MRL-trained embeddings (truncated prefixes remain semantically
    aligned; for non-MRL embeddings this trades recall for a
    dims/dim_out cost cut, gated in pytest). Map-only; the division is
    one IEEE op per component over the fold-built norm, so downstream
    cosine search stays oracle-exact."""
    sliced = vectors.select(
        F.col(id_col),
        F.expr(f"slice({vec_col}, 1, {dim_out})").alias("__t"),
    )
    return sliced.select(
        F.col(id_col),
        F.expr(
            f"CASE WHEN {dot_expr('__t', '__t')} = 0 THEN __t"
            f" ELSE transform(__t, x -> CAST(CAST(x AS DOUBLE)"
            f" / sqrt({dot_expr('__t', '__t')}) AS FLOAT)) END"
        ).alias(vec_col),
    )


def int_dot_expr(a: str, b: str) -> str:
    """Integer dot product of two int-array columns — exact, order-free
    (no IEEE concerns at all): products <= 127^2, 64-dim sums < 2^21."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * y),"
        f" 0L, (acc, v) -> acc + v)"
    )


def quantize_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale = max |x|,
    q_i = floor(x_i / scale * 127 + 0.5) in [-127, 127]. floor(v + 0.5)
    instead of round() so BOTH engines share one exactly-defined tie
    rule (round()'s half-tie mode is engine-configurable; floor is not).

    Returns (id, qvec array<int>, qnorm double). 4 bytes/dim here (16
    at fp64 scoring) — at 100 TB the quantized corpus is the resident
    working set and the fp32 originals stay on cold storage; search
    cost per pair drops to an integer fold + one division."""
    scaled = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.expr(f"array_max(transform({vec_col}, x -> abs(CAST(x AS DOUBLE))))").alias(
            "scale"
        ),
    )
    qvec = (
        "CASE WHEN scale = 0 THEN transform(vec, x -> 0)"
        " ELSE transform(vec, x ->"
        " CAST(floor(CAST(x AS DOUBLE) / scale * 127 + 0.5) AS INT)) END"
    )
    # materialize qvec at a select boundary so the norm fold reads the
    # column instead of re-evaluating the quantization expression
    return scaled.select("id", F.expr(qvec).alias("qvec")).select(
        "id",
        "qvec",
        F.expr(f"sqrt(CAST({int_dot_expr('qvec', 'qvec')} AS DOUBLE))").alias("qnorm"),
    )


def quantized_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exhaustive top-k over the int8-quantized corpus: the same
    broadcast-queries / stream-corpus plan as brute_force_topk, but the
    pair score is an integer fold divided by precomputed quantized
    norms — the int8 rerank-free search tier (SQ8 in FAISS terms)."""
    qz = quantize_int8(vectors, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id")).join(
        qz.withColumnRenamed("id", "query_id"), "query_id"
    ).select("query_id", F.col("qvec").alias("qv"), F.col("qnorm").alias("qqn"))
    c = qz.select(
        F.col("id").alias("neighbor_id"),
        F.col("qvec").alias("cv"),
        F.col("qnorm").alias("cqn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "qcos",
            F.expr(f"CAST({int_dot_expr('qv', 'cv')} AS DOUBLE) / (qqn * cqn)"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qcos")
    )


def neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    planes: int = 8,
    max_bucket: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within sign-LSH buckets:
    the vector-space member of the dedup family (brief: 'embedding-
    cosine near-dup'). Only bucket-mates are compared — the same
    candidate-generation economics as MinHash-LSH for text.

    Scale knobs (the simhash single-window lesson applies here too —
    2^planes is the TOTAL bucket count, so too few planes makes the
    self-join quadratic in N): set planes ≈ log2(N / target_bucket),
    and the `max_bucket` cap drops degenerate buckets (a zero vector
    region, an all-positive quadrant) before the join, bounding the
    worst task at max_bucket²/2 pairs exactly as the MinHash hot-bucket
    cap does. The count windows over the same key the join shuffles on
    (one exchange, AQE-reused)."""
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm_expr(vec_col).alias("norm"),
        sign_bucket_expr(vec_col, planes).alias("bucket"),
    )
    bw = Window.partitionBy("bucket")
    v = (
        v.withColumn("__bn", F.count(F.lit(1)).over(bw))
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )
    a = v.select(
        F.col("id").alias("id_1"), F.col("vec").alias("v1"),
        F.col("norm").alias("norm_1"), "bucket",
    )
    b = v.select(
        F.col("id").alias("id_2"), F.col("vec").alias("v2"),
        F.col("norm").alias("norm_2"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn("cosine", cosine_with_norms("v1", "v2", "norm_1", "norm_2"))
        .filter(F.col("cosine") >= threshold)
        .select("bucket", "id_1", "id_2", "cosine")
    )
