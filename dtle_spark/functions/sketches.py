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

    NULL values draw no hash (md5(NULL) = NULL) and are filtered
    BEFORE the k-minima fold — otherwise Spark's ascending orderBy
    (NULLS FIRST) would burn a minima slot on the NULL while DuckDB
    (NULLS LAST) would not, skewing the estimate and diverging the
    engines. KMV estimates DISTINCT NON-NULL, like COUNT(DISTINCT).
    """
    # Dedup the SOURCE VALUES before hashing (r15): md5 is a function,
    # so DISTINCT(md5(v)) == md5(DISTINCT v) as a set — but the second
    # form runs one md5 per distinct value instead of one per row
    # (30x fewer on a fact-table key), and the pre-hash distinct
    # shuffles the narrow source value instead of computing the
    # hex-window conv chain row-wise first. The hv-level distinct
    # stays: it is what formally pins set-equality with the oracle's
    # DISTINCT-after-hash, and over already-unique values it is a
    # cheap bounded pass.
    # ADVICE r15 / r16: the "narrow source value" rationale inverts
    # for WIDE keys (long strings / binary can out-weigh the 8-byte
    # hash on the distinct shuffle), so the pre-hash distinct is gated
    # on the key's resolved type: fixed-width scalars keep it,
    # variable-width keys keep the hash-first shape. Set-equal either
    # way (same hv set feeds the k-minima fold).
    from pyspark.sql import types as T

    dtype = df.selectExpr(f"{col_sql} AS __v").schema[0].dataType
    fixed_width = isinstance(
        dtype, (T.NumericType, T.DateType, T.TimestampType,
                T.TimestampNTZType, T.BooleanType)
    )
    if fixed_width:
        h = F.expr(hash40_expr("__v", "spark"))
        hv = (
            df.selectExpr(f"{col_sql} AS __v")
            .distinct()
            .select(h.alias("hv"))
        )
    else:
        hv = df.select(F.expr(hash40_expr(col_sql, "spark")).alias("hv"))
    kth = (
        hv.filter(F.col("hv").isNotNull())
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
    (sketch once per ingest batch, union later, never re-scan).
    NULLs draw no hash and are excluded, as in kmv_distinct."""
    h = F.expr(hash40_expr(col_sql, "spark"))
    return (
        df.select(h.alias("hv"))
        .filter(F.col("hv").isNotNull())
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
    estimate arithmetic; same NULL-draw exclusion)."""
    h = hash40_expr(col_sql, "duckdb")
    return f"""
    WITH h AS (SELECT DISTINCT hv FROM
               (SELECT {h} AS hv FROM {table}) WHERE hv IS NOT NULL),
    kk AS (SELECT MAX(hv) AS kth_min, COUNT(*) AS got_k
           FROM (SELECT hv FROM h ORDER BY hv LIMIT {k}))
    SELECT {k} AS k, got_k, kth_min,
      CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)
      ELSE CAST({(k - 1) * _U_DENOM} AS DOUBLE) / kth_min END AS kmv_estimate
    FROM kk
    """


def kmv_distinct_grouped(
    df: DataFrame, group_sql: str, col_sql: str, k: int = 256
) -> DataFrame:
    """Per-group distinct-count sketch (grp, k, got_k, kth_min,
    kmv_estimate) — the per-source dashboard shape (distinct users per
    day, distinct keys per table) at sketch cost. Same estimator and
    NULL-draw exclusion as the global lane, keyed by a group
    expression.

    Scale shape: the (grp, hv) distinct partial-aggregates per
    partition before one shuffle on the group key; the k-minima fold
    is a row_number window over DISTINCT HASHES per group — the window
    input is |distinct keys| rows of (grp, 8-byte hash), never source
    data, and the output is bounded at k per group."""
    from pyspark.sql import Window

    # NOTE (r15): the global lane's pre-hash distinct is NOT applied
    # here — the grouped inputs are small per group and the extra
    # distinct stage measured as a net loss (the oracle-exact shape
    # needs hash-then-distinct as the final dedup either way, so the
    # pre-distinct adds a second shuffle that only pays off when the
    # row:distinct ratio is fact-table-sized)
    h = F.expr(hash40_expr(col_sql, "spark"))
    w = Window.partitionBy("grp").orderBy("hv")
    kth = (
        df.select(F.expr(group_sql).alias("grp"), h.alias("hv"))
        .filter(F.col("hv").isNotNull())
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("grp")
        .agg(F.max("hv").alias("kth_min"), F.count(F.lit(1)).alias("got_k"))
    )
    est = (
        f"CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)"
        f" ELSE CAST({(k - 1) * _U_DENOM} AS DOUBLE) / kth_min END"
    )
    return kth.select(
        "grp",
        F.lit(k).alias("k"),
        "got_k",
        "kth_min",
        F.expr(est).alias("kmv_estimate"),
    )


def kmv_minima_grouped(
    df: DataFrame, group_sql: str, col_sql: str, k: int = 256
) -> DataFrame:
    """Per-group sketch STATE (grp, hvs array<bigint>): the k smallest
    distinct hashes of each group — persist per batch/day and merge
    with :func:`kmv_merge_grouped`, exactly like the global lane."""
    from pyspark.sql import Window

    h = F.expr(hash40_expr(col_sql, "spark"))
    w = Window.partitionBy("grp").orderBy("hv")
    return (
        df.select(F.expr(group_sql).alias("grp"), h.alias("hv"))
        .filter(F.col("hv").isNotNull())
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("grp")
        .agg(F.expr("sort_array(collect_list(hv))").alias("hvs"))
    )


def kmv_merge_grouped(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union N per-group sketch states -> one estimate row per group
    (same columns as kmv_distinct_grouped), estimating each group's
    distinct union. Explode, re-dedup per group, keep the k per-group
    minima — identical to what kmv_distinct_grouped computes on the
    concatenated raw data, so the accuracy bound carries over."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("hv")
    kth = (
        sketches.select("grp", F.explode("hvs").alias("hv"))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("grp")
        .agg(F.max("hv").alias("kth_min"), F.count(F.lit(1)).alias("got_k"))
    )
    est = (
        f"CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)"
        f" ELSE CAST({(k - 1) * _U_DENOM} AS DOUBLE) / kth_min END"
    )
    return kth.select(
        "grp", F.lit(k).alias("k"), "got_k", "kth_min",
        F.expr(est).alias("kmv_estimate"),
    )


def kmv_distinct_grouped_sql(
    group_sql: str, col_sql: str, table: str, k: int = 256
) -> str:
    """DuckDB mirror of kmv_distinct_grouped (identical hash, per-group
    k-minima fold, and estimate arithmetic)."""
    h = hash40_expr(col_sql, "duckdb")
    return f"""
    WITH h AS (SELECT DISTINCT grp, hv FROM
               (SELECT {group_sql} AS grp, {h} AS hv FROM {table})
               WHERE hv IS NOT NULL),
    r AS (SELECT grp, hv,
                 row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
          FROM h),
    kk AS (SELECT grp, MAX(hv) AS kth_min, COUNT(*) AS got_k
           FROM r WHERE rn <= {k} GROUP BY grp)
    SELECT grp, {k} AS k, got_k, kth_min,
      CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)
      ELSE CAST({(k - 1) * _U_DENOM} AS DOUBLE) / kth_min END AS kmv_estimate
    FROM kk
    """


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications")
# ---------------------------------------------------------------------------


def cms_bucket_sql(col_sql: str, seed: int, width: int, dialect: str) -> str:
    """Row ``seed``'s bucket for a key: the shared 40-bit uniform of
    md5(key || '#' || seed), mod ``width`` — identical in both engines
    (the seed suffix gives the d pairwise-independent-enough rows)."""
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    keyed = f"concat(CAST({col_sql} AS {cast}), '#', '{seed}')"
    return f"({hex_window_sql(f'md5({keyed})', 1, dialect)} % {width})"


def cms_sketch(
    df: DataFrame, col_sql: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """The CMS counter table (row, bucket, cnt) of ``col_sql``'s
    frequency distribution — depth x width cells TOTAL, regardless of
    input size.

    Scale shape: the stack is map-side (one pass, no key
    materialization) and the groupBy partial-aggregates into at most
    depth*width counters PER PARTITION before the shuffle — the wire
    carries bounded state, not rows. Sketch once per ingest batch and
    cms_merge later: counters are additive, which is the whole point
    of CMS as a 100 TB monitoring primitive (per-day sketches fold
    into per-month ones without re-scanning)."""
    pairs = ", ".join(
        f"{r}, {cms_bucket_sql(col_sql, r, width, 'spark')}"
        for r in range(depth)
    )
    cells = df.selectExpr(f"stack({depth}, {pairs}) AS (row, bucket)")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Fold N unioned sketch tables into one: counters ADD. Equals the
    sketch of the concatenated raw inputs (same buckets, summed
    counts), so the (eps, delta) bound carries over unchanged."""
    return sketches.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_sql: str,
    depth: int = 4,
    width: int = 512,
    out_col: str = "est_cnt",
) -> DataFrame:
    """Point-frequency estimates for a bounded key set: min over the d
    counters each key hashes to (never an underestimate; over by at
    most eps*N with prob 1-delta, eps=e/width, delta=exp(-depth)).
    The sketch is depth*width rows — broadcast side of the join."""
    pairs = ", ".join(
        f"{r}, {cms_bucket_sql('key', r, width, 'spark')}"
        for r in range(depth)
    )
    probes = keys.selectExpr(f"{key_sql} AS key").selectExpr(
        "key", f"stack({depth}, {pairs}) AS (row, bucket)"
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def cms_sketch_grouped(
    df: DataFrame, group_sql: str, col_sql: str,
    depth: int = 4, width: int = 512,
) -> DataFrame:
    """Per-group CMS counter tables (grp, row, bucket, cnt): depth x
    width cells PER GROUP regardless of input size — the per-source
    frequency monitor (per-table hot keys, per-day heavy hitters).
    Same additive-merge contract as the global lane
    (:func:`cms_merge_grouped`); the stack is map-side and the groupBy
    partial-aggregates to bounded per-partition state per group."""
    pairs = ", ".join(
        f"{r}, {cms_bucket_sql(col_sql, r, width, 'spark')}"
        for r in range(depth)
    )
    cells = df.selectExpr(
        f"{group_sql} AS grp", f"stack({depth}, {pairs}) AS (row, bucket)"
    )
    return cells.groupBy("grp", "row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge_grouped(sketches: DataFrame) -> DataFrame:
    """Counters add cell-wise within each group; equals the grouped
    sketch of the concatenated inputs."""
    return sketches.groupBy("grp", "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate_grouped(
    sketch: DataFrame,
    keys: DataFrame,
    depth: int = 4,
    width: int = 512,
    out_col: str = "est_cnt",
) -> DataFrame:
    """Per-group point-frequency estimates for a bounded (grp, key)
    probe set: min over the d counters each key hashes to within its
    group's own table. The sketch is |groups|*depth*width rows —
    still the broadcast side of the join for any dashboard-sized
    group count."""
    pairs = ", ".join(
        f"{r}, {cms_bucket_sql('key', r, width, 'spark')}"
        for r in range(depth)
    )
    probes = keys.selectExpr(
        "grp", "key", f"stack({depth}, {pairs}) AS (row, bucket)"
    )
    return (
        probes.join(F.broadcast(sketch), ["grp", "row", "bucket"], "left")
        .groupBy("grp", "key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def cms_topk_grouped_sql(
    group_sql: str,
    key_sql: str,
    table: str,
    top_n: int = 5,
    depth: int = 4,
    width: int = 512,
) -> str:
    """DuckDB mirror of the per-group heavy-hitters query: each
    group's exact top-N keys by frequency joined with their grouped
    CMS estimates (same md5 buckets, same min-fold within the
    group)."""
    cell = ",\n      ".join(
        f"{cms_bucket_sql(key_sql, r, width, 'duckdb')} AS b{r}"
        for r in range(depth)
    )
    cell_top = ",\n      ".join(
        f"{cms_bucket_sql('t.key', r, width, 'duckdb')} AS b{r}"
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT grp, key, {r} AS row, b{r} AS bucket FROM topcells"
        for r in range(depth)
    )
    sketch_rows = " UNION ALL ".join(
        f"SELECT grp, {r} AS row, b{r} AS bucket FROM cells"
        for r in range(depth)
    )
    return f"""
    WITH cells AS (
      SELECT {group_sql} AS grp, {key_sql} AS key,
      {cell}
      FROM {table}
    ),
    sketch AS (
      SELECT grp, row, bucket, COUNT(*) AS cnt
      FROM ({sketch_rows}) GROUP BY grp, row, bucket
    ),
    exact AS (
      SELECT {group_sql} AS grp, {key_sql} AS key, COUNT(*) AS exact_cnt
      FROM {table} GROUP BY 1, 2
    ),
    top AS (
      SELECT grp, key, exact_cnt FROM (
        SELECT grp, key, exact_cnt,
               row_number() OVER (PARTITION BY grp
                 ORDER BY exact_cnt DESC, key) AS rn
        FROM exact
      ) WHERE rn <= {top_n}
    ),
    topcells AS (
      SELECT t.grp, t.key,
      {cell_top}
      FROM top t
    ),
    est AS (
      SELECT p.grp, p.key, MIN(COALESCE(s.cnt, 0)) AS est_cnt
      FROM ({probe_rows}) p
      LEFT JOIN sketch s USING (grp, row, bucket) GROUP BY p.grp, p.key
    )
    SELECT t.grp, t.key, t.exact_cnt, e.est_cnt
    FROM top t JOIN est e USING (grp, key)
    """


def cms_topk_sql(
    key_sql: str,
    table: str,
    top_n: int = 20,
    depth: int = 4,
    width: int = 512,
) -> str:
    """DuckDB mirror of the heavy-hitters query: exact top-N keys by
    frequency joined with their CMS estimates (same md5 buckets, same
    min-fold)."""
    cell = ",\n      ".join(
        f"{cms_bucket_sql(key_sql, r, width, 'duckdb')} AS b{r}"
        for r in range(depth)
    )
    cell_top = ",\n      ".join(
        f"{cms_bucket_sql('t.key', r, width, 'duckdb')} AS b{r}"
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT key, {r} AS row, b{r} AS bucket FROM topcells"
        for r in range(depth)
    )
    sketch_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, b{r} AS bucket FROM cells" for r in range(depth)
    )
    return f"""
    WITH cells AS (
      SELECT {key_sql} AS key,
      {cell}
      FROM {table}
    ),
    sketch AS (
      SELECT row, bucket, COUNT(*) AS cnt
      FROM ({sketch_rows}) GROUP BY row, bucket
    ),
    exact AS (
      SELECT {key_sql} AS key, COUNT(*) AS exact_cnt FROM {table} GROUP BY 1
    ),
    top AS (
      SELECT key, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, key LIMIT {top_n}
    ),
    topcells AS (
      SELECT t.key,
      {cell_top}
      FROM top t
    ),
    est AS (
      SELECT p.key, MIN(COALESCE(s.cnt, 0)) AS est_cnt
      FROM ({probe_rows}) p
      LEFT JOIN sketch s USING (row, bucket) GROUP BY p.key
    )
    SELECT t.key, t.exact_cnt, e.est_cnt
    FROM top t JOIN est e USING (key)
    """


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch (DDSketch-shaped: Masson, Rim & Lee
# 2019, "DDSketch: a fast and fully-mergeable quantile sketch with
# relative-error guarantees" — base-2 octaves with linear subdivision
# instead of gamma-log buckets, so every bucket boundary is computed
# with EXACT integer / power-of-two float ops, never libm log())
# ---------------------------------------------------------------------------


def _loghist_bucket_sql(col_sql: str, subdiv: int, dialect: str) -> tuple[str, str]:
    """(e, sub) bucket of a POSITIVE INTEGER value: e = floor(log2(x))
    via the binary-string length (exact in both engines — no libm),
    sub = floor((x/2^e - 1) * subdiv). x/2^e is an exact power-of-two
    division, (m-1) is exact by Sterbenz, *subdiv (power of two) is an
    exponent shift — every step bit-identical across engines.

    Domain note: the arithmetic is EXACT for x <= 2^53 (cents, token
    counts, micros all fit). Above that, CAST(x AS DOUBLE) rounds, and
    a mantissa that rounds UP to the next power of two would compute
    x/2^e = 2.0 and land sub at ``subdiv`` — outside the documented
    [0, subdiv) range, shifting the midpoint into the next octave. The
    least() clamp below pins sub to subdiv-1 in that case: buckets
    stay in range for the full bigint domain (both engines round the
    same IEEE way, so cross-engine agreement held even unclamped, but
    the 1/(2*subdiv) relative-error bound only holds for x <= 2^53)."""
    if dialect == "spark":
        e = f"(length(bin({col_sql})) - 1)"
        pw = f"CAST(shiftleft(CAST(1 AS BIGINT), {e}) AS DOUBLE)"
    else:
        e = f"(length(to_base({col_sql}, 2)) - 1)"
        pw = f"CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE)"
    sub = (
        f"least(CAST(floor((CAST({col_sql} AS DOUBLE) / {pw} - 1.0) * {subdiv})"
        f" AS BIGINT), CAST({subdiv - 1} AS BIGINT))"
    )
    return e, sub


def _loghist_mid_sql(subdiv: int, dialect: str) -> str:
    """Bucket midpoint (1 + (sub+0.5)/subdiv) * 2^e as exact-arith
    double: an odd integer shifted by e, divided by 2*subdiv (a power
    of two) — relative error <= 1/(2*subdiv)."""
    num = (
        f"shiftleft(CAST({2 * subdiv} + 2 * sub + 1 AS BIGINT), e)"
        if dialect == "spark"
        else f"(CAST({2 * subdiv} + 2 * sub + 1 AS BIGINT) << e)"
    )
    return f"CAST({num} AS DOUBLE) / {2 * subdiv}"


def loghist_sketch(
    df: DataFrame, col_sql: str, subdiv: int = 16
) -> DataFrame:
    """The quantile-sketch state (e, sub, cnt) of a positive-integer
    column (money as cents, token counts, latencies-as-micros): at
    most 63*subdiv cells no matter the input size, counters additive
    (loghist_merge), relative value error <= 1/(2*subdiv).

    Scale shape: bucket assignment is map-only string/shift arithmetic
    and the groupBy partial-aggregates to bounded per-partition state
    before the shuffle — the third leg of the sketch family (KMV =
    distinct, CMS = frequency, loghist = quantiles), all mergeable,
    all md5/integer-deterministic and therefore oracle-gatable.
    Non-positive values are excluded (log buckets need x > 0)."""
    e, sub = _loghist_bucket_sql(col_sql, subdiv, "spark")
    return (
        df.filter(F.expr(f"{col_sql} > 0"))
        .selectExpr(f"{e} AS e", f"{sub} AS sub")
        .groupBy("e", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def loghist_merge(sketches: DataFrame) -> DataFrame:
    """Counters add cell-wise; equals the sketch of the concatenated
    inputs, with the error bound unchanged (same buckets)."""
    return sketches.groupBy("e", "sub").agg(F.sum("cnt").alias("cnt"))


def loghist_quantiles(
    sketch: DataFrame, qs: list[tuple[int, int]], subdiv: int = 16
) -> DataFrame:
    """Quantile estimates from the sketch: per (num, denom) quantile,
    the first bucket (in (e, sub) order) whose cumulative count
    crosses num/denom of the total — rank threshold as an integer
    cross-multiply (cum*denom >= num*n, the order_value_percentiles
    idiom), value = bucket midpoint. The window runs over the SKETCH
    (bounded cells), not the data — control-plane sized by
    construction, so the unpartitioned sort is fine at any data
    scale.

    Plan shape (r15): ONE pass — every quantile's first-crossing
    bucket is a conditional MIN(struct(e, sub)) in a single
    aggregation over the cum-annotated cells (struct ordering ==
    (e, sub) order, and the crossing predicate is monotone in that
    order, so the min satisfying row IS the first), then one explode
    to (q, est) rows. The r14 shape eagerly localCheckpointed the
    cells and unioned one ORDER BY/LIMIT 1 branch per quantile — an
    extra materialization job at plan-construction time plus a read
    per branch. An empty sketch yields NULL mins, filtered out — the
    same zero rows the old empty-input branches produced."""
    from pyspark.sql import Window

    w = Window.orderBy("e", "sub").rowsBetween(Window.unboundedPreceding, 0)
    c = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    mid = _loghist_mid_sql(subdiv, "spark")
    picks = c.agg(*[
        F.min(
            F.when(
                F.expr(f"cum * {denom} >= {num} * n"), F.struct("e", "sub")
            )
        ).alias(f"__q{i}")
        for i, (num, denom) in enumerate(qs)
    ])
    return (
        picks.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(f"{num}/{denom}").alias("q"),
                        F.col(f"__q{i}.e").alias("e"),
                        F.col(f"__q{i}.sub").alias("sub"),
                    )
                    for i, (num, denom) in enumerate(qs)
                ])
            ).alias("r")
        )
        .filter(F.col("r.e").isNotNull())
        .selectExpr("r.q AS q", "r.e AS e", "r.sub AS sub")
        .selectExpr("q", f"{mid} AS est")
    )


def loghist_quantiles_sql(
    col_sql: str,
    table: str,
    qs: list[tuple[int, int]],
    subdiv: int = 16,
) -> str:
    """DuckDB mirror of loghist_sketch + loghist_quantiles (same
    buckets, same cross-multiply thresholds, same midpoint)."""
    e, sub = _loghist_bucket_sql("x", subdiv, "duckdb")
    mid = _loghist_mid_sql(subdiv, "duckdb")
    picks = " UNION ALL ".join(
        f"""SELECT '{num}/{denom}' AS q, {mid} AS est FROM (
          SELECT e, sub FROM c WHERE cum * {denom} >= {num} * n
          ORDER BY e, sub LIMIT 1)"""
        for num, denom in qs
    )
    return f"""
    WITH v AS (SELECT {col_sql} AS x FROM {table} WHERE {col_sql} > 0),
    b AS (SELECT {e} AS e, {sub} AS sub FROM v),
    sk AS (SELECT e, sub, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    c AS (SELECT e, sub, cnt,
                 SUM(cnt) OVER (ORDER BY e, sub
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 SUM(cnt) OVER () AS n
          FROM sk)
    {picks}
    """


def loghist_sketch_grouped(
    df: DataFrame, group_sql: str, col_sql: str, subdiv: int = 16
) -> DataFrame:
    """Per-group quantile-sketch states (grp, e, sub, cnt): the
    log-histogram keyed by a group expression — at most 63*subdiv
    cells PER GROUP, additive within each group (merge = groupBy
    (grp, e, sub) sum), so per-day/per-source sketches fold into
    horizon sketches exactly like the global lane. Same libm-free
    bucket arithmetic; non-positive values excluded."""
    e, sub = _loghist_bucket_sql(col_sql, subdiv, "spark")
    return (
        df.filter(F.expr(f"{col_sql} > 0"))
        .selectExpr(f"{group_sql} AS grp", f"{e} AS e", f"{sub} AS sub")
        .groupBy("grp", "e", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def drift_cells(
    df: DataFrame, cms_col_sql: str, x_sql: str,
    depth: int = 4, width: int = 512, subdiv: int = 16,
) -> DataFrame:
    """Fused CMS + loghist sketch build for the drift gates (r16,
    guide §2.4): ONE scan and ONE aggregation emit both sketch states
    as a combined ``(kind, a, b, cnt)`` cell table — kind 0 = CMS
    (a=row, b=bucket of ``cms_col_sql``), kind 1 = loghist (a=e, b=sub
    of ``x_sql``). Cell assignments and counts are exactly
    :func:`cms_sketch` + :func:`loghist_sketch` over the same input
    (per row: the depth CMS cells always, the loghist cell only when
    x > 0 — the same rows each separate build would emit), so a
    per-kind slice of this table IS that sketch. Built for
    dq._tv_distance_fused, which computes both TV rows from one chain;
    the separate builders remain the persisted-state surface.

    Generator shape: ``stack`` (the cms_sketch generator), with the
    loghist row's kind NULLed when x <= 0 and filtered — cheaper than
    building an array of structs per row and exploding it."""
    rows = _drift_cell_rows(cms_col_sql, x_sql, depth, width, subdiv)
    return (
        df.selectExpr(f"stack({depth + 1}, {rows}) AS (kind, a, b)")
        .filter("kind IS NOT NULL")
        .groupBy("kind", "a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _drift_cell_rows(
    cms_col_sql: str, x_sql: str, depth: int, width: int, subdiv: int
) -> str:
    """The stack() argument list emitting a row's depth CMS cells plus
    its (conditional) loghist cell as (kind, a, b) triples."""
    e, sub = _loghist_bucket_sql(x_sql, subdiv, "spark")
    pairs = ", ".join(
        f"CAST(0 AS INT), CAST({r} AS BIGINT), "
        f"CAST({cms_bucket_sql(cms_col_sql, r, width, 'spark')} AS BIGINT)"
        for r in range(depth)
    )
    lh = (
        f"IF({x_sql} > 0, 1, CAST(NULL AS INT)), "
        f"CAST({e} AS BIGINT), CAST({sub} AS BIGINT)"
    )
    return f"{pairs}, {lh}"


def drift_cells_grouped(
    df: DataFrame, group_sql: str, cms_col_sql: str, x_sql: str,
    depth: int = 4, width: int = 512, subdiv: int = 16,
) -> DataFrame:
    """Per-group fused CMS + loghist cells (grp, kind, a, b, cnt) —
    the grouped counterpart of :func:`drift_cells`, slicing to exactly
    :func:`cms_sketch_grouped` + :func:`loghist_sketch_grouped`."""
    rows = _drift_cell_rows(cms_col_sql, x_sql, depth, width, subdiv)
    return (
        df.selectExpr(
            f"{group_sql} AS grp", f"stack({depth + 1}, {rows}) AS (kind, a, b)"
        )
        .filter("kind IS NOT NULL")
        .groupBy("grp", "kind", "a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def loghist_merge_grouped(sketches: DataFrame) -> DataFrame:
    """Counters add cell-wise within each group; equals the grouped
    sketch of the concatenated inputs — completes the grouped trio's
    merge surface (kmv_merge_grouped / cms_merge_grouped)."""
    return sketches.groupBy("grp", "e", "sub").agg(F.sum("cnt").alias("cnt"))


def loghist_quantiles_grouped(
    sketch: DataFrame, qs: list[tuple[int, int]], subdiv: int = 16
) -> DataFrame:
    """Per-group quantile estimates (grp, q, est) from grouped sketch
    states: per group, the first (e, sub) bucket whose cumulative
    count crosses the integer rank threshold (cum*denom >= num*n),
    value = bucket midpoint. Windows run over the SKETCH cells
    partitioned by group — bounded per group by construction, so the
    sort is control-plane sized at any data scale.

    Plan shape (r15): one groupBy(grp) aggregation computes every
    quantile's first-crossing bucket as a conditional MIN(struct(e,
    sub)) (same single-pass rationale as :func:`loghist_quantiles`),
    then one explode to (grp, q, est) rows — replacing the eager
    localCheckpoint + one row_number branch per quantile."""
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("grp")
        .orderBy("e", "sub")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = sketch.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    mid = _loghist_mid_sql(subdiv, "spark")
    picks = c.groupBy("grp").agg(*[
        F.min(
            F.when(
                F.expr(f"cum * {denom} >= {num} * n"), F.struct("e", "sub")
            )
        ).alias(f"__q{i}")
        for i, (num, denom) in enumerate(qs)
    ])
    return (
        picks.select(
            "grp",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(f"{num}/{denom}").alias("q"),
                        F.col(f"__q{i}.e").alias("e"),
                        F.col(f"__q{i}.sub").alias("sub"),
                    )
                    for i, (num, denom) in enumerate(qs)
                ])
            ).alias("r"),
        )
        .filter(F.col("r.e").isNotNull())
        .selectExpr("grp", "r.q AS q", "r.e AS e", "r.sub AS sub")
        .selectExpr("grp", "q", f"{mid} AS est")
    )
