"""Declarative data-quality constraint checking — the expectations
layer a 100 TB ingest pipeline runs before promoting data (the Deequ
/ dbt-tests feature family), Spark-first: every row-level check
compiles into ONE aggregation pass over the table (conditional
counts), so N checks cost one scan, not N.

Check specs (dicts, JSON-serializable so suites can live in config):

- ``{"check": "not_null", "col": c}`` — violations = rows with NULL c
- ``{"check": "unique", "cols": [c, ...]}`` — violations = rows in
  excess of one per distinct key (count - distinct count)
- ``{"check": "accepted_values", "col": c, "values": [...]}`` —
  rows whose c is outside the set (NULL counts as a violation)
- ``{"check": "range", "col": c, "lo": x, "hi": y}`` — rows with
  c < lo or c > hi (bounds optional, NULL is a violation)
- ``{"check": "expression", "name": n, "sql": bool_sql}`` — rows
  where the SQL predicate is NOT satisfied (NULL = violation)

Referential integrity needs a second table and therefore its own
(anti-join) pass: :func:`dq_referential`.

Report shape: (check_name string, violations BIGINT, n_rows BIGINT) — one
row per check, integral counts only (hash-gate-safe). ``passed`` is
derivable (violations = 0) and deliberately not stored as a boolean:
thresholded acceptance (e.g. <0.1% nulls) is the caller's policy.

Scale shape: the single agg partial-aggregates to one row per
partition (a handful of longs) before a one-row shuffle; unique adds
count(distinct struct) which Catalyst plans as a two-stage
partial-distinct aggregate on the key — the only check whose cost is
key-cardinality-shaped. dq_referential is a broadcast or shuffled
anti join on the FK — the same join the fact load itself performs.

Reference context: the reference validates connections/privileges at
job create (driver/mysql/validator) but has no content-level
constraint surface; SURVEY §2.6 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _zsum(col: F.Column) -> F.Column:
    """SUM that reports 0 (not NULL) over zero rows — an empty or
    fully-filtered table has zero violations, and callers comparing
    ``violations == 0`` must not get NULL (a threshold policy would
    silently mis-evaluate)."""
    return F.coalesce(F.sum(col), F.lit(0))


# Largest integer float64 represents exactly. Gated drift rationals are
# emitted as BIGINT below this bound so every consumer (hash
# canonicalizers included — the r11 lesson: DECIMAL(38,0) output columns
# were the one shape two engines' hash paths disagreed on, int128 vs
# java BigDecimal) sees the identical integer; emit_decimal=True keeps
# the decimal(38,0) shape for fleets whose rationals genuinely exceed it.
_GATE_MAX = 1 << 53


def _gate_int(col: F.Column, name: str, emit_decimal: bool) -> F.Column:
    """Final-emission cast for one drift-rational component.

    Internal cross-multiplication stays decimal(38,0) (products of two
    row counts need >64 bits at fleet scale); this picks the OUTPUT
    type. Default: BIGINT with a loud per-row guard — NULL or |x| >=
    2^53 raises instead of silently emitting a value float64 (or a
    downstream hash canonicalizer) would corrupt. ``emit_decimal=True``
    bypasses the guard and keeps decimal(38,0)."""
    if emit_decimal:
        return col.cast("decimal(38,0)").alias(name)
    ok = col.isNotNull() & (F.abs(col) < F.lit(_GATE_MAX).cast("decimal(38,0)"))
    return (
        F.when(ok, col.cast("long"))
        .otherwise(F.raise_error(F.concat(
            F.lit(
                f"{name} is NULL or exceeds the 2^53 float64-exact "
                "BIGINT bound — re-run with emit_decimal=True: "
            ),
            F.coalesce(col.cast("string"), F.lit("NULL")),
        )))
        .alias(name)
    )


def _violation_expr(spec: dict) -> tuple[str, F.Column]:
    kind = spec["check"]
    if kind == "not_null":
        c = spec["col"]
        return f"not_null:{c}", _zsum(
            F.when(F.col(c).isNull(), 1).otherwise(0)
        )
    if kind == "unique":
        cols = list(spec["cols"])
        label = "unique:" + ",".join(cols)
        return label, (
            F.count(F.lit(1))
            - F.countDistinct(*[F.col(c) for c in cols])
        )
    if kind == "accepted_values":
        c, vals = spec["col"], list(spec["values"])
        ok = F.col(c).isin(*vals)
        return f"accepted_values:{c}", _zsum(
            F.when(ok, 0).otherwise(1)
        )
    if kind == "range":
        c, lo, hi = spec["col"], spec.get("lo"), spec.get("hi")
        ok = F.col(c).isNotNull()
        if lo is not None:
            ok = ok & (F.col(c) >= F.lit(lo))
        if hi is not None:
            ok = ok & (F.col(c) <= F.lit(hi))
        return f"range:{c}", _zsum(F.when(ok, 0).otherwise(1))
    if kind == "expression":
        name, sql = spec["name"], spec["sql"]
        ok = F.expr(sql)
        return f"expression:{name}", _zsum(F.when(ok, 0).otherwise(1))
    raise ValueError(f"unknown check kind {kind!r}")


def dq_report(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run every row-level check in ONE aggregation pass.

    Returns (check_name, violations, n_rows), one row per check, in a
    deterministic order (the check label). Unknown check kinds raise
    at plan time, not per row."""
    if not checks:
        raise ValueError("dq_report needs at least one check")
    labeled = [_violation_expr(s) for s in checks]
    aggs = [
        expr.cast("long").alias(f"__v{i}")
        for i, (_, expr) in enumerate(labeled)
    ]
    one = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
    pairs = ", ".join(
        f"'{label}', __v{i}" for i, (label, _) in enumerate(labeled)
    )
    return (
        one.selectExpr(
            f"stack({len(labeled)}, {pairs}) AS (check_name, violations)", "__n"
        )
        .select("check_name", "violations", F.col("__n").alias("n_rows"))
        .orderBy("check_name")
    )


def _tv_distance(
    baseline: DataFrame, current: DataFrame, cell_cols: list[str],
    label: str, denom_scale: int = 1, emit_decimal: bool = False,
) -> DataFrame:
    """Total-variation distance between two sketch-cell histograms,
    computed as an EXACT rational: TV = sum_i |b_i*n_c - c_i*n_b| /
    (2*n_b*n_c) — integer cross-multiplication in decimal(38,0) (cnt
    and totals are longs, products need > 64 bits at fleet scale), one
    double division at the end. Returns (check_name, drift_num,
    drift_denom, stat): num/denom are the exact rational (engine- and
    order-independent — summing exact integers) emitted per
    :func:`_gate_int`, stat the convenience double in [0, 1].
    ``denom_scale`` divides multi-histogram stacks (CMS: depth
    independent rows share one total).

    Plan shape (r15): ONE pass — totals come from an unpartitioned
    window over the joined cells (bounded by the sketch contract:
    depth*width / 63*subdiv rows, so the single-partition window is
    control-plane sized at any data volume), replacing the r14 shape's
    eager localCheckpoint + crossJoin(broadcast(totals)). That shape
    cost one extra materialization job at plan-construction time and
    consumed the cell frame twice; this one evaluates each side's
    upstream sketch aggregation exactly once inside the final action.
    Values are bit-identical: the window SUM adds the same exact
    decimal integers, and the num/denom expressions are unchanged."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    b = baseline.groupBy(*cell_cols).agg(F.sum("cnt").alias("b_cnt"))
    c = current.groupBy(*cell_cols).agg(F.sum("cnt").alias("c_cnt"))
    w = Window.partitionBy()
    j = (
        b.join(c, cell_cols, "full_outer")
        .select(
            F.coalesce("b_cnt", F.lit(0)).cast(d38).alias("b_cnt"),
            F.coalesce("c_cnt", F.lit(0)).cast(d38).alias("c_cnt"),
        )
        .select(
            "b_cnt", "c_cnt",
            (F.sum("b_cnt").over(w) / denom_scale).cast(d38).alias("n_b"),
            (F.sum("c_cnt").over(w) / denom_scale).cast(d38).alias("n_c"),
        )
    )
    num = j.agg(
        F.sum(
            F.abs(F.col("b_cnt") * F.col("n_c") - F.col("c_cnt") * F.col("n_b"))
        ).cast(d38).alias("drift_num"),
        F.first(
            (F.lit(2 * denom_scale).cast(d38) * F.col("n_b") * F.col("n_c"))
        ).cast(d38).alias("drift_denom"),
    )
    return num.select(
        F.lit(label).alias("check_name"),
        _gate_int(F.col("drift_num"), "drift_num", emit_decimal),
        _gate_int(F.col("drift_denom"), "drift_denom", emit_decimal),
        (F.col("drift_num").cast("double") / F.col("drift_denom").cast("double")
         ).alias("stat"),
    )


_KIND_CMS, _KIND_LOGHIST = 0, 1


def _tv_kind_label() -> F.Column:
    return F.when(
        F.col("kind") == _KIND_CMS, F.lit("drift:cms_tv")
    ).otherwise(F.lit("drift:loghist_tv"))


def _tv_distance_fused(
    baseline: DataFrame, current: DataFrame, depth: int,
    emit_decimal: bool = False,
) -> DataFrame:
    """BOTH TV rows (cms + loghist) from the fused (kind, a, b, cnt)
    cell tables (sketches.drift_cells) in ONE join/window/agg chain —
    r16: the separate-kind shape ran two full chains over two scans
    per side. Bit-identical to running :func:`_tv_distance` per kind:
    the full-outer join on (kind, a, b) is the disjoint union of the
    per-kind cell joins (kind is never NULL), the window totals
    partition by kind, and the denominator scale is the same per-kind
    constant (depth for CMS — its cells hold depth rows per input row
    — 1 for loghist). One contract difference, documented: an EMPTY
    sketch kind yields no row here (no cells to group), where the
    separate global lane raised through _gate_int's NULL guard; the
    drift queries' fixtures never build empty sides."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    scale = F.when(F.col("kind") == _KIND_CMS, F.lit(depth)).otherwise(
        F.lit(1)
    )
    b = baseline.groupBy("kind", "a", "b").agg(F.sum("cnt").alias("b_cnt"))
    c = current.groupBy("kind", "a", "b").agg(F.sum("cnt").alias("c_cnt"))
    w = Window.partitionBy("kind")
    j = (
        b.join(c, ["kind", "a", "b"], "full_outer")
        .select(
            "kind",
            F.coalesce("b_cnt", F.lit(0)).cast(d38).alias("b_cnt"),
            F.coalesce("c_cnt", F.lit(0)).cast(d38).alias("c_cnt"),
        )
        .select(
            "kind", "b_cnt", "c_cnt",
            (F.sum("b_cnt").over(w) / scale).cast(d38).alias("n_b"),
            (F.sum("c_cnt").over(w) / scale).cast(d38).alias("n_c"),
        )
    )
    num = j.groupBy("kind").agg(
        F.sum(
            F.abs(F.col("b_cnt") * F.col("n_c") - F.col("c_cnt") * F.col("n_b"))
        ).cast(d38).alias("drift_num"),
        F.first(
            ((scale * 2).cast(d38) * F.col("n_b") * F.col("n_c"))
        ).cast(d38).alias("drift_denom"),
    )
    return num.select(
        _tv_kind_label().alias("check_name"),
        _gate_int(F.col("drift_num"), "drift_num", emit_decimal),
        _gate_int(F.col("drift_denom"), "drift_denom", emit_decimal),
        (F.col("drift_num").cast("double") / F.col("drift_denom").cast("double")
         ).alias("stat"),
    )


def dq_drift_report(
    baseline: dict[str, DataFrame], current: dict[str, DataFrame],
    depth: int = 4, emit_decimal: bool = False,
) -> DataFrame:
    """Distribution-drift checks between two profiler sketch states
    (streaming/profile.py StreamProfileJob.profile() dicts) — the
    bridge that turns the profiler from a dashboard into a GATE: run
    a batch's (or day's) sketches against a stored baseline before
    promoting data.

    Rows (check_name, drift_num, drift_denom, stat):

    - ``drift:kmv_ratio`` — current distinct-count estimate over
      baseline's (growth/shrink of key cardinality; 1.0 = stable).
      Each KMV estimate is itself a rational — exact regime
      (got_k < k): got_k / 1; estimating: (k-1)*2^40 / kth_min — and
      the ratio is the exact integer cross-product c_num*b_den /
      c_den*b_num. When BOTH sides are estimating, the shared 2^40
      hash-domain factor is cancelled first ((c_k-1)*b_kth /
      (b_k-1)*c_kth), so every emitted integer stays < 2^53 for
      k <= 8192 — which is what lets the gated output be BIGINT
      (float64-exact) rather than decimal. A zero/empty baseline makes the denominator 0 —
      callers must bless a non-empty baseline.
    - ``drift:loghist_tv`` — total-variation distance of the value
      distributions, from the log-histogram cells. 0 = identical,
      1 = disjoint; the sketch's 1/(2*subdiv) relative value error
      bounds how much within-bucket movement can hide.
    - ``drift:cms_tv`` — TV distance of the hashed key-frequency
      histograms (all depth rows jointly). Hash collisions only ever
      LOWER it (mass lands in shared buckets), so a large value is
      always real drift.

    Thresholds are the caller's policy, like dq_report's violation
    counts. Cost: joins/aggregates over BOUNDED sketch cells —
    control-plane sized regardless of data volume; the num/denom
    rationals are exact integers, so two engines (or two runs) agree
    bit-for-bit even where the convenience double would not.

    Emission contract: drift_num/drift_denom are BIGINT (every value
    engineered < 2^53; a loud per-row guard raises otherwise — see
    :func:`_gate_int`). Pass ``emit_decimal=True`` when the rationals
    can exceed 2^53 (e.g. TV denominators 2*n_b*n_c beyond ~10^15 rows
    per side) to keep decimal(38,0) output instead.

    Like the grouped lane, each check contributes only when its sketch
    kind is present in BOTH profiles — a batch-vs-corpus gate that only
    tracks scale-invariant TV checks (kmv_ratio compares absolute
    cardinalities, meaningless for an increment against its corpus)
    builds only loghist/cms and gets only those rows. At least one
    kind must be shared."""
    d38 = "decimal(38,0)"

    def _kmv_side(df: DataFrame, prefix: str) -> DataFrame:
        # per-side rational (see docstring); 2^40 is the shared hash
        # domain (functions/sketches.py _U_DENOM)
        exact = F.col("got_k") < F.col("k")
        num = F.when(exact, F.col("got_k")).otherwise(
            (F.col("k") - 1).cast("long") * F.lit(1 << 40)
        )
        den = F.when(exact, F.lit(1).cast("long")).otherwise(F.col("kth_min"))
        return df.select(
            exact.alias(f"{prefix}_exact"),
            num.alias(f"{prefix}_num"),
            den.alias(f"{prefix}_den"),
            (F.col("k") - 1).cast("long").alias(f"{prefix}_km1"),
            F.col("kth_min").alias(f"{prefix}_kth"),
        )

    outs: list[DataFrame] = []
    if "kmv" in baseline and "kmv" in current:
        kb, kc = baseline["kmv"], current["kmv"]
        both_est = ~F.col("c_exact") & ~F.col("b_exact")
        outs.append(
            _kmv_side(kc, "c")
            .crossJoin(F.broadcast(_kmv_side(kb, "b")))
            .select(
                F.lit("drift:kmv_ratio").alias("check_name"),
                F.when(both_est, F.col("c_km1") * F.col("b_kth"))
                .otherwise(
                    (F.col("c_num").cast(d38) * F.col("b_den").cast(d38)).cast("long")
                )
                .cast(d38).alias("drift_num"),
                F.when(both_est, F.col("b_km1") * F.col("c_kth"))
                .otherwise(
                    (F.col("c_den").cast(d38) * F.col("b_num").cast(d38)).cast("long")
                )
                .cast(d38).alias("drift_denom"),
            )
            .select(
                "check_name",
                _gate_int(F.col("drift_num"), "drift_num", emit_decimal),
                _gate_int(F.col("drift_denom"), "drift_denom", emit_decimal),
                (F.col("drift_num").cast("double")
                 / F.col("drift_denom").cast("double")).alias("stat"),
            )
        )
    if "cells" in baseline and "cells" in current:
        # fused (kind, a, b, cnt) tables (sketches.drift_cells): both
        # TV rows from one chain — r16; mutually exclusive with the
        # separate loghist/cms keys by construction
        outs.append(_tv_distance_fused(
            baseline["cells"], current["cells"], depth,
            emit_decimal=emit_decimal,
        ))
    if "loghist" in baseline and "loghist" in current:
        outs.append(_tv_distance(
            baseline["loghist"], current["loghist"], ["e", "sub"],
            "drift:loghist_tv", emit_decimal=emit_decimal,
        ))
    if "cms" in baseline and "cms" in current:
        outs.append(_tv_distance(
            baseline["cms"], current["cms"], ["row", "bucket"],
            "drift:cms_tv", denom_scale=depth, emit_decimal=emit_decimal,
        ))
    if not outs:
        raise ValueError(
            "dq_drift_report needs at least one sketch kind present in "
            "BOTH profiles (kmv / loghist / cms / fused cells)"
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("check_name")


def _tv_distance_grouped(
    baseline: DataFrame, current: DataFrame, cell_cols: list[str],
    label: str, denom_scale: int = 1, emit_decimal: bool = False,
) -> DataFrame:
    """Per-group total-variation distance between two grouped
    sketch-cell histograms — the same exact cross-multiplied rational
    as :func:`_tv_distance`, computed independently per group over
    groups present on BOTH sides (one-sided groups are the presence
    check's job; TV against an empty distribution is undefined).
    Group keys join null-safely (struct-wrapped), so a NULL group
    value is one group like any other. Cost: one full-outer join over
    |groups| x bounded cells.

    Plan shape (r15): per-group totals come from a window over the
    joined cells (partitioned by group — bounded cells per group by
    the sketch contract), replacing the r14 shape's separate bt/ct
    total aggregations + inner-join + broadcast, which re-evaluated
    each side's upstream sketch aggregation TWICE (once for cells,
    once for totals). Groups present on only one side have a zero
    window total on the other (cell counts are >= 1 by construction)
    and are dropped by the n_b/n_c > 0 filter — exactly the rows the
    old inner tot-join dropped. Integer DIV preserved verbatim.

    INVARIANT the filter leans on (ADVICE r15): every present group's
    sum(cnt) DIV denom_scale >= 1 — true for every sketch kind here
    because cells carry cnt >= 1 and a group's total is an exact
    multiple of denom_scale (CMS emits exactly ``depth`` cells per
    input row; loghist's scale is 1). A future sketch kind with
    zero-count cells or per-group totals below denom_scale would make
    this filter silently drop groups present on both sides instead of
    emitting a zero-denominator row — state its own scale contract
    before wiring it in (the fused lane inherits the same invariant)."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    b = baseline.groupBy(F.struct("grp").alias("__g"), *cell_cols).agg(
        F.sum("cnt").alias("b_cnt")
    )
    c = current.groupBy(F.struct("grp").alias("__g"), *cell_cols).agg(
        F.sum("cnt").alias("c_cnt")
    )
    wg = Window.partitionBy("__g")
    # integer DIV, never float `/`: sum(cnt) is exactly depth*N per
    # group (CMS) so DIV is lossless at ANY N — a float64 round-trip
    # would silently break the exact-integer contract past 2^53 rows
    # per group (the same reason dq_drift_keys folds totals with DIV)
    j = (
        b.join(c, ["__g", *cell_cols], "full_outer")
        .select(
            "__g",
            F.coalesce("b_cnt", F.lit(0)).alias("__b_long"),
            F.coalesce("c_cnt", F.lit(0)).alias("__c_long"),
        )
        .select(
            "__g",
            F.col("__b_long").cast(d38).alias("b_cnt"),
            F.col("__c_long").cast(d38).alias("c_cnt"),
            F.expr(
                f"CAST((SUM(__b_long) OVER (PARTITION BY __g))"
                f" DIV {denom_scale} AS {d38})"
            ).alias("n_b"),
            F.expr(
                f"CAST((SUM(__c_long) OVER (PARTITION BY __g))"
                f" DIV {denom_scale} AS {d38})"
            ).alias("n_c"),
        )
        .filter((F.col("n_b") > 0) & (F.col("n_c") > 0))
    )
    num = (
        j.groupBy("__g")
        .agg(
            F.sum(
                F.abs(
                    F.col("b_cnt") * F.col("n_c")
                    - F.col("c_cnt") * F.col("n_b")
                )
            ).cast(d38).alias("drift_num"),
            F.first(
                F.lit(2 * denom_scale).cast(d38)
                * F.col("n_b") * F.col("n_c")
            ).cast(d38).alias("drift_denom"),
        )
    )
    return num.select(
        F.lit(label).alias("check_name"),
        F.col("__g.grp").alias("grp"),
        _gate_int(F.col("drift_num"), "drift_num", emit_decimal),
        _gate_int(F.col("drift_denom"), "drift_denom", emit_decimal),
        (F.col("drift_num").cast("double")
         / F.col("drift_denom").cast("double")).alias("stat"),
    )


def _tv_distance_fused_grouped(
    baseline: DataFrame, current: DataFrame, depth: int,
    emit_decimal: bool = False,
) -> DataFrame:
    """Per-group TV rows for BOTH kinds from the fused grouped cell
    tables (sketches.drift_cells_grouped) in one chain — the grouped
    counterpart of :func:`_tv_distance_fused`, replicating
    :func:`_tv_distance_grouped` per kind exactly: windows partition
    by (group, kind), totals fold with integer DIV by the per-kind
    scale, and the (n_b > 0) & (n_c > 0) filter keeps (group, kind)
    pairs present on both sides — the old per-kind inner-join
    semantics."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    b = baseline.groupBy(
        F.struct("grp").alias("__g"), "kind", "a", "b"
    ).agg(F.sum("cnt").alias("b_cnt"))
    c = current.groupBy(
        F.struct("grp").alias("__g"), "kind", "a", "b"
    ).agg(F.sum("cnt").alias("c_cnt"))
    scale_sql = f"(CASE WHEN kind = {_KIND_CMS} THEN {depth} ELSE 1 END)"
    j = (
        b.join(c, ["__g", "kind", "a", "b"], "full_outer")
        .select(
            "__g", "kind",
            F.coalesce("b_cnt", F.lit(0)).alias("__b_long"),
            F.coalesce("c_cnt", F.lit(0)).alias("__c_long"),
        )
        .select(
            "__g", "kind",
            F.col("__b_long").cast(d38).alias("b_cnt"),
            F.col("__c_long").cast(d38).alias("c_cnt"),
            F.expr(
                f"CAST((SUM(__b_long) OVER (PARTITION BY __g, kind))"
                f" DIV {scale_sql} AS {d38})"
            ).alias("n_b"),
            F.expr(
                f"CAST((SUM(__c_long) OVER (PARTITION BY __g, kind))"
                f" DIV {scale_sql} AS {d38})"
            ).alias("n_c"),
        )
        .filter((F.col("n_b") > 0) & (F.col("n_c") > 0))
    )
    scale = F.when(F.col("kind") == _KIND_CMS, F.lit(depth)).otherwise(
        F.lit(1)
    )
    num = (
        j.groupBy("__g", "kind")
        .agg(
            F.sum(
                F.abs(
                    F.col("b_cnt") * F.col("n_c")
                    - F.col("c_cnt") * F.col("n_b")
                )
            ).cast(d38).alias("drift_num"),
            F.first(
                (scale * 2).cast(d38) * F.col("n_b") * F.col("n_c")
            ).cast(d38).alias("drift_denom"),
        )
    )
    return num.select(
        _tv_kind_label().alias("check_name"),
        F.col("__g.grp").alias("grp"),
        _gate_int(F.col("drift_num"), "drift_num", emit_decimal),
        _gate_int(F.col("drift_denom"), "drift_denom", emit_decimal),
        (F.col("drift_num").cast("double")
         / F.col("drift_denom").cast("double")).alias("stat"),
    )


def dq_drift_report_grouped(
    baseline: dict[str, DataFrame], current: dict[str, DataFrame],
    depth: int = 4, emit_decimal: bool = False,
) -> DataFrame:
    """PER-GROUP drift checks between two grouped profiler states
    (sketches.py kmv_distinct_grouped / cms_sketch_grouped /
    loghist_sketch_grouped frames) — the gate for the actual 100 TB
    failure mode: drift localized to ONE source/table/day that a
    global comparison averages away. Provide the sketch kinds you
    track; each contributes its rows.

    Rows (check_name, grp, drift_num, drift_denom, stat), one per
    group per check:

    - ``drift:presence`` — from the kmv frames: drift_num = 1 if the
      group exists in the baseline, drift_denom = 1 if in current
      (exact-integer flags; the ONE check whose stat is num - denom,
      not num/denom: +1.0 = group vanished, -1.0 = appeared, 0.0 =
      stable — a division would be 1/0 for one-sided groups).
    - ``drift:kmv_ratio`` — per-group distinct-count ratio, exact
      integer rational with the same both-estimating 2^40
      cancellation as the global lane; groups present on both sides.
    - ``drift:loghist_tv`` / ``drift:cms_tv`` — per-group TV
      distances of the value / hashed-key-frequency histograms;
      groups present on both sides.

    Same exactness and emission contract as :func:`dq_drift_report`:
    every drift_num/drift_denom is an exact integer (order- and
    engine-independent) emitted as BIGINT under the 2^53 loud guard
    (``emit_decimal=True`` for fleets beyond it), never NULL, stat one
    derived double. Group keys compare null-safely throughout. Cost:
    bounded sketch cells x |groups| — control-plane sized at any data
    volume."""
    d38 = "decimal(38,0)"
    outs: list[DataFrame] = []

    def _side(df: DataFrame, p: str) -> DataFrame:
        exact = F.col("got_k") < F.col("k")
        num = F.when(exact, F.col("got_k")).otherwise(
            (F.col("k") - 1).cast("long") * F.lit(1 << 40)
        )
        den = F.when(exact, F.lit(1).cast("long")).otherwise(F.col("kth_min"))
        return df.select(
            F.struct("grp").alias("__g"),
            exact.alias(f"{p}_exact"),
            num.alias(f"{p}_num"),
            den.alias(f"{p}_den"),
            (F.col("k") - 1).cast("long").alias(f"{p}_km1"),
            F.col("kth_min").alias(f"{p}_kth"),
        )

    if "kmv" in baseline and "kmv" in current:
        # ONE full-outer join emits BOTH kmv rows per group (r15):
        # presence always, ratio only where both sides exist — as an
        # explode over a 2-struct array. The r14 shape built presence
        # and ratio as separate union branches, each with its own join,
        # so the per-side kmv_distinct_grouped aggregation (a distinct
        # + k-minima window over the source) executed TWICE per side.
        # Values are unchanged: presence flags come from each side's
        # never-NULL exact marker, and the ratio expressions are
        # verbatim (rows only where both markers exist == the old
        # inner join).
        kb, kc = _side(baseline["kmv"], "b"), _side(current["kmv"], "c")
        b_here = F.col("b_exact").isNotNull()
        c_here = F.col("c_exact").isNotNull()
        both_est = ~F.col("c_exact") & ~F.col("b_exact")
        pres_row = F.struct(
            F.lit("drift:presence").alias("check_name"),
            b_here.cast("int").cast(d38).alias("drift_num"),
            c_here.cast("int").cast(d38).alias("drift_denom"),
            (b_here.cast("int") - c_here.cast("int"))
            .cast("double").alias("stat"),
        )
        ratio_num = (
            F.when(both_est, F.col("c_km1") * F.col("b_kth"))
            .otherwise(
                (F.col("c_num").cast(d38)
                 * F.col("b_den").cast(d38)).cast("long")
            )
            .cast(d38)
        )
        ratio_den = (
            F.when(both_est, F.col("b_km1") * F.col("c_kth"))
            .otherwise(
                (F.col("c_den").cast(d38)
                 * F.col("b_num").cast(d38)).cast("long")
            )
            .cast(d38)
        )
        ratio_row = F.when(
            b_here & c_here,
            F.struct(
                F.lit("drift:kmv_ratio").alias("check_name"),
                ratio_num.alias("drift_num"),
                ratio_den.alias("drift_denom"),
                (ratio_num.cast("double") / ratio_den.cast("double"))
                .alias("stat"),
            ),
        )
        kmv_rows = (
            kb.join(kc, ["__g"], "full_outer")
            .select(
                "__g", F.explode(F.array(pres_row, ratio_row)).alias("r")
            )
            .filter(F.col("r").isNotNull())
            .select(
                F.col("r.check_name").alias("check_name"),
                F.col("__g.grp").alias("grp"),
                _gate_int(F.col("r.drift_num"), "drift_num", emit_decimal),
                _gate_int(F.col("r.drift_denom"), "drift_denom",
                          emit_decimal),
                F.col("r.stat").alias("stat"),
            )
        )
        outs.append(kmv_rows)
    if "cells" in baseline and "cells" in current:
        # fused grouped cell tables (sketches.drift_cells_grouped):
        # both per-group TV rows from one chain — r16
        outs.append(_tv_distance_fused_grouped(
            baseline["cells"], current["cells"], depth,
            emit_decimal=emit_decimal,
        ))
    if "loghist" in baseline and "loghist" in current:
        outs.append(_tv_distance_grouped(
            baseline["loghist"], current["loghist"], ["e", "sub"],
            "drift:loghist_tv", emit_decimal=emit_decimal,
        ))
    if "cms" in baseline and "cms" in current:
        outs.append(_tv_distance_grouped(
            baseline["cms"], current["cms"], ["row", "bucket"],
            "drift:cms_tv", denom_scale=depth, emit_decimal=emit_decimal,
        ))
    if not outs:
        raise ValueError(
            "dq_drift_report_grouped needs at least one sketch kind "
            "present in BOTH profiles (kmv / loghist / cms / fused cells)"
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("check_name", "grp")


def dq_drift_keys(
    baseline_cms: DataFrame, current_cms: DataFrame, probes: DataFrame,
    key_sql: str = "key", depth: int = 4, width: int = 512,
    emit_decimal: bool = False,
) -> DataFrame:
    """PER-KEY frequency drift between two CMS profiles over a bounded
    probe set — after the global/grouped gates say "it drifted", this
    answers WHICH keys moved: for each probe key the change in
    frequency SHARE |est_b/n_b - est_c/n_c| as the exact rational
    |est_b*n_c - est_c*n_b| / (n_b*n_c). CMS estimates are integers
    (min over counters, never under the true count), totals come from
    the sketches themselves (sum(cnt)/depth), so the whole report is
    engine-exact like the other drift lanes. A key absent from one
    side estimates 0 there — appearing/vanishing hot keys rank at the
    top naturally.

    Rows (key, b_est, c_est, drift_num, drift_denom, stat), one per
    probe key. Cost: the probe set (bounded — top-k output, watchlist)
    joins against broadcast sketch cells; nothing data-sized. The
    CMS error bound applies per estimate: share error <= e/width with
    prob 1-exp(-depth), so rank the report, don't read 9th decimals.

    Exactness contract (the r10 lesson): the gated integers are never
    NULL — empty-sketch sums coalesce to 0, and the totals fold with
    integer DIV (sum(cnt) is exactly depth*N, so DIV is lossless at
    ANY N, no float64 round-trip). Emission follows
    :func:`dq_drift_report`'s contract: BIGINT under the 2^53 loud
    guard, ``emit_decimal=True`` past it. An EMPTY side makes
    drift_denom 0 and stat NULL (Spark div-by-zero) — comparing
    against an empty profile is a pipeline bug; gate on non-empty
    sketches upstream.
    """
    from dtle_spark.functions import sketches as sk

    d38 = "decimal(38,0)"
    b = sk.cms_estimate(
        baseline_cms, probes, key_sql, depth, width, out_col="b_est"
    )
    c = sk.cms_estimate(
        current_cms, probes, key_sql, depth, width, out_col="c_est"
    )
    n_b = baseline_cms.agg(
        F.expr(f"CAST(coalesce(sum(cnt), 0) DIV {depth} AS {d38})")
        .alias("n_b")
    )
    n_c = current_cms.agg(
        F.expr(f"CAST(coalesce(sum(cnt), 0) DIV {depth} AS {d38})")
        .alias("n_c")
    )
    return (
        b.join(c, ["key"])
        .crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_c))
        .select(
            "key",
            "b_est",
            "c_est",
            F.abs(
                F.col("b_est").cast(d38) * F.col("n_c")
                - F.col("c_est").cast(d38) * F.col("n_b")
            ).cast(d38).alias("drift_num"),
            (F.col("n_b") * F.col("n_c")).cast(d38).alias("drift_denom"),
        )
        .select(
            "key", "b_est", "c_est",
            _gate_int(F.col("drift_num"), "drift_num", emit_decimal),
            _gate_int(F.col("drift_denom"), "drift_denom", emit_decimal),
            (F.col("drift_num").cast("double")
             / F.col("drift_denom").cast("double")).alias("stat"),
        )
        .orderBy("key")
    )


def judge_drift(report: DataFrame, thresholds: dict[str, float]) -> DataFrame:
    """The promotion JUDGMENT over a drift report (any rung of the
    ladder): appends ``deviation`` (|stat - 1| for ``drift:kmv_ratio``
    — 1.0 means stable cardinality — |stat| for the TV and presence
    checks, where 0.0 means identical/both-sided), the named
    ``threshold``, and ``passed``. Pure plan — composes lazily with
    the report and is oracle-gatable.

    Policy is explicit per check: a report row whose check_name has no
    entry in ``thresholds`` raises AT EXECUTION (raise_error) rather
    than silently passing — an unnamed check silently passing is how
    gates rot. StreamProfileJob.drift_gate folds this to the one
    (passed, report) promotion decision."""
    dev = F.when(
        F.col("check_name") == "drift:kmv_ratio",
        F.abs(F.col("stat") - 1.0),
    ).otherwise(F.abs(F.col("stat")))
    thr = F.raise_error(F.concat(
        F.lit("no drift_gate threshold named for check "),
        F.col("check_name"),
    )).cast("double")
    for name, t in sorted(thresholds.items(), reverse=True):
        thr = F.when(F.col("check_name") == name, F.lit(float(t))
                     ).otherwise(thr)
    return report.select(
        "*",
        dev.alias("deviation"),
        thr.alias("threshold"),
        (dev <= thr).alias("passed"),
    )


def dq_referential(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """Referential-integrity check: child rows whose non-null ``fk``
    has no matching ``parent.pk`` (one anti join). Same report shape,
    label ``referential:<fk>-><pk>`` — returned lazily (two one-row
    aggregates under a broadcast crossJoin), so it unions with
    dq_report without forcing execution."""
    n = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    orphans = (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), [fk], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return orphans.crossJoin(F.broadcast(n)).select(
        F.lit(f"referential:{fk}->{pk}").alias("check_name"),
        "violations",
        "n_rows",
    )
