"""Snapshot diff: derive the minimal change set between two keyed
table states — the validation / changelog-derivation companion to the
apply family.

Uses: verify a replica against its source (the reference's only
validation surface is row COUNTING for progress —
/root/reference/driver/mysql/extractor.go:859-879 CountTableRows;
content-level table comparison is the standard external tool this
replaces), re-derive a change stream from periodic snapshots when no
binlog is available, and round-trip-test the apply operators
(diff(base, apply(base, changes)) == the net effect of changes).

Semantics: one row per differing key —
- key only in ``new``              -> op 'i' (after image only)
- key only in ``old``              -> op 'd' (before image only)
- key in both, any column differs  -> op 'u' (both images)
Identical rows produce nothing. Column comparison is NULL-safe, over
``new``'s column set (schemas must match; validate upstream).

Scale shape: ONE full-outer join co-partitioned on the unique key —
the same shuffle the apply merge performs — with the row-equality
test a single struct eqNullSafe expression (codegen, no per-column
join re-evaluation). At 100 TB, prune first when snapshots are
chunked: aggregate a per-key-range digest (xxhash64 of the row struct
summed per range) on each side, compare digests, and diff only the
ranges that disagree — the pt-table-checksum strategy; the range
digest is a partial-aggregable map-side fold, so unchanged data never
shuffles. All three layers live here: :func:`snapshot_diff` is the
exact differ, :func:`range_digests` the triage pre-pass, and
:func:`snapshot_diff_triaged` the composed 100 TB path (digest →
disagreeing ranges → exact diff of only those ranges), oracle-gated
to equal the full diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.model import OP_DELETE, OP_INSERT, OP_UPDATE


def range_digests(
    df: DataFrame,
    key_col: str,
    range_width: int = 100_000,
) -> DataFrame:
    """Per-key-range content digest for the chunked-compare pre-pass.

    Returns (rng, n_rows, digest): the key range ``key DIV width``,
    its row count, and an order-free digest (the BIGINT sum of
    31-bit-truncated xxhash64 over the full row struct — commutative,
    so it needs no sort and partial-aggregates map-side; the
    truncation keeps the sum inside BIGINT under ANSI overflow checks
    for any range up to ~2^32 rows). Compare two sides' digests
    and run :func:`snapshot_diff` only on ranges that disagree: at
    100 TB the digest pass shuffles |ranges| rows of three longs,
    never data, and unchanged ranges (the vast majority in
    replication validation) are proven equal without moving a row.

    sum-of-hashes caveat: multiset-insensitive collisions require
    forging xxhash64 sums — fine for validation triage (the exact
    differ re-checks every flagged range), not for adversarial
    integrity proofs.
    """
    cols = df.columns
    return df.groupBy(
        F.expr(f"TRY_CAST({key_col} AS BIGINT) DIV {range_width}").alias("rng")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.xxhash64(F.struct(*[F.col(c) for c in cols])).bitwiseAND(
                F.lit(0x7FFFFFFF)
            )
        ).alias("digest"),
    )


def disagreeing_ranges(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    range_width: int = 100_000,
) -> DataFrame:
    """Key ranges whose (count, digest) differ between the two sides —
    the triage verdict of the chunked-compare pre-pass. One row (rng)
    per range that needs an exact re-diff; ranges absent from one side
    entirely also disagree (full-outer + null-unsafe compare).

    Scale shape: two map-side-partial digest folds + one join over
    |ranges| rows of three longs. Unchanged ranges are proven equal
    without shuffling a single data row."""
    d_old = range_digests(old, key_col, range_width).select(
        F.col("rng").alias("o_rng"),
        F.col("n_rows").alias("o_n"),
        F.col("digest").alias("o_d"),
    )
    d_new = range_digests(new, key_col, range_width).select(
        F.col("rng").alias("n_rng"),
        F.col("n_rows").alias("n_n"),
        F.col("digest").alias("n_d"),
    )
    # null-safe pairing: rows whose key is NULL / not integer-castable
    # all land in the NULL range — it must compare as ONE range on both
    # sides (equal digests prove it clean like any other), not as two
    # unpaired rows that flag forever
    j = d_old.join(
        d_new, F.col("o_rng").eqNullSafe(F.col("n_rng")), "full_outer"
    )
    differ = ~(
        F.col("o_n").eqNullSafe(F.col("n_n"))
        & F.col("o_d").eqNullSafe(F.col("n_d"))
    )
    return j.filter(differ).select(
        F.coalesce("o_rng", "n_rng").alias("rng")
    )


def snapshot_diff_triaged(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    range_width: int = 100_000,
    range_key: str | None = None,
) -> DataFrame:
    """The 100 TB diff: digest both sides per key range, exact-diff
    ONLY the ranges whose digests disagree — pt-table-checksum's
    strategy (the reference's validation surface stops at row counts,
    extractor.go:859-879; this is the content-level tool its users
    bolt on). Equivalent to :func:`snapshot_diff` by construction:
    a range with equal (count, digest) contributes no diff rows, and
    every key lives in exactly one range on each side, so restricting
    both sides to the disagreeing ranges preserves the full-outer
    join's pairing for every differing key.

    Scale shape: the digest pre-pass shuffles |ranges| rows; the
    disagreeing range set (tiny in replication validation — drift is
    localized) broadcasts into a semi-join that prunes both sides
    BEFORE the expensive full-outer key shuffle. Unchanged data never
    shuffles. ``range_key`` defaults to the first key column; keys
    that are NULL or not integer-castable all land in the NULL range,
    which digests, compares, and (when it disagrees) exact-diffs like
    any other — a fully non-castable key degrades to the plain full
    diff instead of a false 'replica clean'."""
    rk = range_key or key_cols[0]
    rngs = disagreeing_ranges(old, new, rk, range_width)
    # TRY_CAST: a non-castable key is the NULL range, not an ANSI abort
    rng_of = F.expr(f"TRY_CAST({rk} AS BIGINT) DIV {range_width}")

    def prune(df: DataFrame) -> DataFrame:
        # eqNullSafe: rows whose key casts to NULL belong to the NULL
        # range — when it disagrees they must route to the exact
        # differ, not silently vanish (a plain == never matches NULL,
        # and a miscast key column would read as a clean replica)
        return (
            df.withColumn("__rng", rng_of)
            .join(
                F.broadcast(rngs),
                F.col("__rng").eqNullSafe(F.col("rng")),
                "left_semi",
            )
            .drop("__rng")
        )

    return snapshot_diff(prune(old), prune(new), key_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Minimal change set turning ``old`` into ``new``.

    Returns key cols + ``op`` ('i'|'u'|'d') + ``before``/``after`` row
    structs (null per the op, like the change model's images).
    """
    cols = new.columns
    non_key = [c for c in cols if c not in key_cols]
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in cols]).alias("before"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in cols]).alias("after"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"__ok_{key_cols[0]}").isNotNull() | F.col("before").isNotNull()
    in_new = F.col(f"__nk_{key_cols[0]}").isNotNull() | F.col("after").isNotNull()
    same = F.struct(*[F.col(f"before.{c}") for c in non_key]).eqNullSafe(
        F.struct(*[F.col(f"after.{c}") for c in non_key])
    )
    op = (
        F.when(~in_old, F.lit(OP_INSERT))
        .when(~in_new, F.lit(OP_DELETE))
        .when(~same, F.lit(OP_UPDATE))
    )
    out = joined.withColumn("op", op).filter(F.col("op").isNotNull())
    return out.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in key_cols
        ],
        "op",
        F.when(F.col("op") != OP_INSERT, F.col("before")).alias("before"),
        F.when(F.col("op") != OP_DELETE, F.col("after")).alias("after"),
    )
