"""Incremental maintenance of a materialized JOIN view (denormalized
read table) under CDC deltas — the delta-join rule specialized to the
shape that dominates real pipelines: a FACT table left-joined to a
DIMENSION on a foreign key, view keyed by the fact's PK.

The reference replays row changes into plain target tables (A1-A3,
driver/mysql/applier_incr.go:747-790); any denormalized copy a user
keeps downstream must be rebuilt by re-running the join. Here the join
view is itself a maintained target: for V = L ⟕ R,

    ΔV = ΔL ⟕ R_new            (rebuild the touched fact rows)
       ∪ (V ⋉ touched(R))       (refresh fact rows whose dim row moved)

which is the classic incremental view maintenance decomposition
(Blakeley, Larson & Tompa, SIGMOD 1986) with the ΔL ⋈ ΔR cross term
folded away by joining ΔL against R AFTER R's own batch applied.

Scale shape (the point): NOTHING data-sized shuffles. The view-side
carves are broadcast semi/anti joins on the Δ key sets (|ΔL| fact keys,
|touched R| dim keys — both bounded by the batch, the incremental
premise); the dim side is pruned to the keys the batch can see before
it broadcasts into the rebuild join. The untouched mass of a 100 TB
view is never read past its join-key columns and never moves.

LEFT-join views are the maintainable shape: every fact row is present
regardless of dim match, so a dim insert/delete only rewrites dim
columns in place (match appears/disappears as NULLs). An inner-join
view drops unmatched fact rows and therefore cannot be maintained from
the view alone (a dim insert would need the missing fact rows back) —
derive inner as ``view.filter(dim_pk_col.isNotNull())`` at read time.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.operators.apply import dedupe_redelivered, latest_image_per_key

_RPK = "__rpk"


class DimSpec(NamedTuple):
    """One dimension's wiring into a star view: the fact's foreign-key
    column, the dim's PK column, and the src -> view-name column map."""

    fk: str
    pk: str
    cols: dict[str, str]


def _renamed_right(right: DataFrame, spec: DimSpec) -> DataFrame:
    return right.select(
        F.col(spec.pk).alias(_RPK),
        *[F.col(src).alias(dst) for src, dst in spec.cols.items()],
    )


def _check_collisions(
    left: DataFrame, dims: list[tuple[DataFrame, DimSpec]]
) -> None:
    # the working names the join/carve plumbing aliases internally:
    # a fact or dim view column literally named one of these would make
    # the join condition ambiguous (or be silently dropped with them)
    reserved = {_RPK, "__k"}
    bad = (set(left.columns) | {
        c for _, spec in dims for c in spec.cols.values()
    }) & reserved
    if bad:
        raise ValueError(
            f"column names {sorted(bad)} are reserved by the join-view "
            "plumbing — rename them in the fact/dim projections"
        )
    taken = set(left.columns)
    for _, spec in dims:
        clash = set(spec.cols.values()) & taken
        if clash:
            raise ValueError(
                f"dim columns collide with the view's: {sorted(clash)}"
            )
        taken |= set(spec.cols.values())


def star_view_of(
    fact: DataFrame, dims: list[tuple[DataFrame, DimSpec]]
) -> DataFrame:
    """Full recompute of the denormalized STAR view: the fact LEFT
    JOINed to each dimension on ``fact[spec.fk] = dim[spec.pk]``, dim
    columns renamed per ``spec.cols`` (view names must not collide
    with the fact's or each other's). This is the bootstrap/backfill
    path and the oracle the incremental path is gated against; NULL or
    dangling fks keep NULL dim columns (SQL join semantics).

    Each dim's ``pk`` must be unique (it is a PK); a duplicate would
    fan every referencing fact row out. The maintenance path inherits
    the same precondition from each dim's own apply lane."""
    _check_collisions(fact, dims)
    out = fact
    for dim, spec in dims:
        r = _renamed_right(dim, spec)
        out = out.join(r, F.col(spec.fk) == F.col(_RPK), "left").drop(_RPK)
    return out


def join_view_of(
    left: DataFrame,
    right: DataFrame,
    fk: str,
    right_pk: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """Single-dim convenience over :func:`star_view_of`."""
    return star_view_of(left, [(right, DimSpec(fk, right_pk, right_cols))])


def _refresh_dim(
    kept: DataFrame, dim: DataFrame, spec: DimSpec, touched: DataFrame
) -> DataFrame:
    """Rewrite ONE dim's columns on the kept rows whose dim row moved.
    The fk probe uses PLAIN equality ON PURPOSE: a NULL fk matches no
    dim row in the view definition, so it must match no dirty key here
    either — null-safe equality would wrongly refresh NULL-fk rows
    against a NULL dim key.

    ONE broadcast join over kept (r16; the r15 shape stacked TWO — a
    dirty-key flag join, then the surviving dim values join — each a
    full pass over the kept mass, and each re-running the dirty-key
    distinct subtree). The broadcast side is now a single PATCH table
    built dim-side: every dirty key, flagged, left-joined to its
    SURVIVING dim row's fresh values (NULL when the row was deleted).
    Same all-broadcast discipline (every probe side is bounded by the
    dirty set; kept is always the streamed side), same rows: dirty
    keys are distinct and spec.pk is unique, so the join fans 1:1 —
    flagged rows take the fresh values (NULL when deleted), unflagged
    rows keep their columns — exactly the r14 union(untouched,
    refreshed) row set. The dirty set is lazily pinned: its first
    consumer is a broadcast build (strictly ordered), so the distinct
    runs once and the patch's second read is a block scan."""
    dirty = (
        touched.select(F.col(spec.pk).alias(_RPK)).distinct()
        .localCheckpoint(eager=False)
    )
    renamed = {c: f"__new_{c}" for c in spec.cols.values()}
    vals = (
        _renamed_right(dim, spec)
        .join(F.broadcast(dirty), _RPK, "left_semi")
        .select(
            F.col(_RPK),
            *[F.col(c).alias(n) for c, n in renamed.items()],
        )
    )
    patch = dirty.join(F.broadcast(vals), _RPK, "left").select(
        _RPK, F.lit(1).alias("__dirty"), *[F.col(n) for n in renamed.values()]
    )
    return (
        kept.join(F.broadcast(patch), F.col(spec.fk) == F.col(_RPK), "left")
        .select(*[
            F.when(F.col("__dirty") == 1, F.col(renamed[c]))
            .otherwise(F.col(c)).alias(c)
            if c in renamed else F.col(c)
            for c in kept.columns
        ])
    )


def maintain_star_view(
    view: DataFrame,
    fact_changes: DataFrame,
    fact_keys: list[str],
    dims: list[tuple[DataFrame, DimSpec, DataFrame | None]],
) -> DataFrame:
    """One maintenance step of a star view: fold a fact-side change
    batch (standard change rows — insert/update/delete with
    before/after images, A10 dedupe and PK-move semantics via the
    shared apply core) and each dimension's already-applied state into
    the materialized view.

    ``dims`` entries are (state_after_its_batch, spec, touched_pks):
    every dim's own apply lane runs first — that ordering is what
    folds the ΔL ⋈ ΔR cross terms away — and ``touched_pks`` (one
    column named ``spec.pk``; None = the dim didn't move) carries the
    bounded set of dim keys whose rows changed. Dim refreshes apply
    sequentially over the kept rows, each rewriting only its own
    columns, so a fact row referencing two moved dims gets both.

    Invariant (pytest-pinned, randomized):
    ``maintain_star_view(star_view_of(F0, dims0), ΔF, dims1)``
    equals ``star_view_of(apply_changes(F0, ΔF), dims1)``.

    Join-key discipline: the fact-PK anti-join wraps keys in a struct
    (null-safe — the minmax-rollup r11 lesson); the fk-side carves use
    plain equality on purpose (see :func:`_refresh_dim`)."""
    net = latest_image_per_key(dedupe_redelivered(fact_changes), fact_keys)

    # --- fact side: drop every touched fact key, rebuild survivors ---
    key_struct = F.struct(*[F.col(k) for k in fact_keys])
    touched = net.select(key_struct.alias("__k")).distinct()
    kept = view.join(
        F.broadcast(touched), key_struct.eqNullSafe(F.col("__k")), "left_anti"
    )

    fresh = net.filter(F.col("__action") == "upsert").select("row.*")
    for dim, spec, _ in dims:
        # prune the dim to the fks the batch can see, then broadcast
        # it: the rebuild join never shuffles the dim or the batch
        r = _renamed_right(dim, spec)
        r_fresh = r.join(
            F.broadcast(fresh.select(F.col(spec.fk).alias(_RPK)).distinct()),
            _RPK,
            "left_semi",
        )
        fresh = fresh.join(
            F.broadcast(r_fresh), F.col(spec.fk) == F.col(_RPK), "left"
        ).drop(_RPK)

    # --- dim side: refresh kept rows whose dim rows moved ---
    for dim, spec, touched_pks in dims:
        if touched_pks is not None:
            kept = _refresh_dim(kept, dim, spec, touched_pks)

    return kept.unionByName(fresh)


def maintain_join_view(
    view: DataFrame,
    left_changes: DataFrame,
    left_keys: list[str],
    fk: str,
    right_state: DataFrame,
    right_pk: str,
    right_cols: dict[str, str],
    right_touched: DataFrame | None = None,
) -> DataFrame:
    """Single-dim convenience over :func:`maintain_star_view` (the
    shape the streaming maintainer drives, one fact ⟕ one dim)."""
    return maintain_star_view(
        view,
        left_changes,
        left_keys,
        [(right_state, DimSpec(fk, right_pk, right_cols), right_touched)],
    )
