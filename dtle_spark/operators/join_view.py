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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.operators.apply import dedupe_redelivered, latest_image_per_key

_RPK = "__rpk"


def _renamed_right(
    right: DataFrame, right_pk: str, right_cols: dict[str, str]
) -> DataFrame:
    return right.select(
        F.col(right_pk).alias(_RPK),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )


def join_view_of(
    left: DataFrame,
    right: DataFrame,
    fk: str,
    right_pk: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """Full recompute of the denormalized view: ``left`` LEFT JOIN
    ``right`` on ``left[fk] = right[right_pk]``, dim columns renamed
    per ``right_cols`` (src -> view name; names must not collide with
    left's). This is the bootstrap/backfill path and the oracle the
    incremental path is gated against; NULL fk rows keep NULL dim
    columns (SQL join semantics — NULL matches nothing).

    ``right_pk`` must be unique in ``right`` (it is a PK); a duplicate
    would fan every referencing fact row out. The maintenance path
    inherits the same precondition from the dim's own apply lane."""
    clash = set(right_cols.values()) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    r = _renamed_right(right, right_pk, right_cols)
    return left.join(r, F.col(fk) == F.col(_RPK), "left").drop(_RPK)


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
    """One maintenance step: fold a fact-side change batch (standard
    change rows — insert/update/delete with before/after images, A10
    dedupe and PK-move semantics via the shared apply core) and an
    already-applied dim state into the materialized view.

    ``right_state`` is the dim AFTER its own batch applied (its apply
    lane runs first — that ordering is what folds the ΔL ⋈ ΔR term
    away). ``right_touched`` is the bounded set of dim PKs whose rows
    changed this batch (one column named ``right_pk``); None means the
    dim didn't move.

    Invariant (pytest-pinned, randomized):
    ``maintain_join_view(join_view_of(L, R0), ΔL, R1, touched)``
    equals ``join_view_of(apply_changes(L, ΔL), R1)``.

    Join-key discipline: the fact-PK anti-join wraps keys in a struct
    (null-safe — the minmax-rollup r11 lesson); the fk-side carve uses
    PLAIN equality ON PURPOSE: a NULL fk matches no dim row in the view
    definition, so it must match no dirty key here either — null-safe
    equality would wrongly refresh NULL-fk rows against a NULL dim key.
    """
    net = latest_image_per_key(dedupe_redelivered(left_changes), left_keys)

    # --- fact side: drop every touched fact key, rebuild survivors ---
    key_struct = F.struct(*[F.col(k) for k in left_keys])
    touched = net.select(key_struct.alias("__k")).distinct()
    kept = view.join(
        F.broadcast(touched), key_struct.eqNullSafe(F.col("__k")), "left_anti"
    )

    fresh_left = net.filter(F.col("__action") == "upsert").select("row.*")
    r = _renamed_right(right_state, right_pk, right_cols)
    # prune the dim to the fks the batch can see, then broadcast it:
    # the rebuild join never shuffles the dim or the batch
    r_for_fresh = r.join(
        F.broadcast(fresh_left.select(F.col(fk).alias(_RPK)).distinct()),
        _RPK,
        "left_semi",
    )
    fresh = fresh_left.join(
        F.broadcast(r_for_fresh), F.col(fk) == F.col(_RPK), "left"
    ).drop(_RPK)

    # --- dim side: refresh kept rows whose dim row moved ---
    if right_touched is not None:
        dirty = right_touched.select(F.col(right_pk).alias(_RPK)).distinct()
        carve = kept.join(
            F.broadcast(dirty), F.col(fk) == F.col(_RPK), "left_semi"
        )
        untouched = kept.join(
            F.broadcast(dirty), F.col(fk) == F.col(_RPK), "left_anti"
        )
        r_dirty = r.join(F.broadcast(dirty), _RPK, "left_semi")
        refreshed = (
            carve.drop(*right_cols.values())
            .join(F.broadcast(r_dirty), F.col(fk) == F.col(_RPK), "left")
            .drop(_RPK)
        )
        kept = untouched.unionByName(refreshed)

    return kept.unionByName(fresh)
