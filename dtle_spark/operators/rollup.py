"""Incremental rollup (materialized-aggregate) maintenance over a CDC
change stream — classic delta aggregation, Spark-first.

A maintained view ``SELECT groups, SUM(m1)..., COUNT(*) FROM T GROUP
BY groups`` can be kept current under inserts/updates/deletes without
rescanning T: every change contributes signed per-group deltas
(+after, -before), deltas are additive and commutative, and the view
is the running sum with groups whose count reaches zero removed. Only
SUM/COUNT-class (additive) measures ride the delta lanes — MIN/MAX
are not delta-maintainable under deletes (retracting the extremum
needs the runner-up), so they get the DIRTY-GROUP RECOMPUTE lane
instead (:func:`dirty_groups` + :func:`maintain_minmax_rollup`):
recompute only the groups the batch touched from the applied table,
keep every other state row. Use integral measures (cents, counts) so
retractions cancel exactly; float deltas drift.

Two delta lanes, two contracts:

- :func:`rollup_delta` — map-only, NO state read. Requires an
  IMAGE-CONSISTENT stream: each change's before-image equals the row
  state it replaces (what a real binlog/Debezium stream guarantees —
  reference binlog rows events carry exact before/after images,
  /root/reference/driver/mysql/binlog/binlog_reader.go:700-1121).
  Redeliveries must be deduped first (A10, operators/apply.py).

- :func:`rollup_delta_vs_target` — collapses the batch to per-key
  net winners (latest_image_per_key, the apply operator's own
  reduction) and reads the OLD images from the target with one keyed
  join, so it is correct even for self-conflicting batches whose
  interior before-images are stale. O(|batch|) plus one join against
  the target on its unique key — the same shuffle the apply merge
  itself performs, so maintaining N rollups rides the partitioning
  the apply already established.

At 100 TB: deltas are group-grain (bounded by group cardinality per
batch), partial-aggregable map-side; the view merge is a groupBy on
the group key over state + delta. Nothing is proportional to the
table, only to the batch and the group count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtle_spark.model import OP_DELETE, OP_INSERT, OP_UPDATE
from dtle_spark.operators.apply import latest_image_per_key

_N = "__n"


def _signed(img: str, changes: DataFrame, cond,
            weight: int,
            group_sqls: dict[str, str], measure_sqls: dict[str, str]) -> DataFrame:
    rows = changes.filter(cond).select(f"{img}.*")
    return rows.select(
        *[F.expr(sql).alias(name) for name, sql in group_sqls.items()],
        *[(F.lit(weight) * F.expr(sql)).alias(name) for name, sql in measure_sqls.items()],
        F.lit(weight).alias(_N),
    )


def _fold(effects: DataFrame, group_names, measure_names) -> DataFrame:
    return effects.groupBy(*group_names).agg(
        *[F.sum(m).alias(m) for m in measure_names],
        F.sum(_N).alias(_N),
    )


def rollup_delta(
    changes: DataFrame,
    group_sqls: dict[str, str],
    measure_sqls: dict[str, str],
) -> DataFrame:
    """Per-group signed deltas of an image-consistent change batch.

    ``group_sqls`` / ``measure_sqls`` map output names to SQL
    expressions over the row image (derived groups like
    ``o_totalprice DIV 10000`` work). Returns group cols + one signed
    sum per measure + ``__n`` (signed row-count delta). Map-only +
    one partial-aggregable groupBy at group grain.

    Malformed rows contribute NOTHING — an update missing either
    image is dropped whole (never a one-sided delta), matching the
    apply family's null-image guards (latest_image_per_key), so a
    rollup maintained from the same stream as an applied table can
    never diverge from it on malformed input.
    """
    op = F.col("op")
    upd_ok = (
        (op == OP_UPDATE)
        & F.col("before").isNotNull()
        & F.col("after").isNotNull()
    )
    plus = _signed(
        "after", changes,
        ((op == OP_INSERT) & F.col("after").isNotNull()) | upd_ok,
        1, group_sqls, measure_sqls,
    )
    minus = _signed(
        "before", changes,
        ((op == OP_DELETE) & F.col("before").isNotNull()) | upd_ok,
        -1, group_sqls, measure_sqls,
    )
    return _fold(plus.unionByName(minus), group_sqls, measure_sqls)


def rollup_delta_vs_target(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    group_sqls: dict[str, str],
    measure_sqls: dict[str, str],
    net: DataFrame | None = None,
) -> DataFrame:
    """Per-group deltas of a batch applied onto ``target`` — correct
    for self-conflicting batches (interior before-images may be stale;
    the per-key seq winner decides, exactly as the apply merge does).

    Old images come from ``target`` via one inner join on the unique
    key; new images are the winners' upsert rows. ``net`` (r16): share
    a precomputed latest_image_per_key across co-maintained operators
    (see apply_changes).
    """
    if net is None:
        net = latest_image_per_key(changes, key_cols)
    old_rows = target.join(net.select(*key_cols), key_cols, "inner")
    minus = old_rows.select(
        *[F.expr(sql).alias(name) for name, sql in group_sqls.items()],
        *[(F.lit(-1) * F.expr(sql)).alias(name) for name, sql in measure_sqls.items()],
        F.lit(-1).alias(_N),
    )
    new_rows = net.filter(F.col("__action") == "upsert").select("row.*")
    plus = new_rows.select(
        *[F.expr(sql).alias(name) for name, sql in group_sqls.items()],
        *[(F.lit(1) * F.expr(sql)).alias(name) for name, sql in measure_sqls.items()],
        F.lit(1).alias(_N),
    )
    return _fold(minus.unionByName(plus), group_sqls, measure_sqls)


def rollup_of(
    table: DataFrame,
    group_sqls: dict[str, str],
    measure_sqls: dict[str, str],
) -> DataFrame:
    """The full-recompute rollup in the same shape the deltas maintain
    (groups + measures + ``__n``) — the initial state, and the
    equivalence target tests pin deltas against."""
    rows = table.select(
        *[F.expr(sql).alias(name) for name, sql in group_sqls.items()],
        *[F.expr(sql).alias(name) for name, sql in measure_sqls.items()],
        F.lit(1).alias(_N),
    )
    return _fold(rows, group_sqls, measure_sqls)


def dirty_groups(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    group_sqls: dict[str, str],
    net: DataFrame | None = None,
) -> DataFrame:
    """The groups a change batch TOUCHES: the groups of the old images
    of every net-affected key (read from ``target`` with one keyed
    join — correct for self-conflicting batches, like
    rollup_delta_vs_target) plus the groups of the new upsert images.
    Bounded by the batch's key count; this is the recompute scope of
    the non-additive maintenance lane. ``net`` (r16): share a
    precomputed latest_image_per_key across co-maintained operators
    (see apply_changes)."""
    if net is None:
        net = latest_image_per_key(changes, key_cols)
    old_groups = target.join(net.select(*key_cols), key_cols, "inner").select(
        *[F.expr(sql).alias(name) for name, sql in group_sqls.items()]
    )
    new_groups = net.filter(F.col("__action") == "upsert").select("row.*").select(
        *[F.expr(sql).alias(name) for name, sql in group_sqls.items()]
    )
    return old_groups.unionByName(new_groups).distinct()


def minmax_rollup_of(
    table: DataFrame,
    group_sqls: dict[str, str],
    agg_sqls: dict[str, tuple[str, str]],
) -> DataFrame:
    """The full-recompute MIN/MAX rollup: ``agg_sqls`` maps output
    names to ('min'|'max', sql-over-the-row-image). The initial state,
    and the shape :func:`maintain_minmax_rollup` keeps current."""
    rows = table.select(
        *[F.expr(sql).alias(name) for name, sql in group_sqls.items()],
        *[F.expr(sql).alias(name) for name, (_, sql) in agg_sqls.items()],
    )
    aggs = [
        (F.min(name) if kind == "min" else F.max(name)).alias(name)
        for name, (kind, _) in agg_sqls.items()
    ]
    return rows.groupBy(*group_sqls.keys()).agg(*aggs)


def maintain_minmax_rollup(
    state: DataFrame,
    applied: DataFrame,
    dirty: DataFrame,
    group_sqls: dict[str, str],
    agg_sqls: dict[str, tuple[str, str]],
) -> DataFrame:
    """Keep a MIN/MAX rollup current under a change batch by
    DIRTY-GROUP RECOMPUTE — the standard answer to non-additive
    maintenance: MIN/MAX are not delta-maintainable under deletes
    (retracting the current extremum needs the group's runner-up,
    which the delta doesn't carry), so recompute exactly the groups
    the batch touched from the APPLIED table and keep every other
    state row untouched.

    ``state`` is the previous rollup (minmax_rollup_of shape),
    ``applied`` the post-merge table, ``dirty`` the touched groups
    (:func:`dirty_groups` — compute it from the PRE-apply target).
    Cost: one broadcast semi-join to carve the dirty partition of the
    applied table + an aggregation over only those groups' rows, plus
    a broadcast anti-join on the bounded state. Nothing is
    proportional to |table| except the carve scan itself, which
    partition-prunes when the table is stored partitioned/clustered
    by a group-correlated key; groups that vanish (all rows deleted)
    drop out naturally — they recompute to no rows.
    """
    group_names = list(group_sqls.keys())
    applied_groups = applied.select(
        F.struct(*[F.expr(sql).alias(name) for name, sql in group_sqls.items()]).alias("__g"),
        "*",
    )
    dirty_rows = applied_groups.join(
        F.broadcast(dirty.select(F.struct(*group_names).alias("__g"))),
        ["__g"],
        "left_semi",
    ).drop("__g")
    recomputed = minmax_rollup_of(dirty_rows, group_sqls, agg_sqls)
    # same null-safe struct key as the carve semi-join: a plain
    # column-list anti-join is EqualTo, so a dirty group with a NULL
    # group value would be recomputed AND keep its stale state row
    untouched = (
        state.select(F.struct(*group_names).alias("__g"), "*")
        .join(
            F.broadcast(dirty.select(F.struct(*group_names).alias("__g"))),
            ["__g"],
            "left_anti",
        )
        .drop("__g")
    )
    return untouched.unionByName(recomputed)


def merge_rollup(state: DataFrame, delta: DataFrame,
                 group_names: list[str], measure_names: list[str]) -> DataFrame:
    """Fold deltas into the rollup state. Additivity makes this
    order-free — batches may merge in any grouping AND any order
    (per-batch, compacted, all-at-once, shuffled) and converge to the
    same view.

    Vanished groups: only rows that are zero in the count AND every
    measure are dropped — the additive identity, always safe. A group
    transiently at count zero with a nonzero measure residual (batches
    merging ahead of the batch they cancel against) MUST survive to
    cancel later, or order-freeness breaks by losing the residual; in
    the true final state of a consistent integral-measure stream a
    vanished group's sums are exactly zero, so it is still removed.
    (Found by the randomized cross-operator invariant test.)"""
    merged = _fold(state.unionByName(delta), group_names, measure_names)
    nonzero = F.col(_N) != 0
    for m in measure_names:
        nonzero = nonzero | (F.col(m) != 0)
    return merged.filter(nonzero)
