"""Incremental rollup (materialized-aggregate) maintenance over a CDC
change stream — classic delta aggregation, Spark-first.

A maintained view ``SELECT groups, SUM(m1)..., COUNT(*) FROM T GROUP
BY groups`` can be kept current under inserts/updates/deletes without
rescanning T: every change contributes signed per-group deltas
(+after, -before), deltas are additive and commutative, and the view
is the running sum with groups whose count reaches zero removed. Only
SUM/COUNT-class (additive) measures qualify — MIN/MAX are not
maintainable under deletes without the full group. Use integral
measures (cents, counts) so retractions cancel exactly; float deltas
drift.

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
) -> DataFrame:
    """Per-group deltas of a batch applied onto ``target`` — correct
    for self-conflicting batches (interior before-images may be stale;
    the per-key seq winner decides, exactly as the apply merge does).

    Old images come from ``target`` via one inner join on the unique
    key; new images are the winners' upsert rows.
    """
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
