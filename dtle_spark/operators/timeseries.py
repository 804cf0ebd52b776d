"""Calendar resampling and gap-filling — time-series operators Spark
lacks natively, composed from built-ins (preference (a) of the
custom-operator ladder; no UDF).

A regular-grid resample takes keyed observations at irregular ticks
and lands them on a dense calendar: every (key, tick) cell between the
observed bounds exists exactly once, missing cells carry an explicit
fill. The three standard fills are provided in one pass:

- **zero-fill** — absent means 0 (additive measures: revenue, counts);
- **LOCF** — last observation carried forward (state-like measures:
  balance, price, inventory);
- **linear interpolation** — straight line between the neighbouring
  observations (continuous signals), null outside the observed range.

Reference context: the reference engine has no time-series surface —
this belongs to the §2.6 family (analytics the replacement engine must
provide for its users' query mix alongside the CDC/apply operators).

Scale shape: the spine is GENERATED, not shuffled — the global
[min, max] bound is a one-row aggregate broadcast under a crossJoin,
and ``sequence()`` explodes per key map-side, so spine cost is
|keys| x |ticks| rows with no data-proportional shuffle. The join
back to the observations shuffles on (key, tick) — the observations
are already at that grain (post-aggregation), so both sides hash the
same key space; the fill windows then sort per key over at most
|ticks| rows, bounded by the calendar span, never by raw data volume.
At 100 TB the only unbounded input is the pre-aggregation producing
the observations, which is the caller's partial-aggregable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calendar_spine(
    obs: DataFrame,
    key_col: str,
    tick_col: str,
) -> DataFrame:
    """Dense (key, tick) grid over the global observed [min, max].

    ``tick_col`` must be integral (epoch-days, epoch-hours, bucket
    ids): the grid steps by 1. Every key present in ``obs`` spans the
    same global range — the union-calendar convention, so downstream
    cross-key comparisons see aligned frames. One tiny aggregate
    (broadcast) + one distinct over keys; the explode is map-side.
    """
    bounds = obs.agg(
        F.min(tick_col).alias("__lo"), F.max(tick_col).alias("__hi")
    )
    keys = obs.select(key_col).distinct()
    return keys.crossJoin(F.broadcast(bounds)).select(
        key_col,
        F.explode(F.expr("sequence(__lo, __hi)")).alias(tick_col),
    )


def gapfill(
    obs: DataFrame,
    key_col: str,
    tick_col: str,
    val_col: str,
) -> DataFrame:
    """Resample keyed observations onto the dense calendar with
    zero-fill, LOCF, and linear-interpolation columns.

    ``obs`` must be at (key, tick) grain with non-null ``val_col``
    (aggregate first); ticks are integral. Returns one row per spine
    cell: the raw (nullable) observation, ``<val>_zf`` (0 when
    absent), ``<val>_locf`` (last observation at-or-before, null
    before the first), and ``<val>_interp`` (double; the observation
    itself where present, the straight line between neighbouring
    observations in gaps, null outside the observed range).

    Cross-engine determinism: the interpolation is ``prev +
    (next - prev) * dd / nn`` on doubles whose inputs are exact
    integers, evaluated in that literal order — each step is a single
    IEEE-754 op on identical operands in Spark and any ANSI engine,
    so results are bit-identical (the same discipline as the scaled-
    integer centroid means in functions/similarity.py).
    """
    spine = calendar_spine(obs, key_col, tick_col)
    filled = spine.join(obs, [key_col, tick_col], "left")

    wprev = (
        Window.partitionBy(key_col)
        .orderBy(tick_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy(key_col)
        .orderBy(tick_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_tick = F.when(F.col(val_col).isNotNull(), F.col(tick_col))
    prev_v = F.last(val_col, ignorenulls=True).over(wprev)
    prev_t = F.last(obs_tick, ignorenulls=True).over(wprev)
    next_v = F.first(val_col, ignorenulls=True).over(wnext)
    next_t = F.first(obs_tick, ignorenulls=True).over(wnext)

    interp = F.when(
        F.col(val_col).isNotNull(), F.col(val_col).cast("double")
    ).when(
        prev_v.isNotNull() & next_v.isNotNull(),
        prev_v.cast("double")
        + (next_v.cast("double") - prev_v.cast("double"))
        * (F.col(tick_col) - prev_t).cast("double")
        / (next_t - prev_t).cast("double"),
    )

    return filled.select(
        key_col,
        tick_col,
        F.col(val_col),
        F.coalesce(F.col(val_col), F.lit(0)).alias(f"{val_col}_zf"),
        prev_v.alias(f"{val_col}_locf"),
        interp.alias(f"{val_col}_interp"),
    )
