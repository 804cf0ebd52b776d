"""As-of and range joins — operators Spark lacks natively, composed
from built-ins (preference (a) of the custom-operator ladder; no UDF).

**As-of join** (backward, per key): for each left row, the latest right
row with ``right.ts <= left.ts``. Implemented as the union-window
composition: tag both sides, sort within key by (ts, side), and carry
the last right-image forward with ``last(..., ignorenulls=True)``.
One shuffle on the key — same cost as the theoretical native operator;
no per-group pandas (``merge_asof``) needed, so it scales with the
window operator itself.

**Range join**: value-in-[lo,hi) against an interval table. Naive form
is a broadcast-nested-loop; the scale form maps both sides onto coarse
buckets (interval exploded to every bucket it overlaps) -> equi join on
the bucket + residual filter. Bucket width trades replication factor
against join selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left rows + the latest right row at-or-before their timestamp.

    Ties (equal ts) match, like ASOF semantics (>=). Right columns come
    back prefixed; unmatched left rows keep nulls.
    """
    r_struct = F.struct(*[F.col(c) for c in right.columns]).alias("__r")
    tagged_r = right.select(F.col(key).alias("__k"), F.col(ts).alias("__ts"), r_struct)
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    tagged_l = left.select(F.col(key).alias("__k"), F.col(ts).alias("__ts"), l_struct)

    unioned = tagged_r.withColumn("__l", F.lit(None).cast(tagged_l.schema["__l"].dataType)) \
        .unionByName(tagged_l.withColumn("__r", F.lit(None).cast(tagged_r.schema["__r"].dataType)))

    # right rows sort before left rows at equal ts so ties match
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__l").isNotNull().cast("int"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__l").isNotNull()).select(
        "__l.*",
        *[F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in right.columns],
    )
    return out


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 25.0,
) -> DataFrame:
    """facts ⋈ intervals ON lo <= value < hi, as bucket-equi + residual.

    The interval side replicates once per coarse bucket it overlaps —
    bounded fan-out — and the join becomes a plain hash join on the
    bucket id; Catalyst broadcasts the (small) exploded interval side.
    """
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    fx = facts.withColumn("__bucket", F.floor(F.col(value_col) / bucket_width).cast("long"))
    return (
        fx.join(F.broadcast(iv), "__bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
