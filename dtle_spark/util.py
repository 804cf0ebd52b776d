"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Frames the optimizer cannot size (LogicalRDD without stats) report
# sizeInBytes = spark.sql.defaultSizeInBytes = Long.MaxValue; treat
# anything in that region as "unknown".
_UNKNOWN_SIZE = 1 << 62


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for CPU-heavy per-row work.

    A small parquet file arrives as one split — and a small aggregate
    output is coalesced by AQE to one or two partitions — either of
    which would serialize every downstream expression (hashing,
    shingling, vector math) onto a single core. One cheap shuffle of
    the narrow frame fixes that. No-op when the frame is big enough
    that the scan splitter / AQE already yields at least the target
    partition count — at real scale this never triggers.

    Sizing reads the OPTIMIZER'S statistics (r15), not
    ``df.rdd.getNumPartitions()``: accessing ``.rdd`` on an
    AQE-planned frame finalizes the adaptive plan, which EXECUTES
    every upstream shuffle stage at plan-construction time — measured
    at ~0.5 s per post-aggregation probe on the bench tier (the
    stages are later reused, so at cluster scale the probe costs
    little extra work, but it still serializes plan construction and
    schedules extra job rounds). The stats probe is ~1 ms, runs no
    jobs, and decides the same way at both ends of the scale:
    estimated size below (target partitions x advisory partition
    size) means AQE would leave fewer than `target` partitions, so
    repartition; above it, the frame already carries enough
    parallelism. Frames with no usable estimate (checkpointed RDDs)
    fall back to the partition-count probe, which is cheap exactly
    there (no upstream AQE stages to force).
    """
    sess = df.sparkSession
    target = min_partitions or sess.sparkContext.defaultParallelism
    try:
        jplan = df._jdf.queryExecution().optimizedPlan()
        size = int(jplan.stats().sizeInBytes())
    except Exception:
        jplan, size = None, None
    if size is None or size >= _UNKNOWN_SIZE:
        if df.rdd.getNumPartitions() >= target:
            return df
        return df.repartition(target)
    # 64 MiB = AQE's default advisory partition size; the threshold
    # only needs the right order of magnitude (is this frame going to
    # coalesce below `target` partitions?), not the live conf value
    advisory = 64 * 1024 * 1024
    if size < target * advisory:
        # ADVICE r15: a small size ESTIMATE on a frame that already
        # carries >= target partitions (a repartition below some
        # narrow ops) would add a redundant Exchange — skip when the
        # plan itself proves the parallelism, without finalizing AQE
        if _plan_repartitioned(jplan, target):
            return df
        return df.repartition(target)
    return df


def _plan_repartitioned(jplan, target: int, max_depth: int = 8) -> bool:
    """True when the optimized logical plan is an explicit repartition
    to >= target partitions under only narrow per-row ops (Project /
    Filter / Generate and friends preserve their child's partitioning).
    A pure plan inspection — no jobs, no AQE finalization (the .rdd
    trap spread() exists to avoid)."""
    narrow = {"Project", "Filter", "Generate", "SubqueryAlias"}
    try:
        for _ in range(max_depth):
            name = jplan.getClass().getSimpleName()
            if name in ("Repartition", "RepartitionByExpression"):
                return int(jplan.numPartitions()) >= target
            if name in narrow:
                jplan = jplan.children().head()
                continue
            return False
    except Exception:
        return False
    return False
