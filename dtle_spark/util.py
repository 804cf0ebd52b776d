"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for CPU-heavy per-row work.

    A small parquet file arrives as one split, which would serialize
    every downstream expression (hashing, shingling, vector math) onto
    a single core. One cheap shuffle of the narrow input fixes that.
    No-op when the input is already parallel enough — at real scale the
    scan has thousands of splits and this never triggers.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
