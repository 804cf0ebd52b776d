"""Maintained-store scaling: drive CorpusIngestJob as a LONG stream at
1x (sf0.1: 5k docs = 10 batches of 500) and 10x (scale tier: 50k docs
= 100 batches of 500) and record EVERY batch's wall time.

The claim under test (corpus_ingest.py module header): an increment
costs O(increment) hashing plus index equi-joins against the stored
dedup index — history is never re-hashed — and auto_compact_segments
bounds read amplification over any stream length. If that holds, the
per-batch cost stays ~flat as the corpus grows 10x and the tail of a
100-batch stream prices like its head (modulo the amortized
compaction spikes, reported separately).

Output: SCALE_MAINTAINER.json {tier: {batch_times, compactions,
head_mean, tail_mean}} + a summary line per tier. Run QUIESCENT.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH_ROWS = 500

TIERS = {
    "1x": "/root/testdata/sf0.1",
    "10x": os.path.join(REPO, "scale_data", "sf1"),
}


def run_tier(spark, name: str, sf_dir: str, work: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from dtle_spark.sinks.manifest import TableManifest
    from dtle_spark.streaming.corpus_ingest import (
        SCHEMA_NAME, TABLE_NAME, CorpusIngestJob,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rn = F.row_number().over(Window.orderBy("doc_id")) - 1
    staged = os.path.join(work, "batches")
    (
        docs.withColumn("__b", (rn / BATCH_ROWS).cast("long"))
        .repartition("__b").write.partitionBy("__b")
        .mode("overwrite").parquet(staged)
    )
    n_batches = len([d for d in os.listdir(staged) if d.startswith("__b=")])

    job = CorpusIngestJob(
        spark, os.path.join(work, "unused-src", "*"),
        os.path.join(work, "tgt"), os.path.join(work, "ckpt"),
        auto_compact_segments=16,
    )
    times, seg_counts = [], []
    for b in range(n_batches):
        batch = spark.read.parquet(
            os.path.join(staged, f"__b={b}")).localCheckpoint()
        t0 = time.perf_counter()
        job.apply_batch(batch, b)
        times.append(round(time.perf_counter() - t0, 3))
        m = TableManifest.load(job.target.path(SCHEMA_NAME, TABLE_NAME))
        seg_counts.append(len(m.entries) if m else 0)
        print(f"  {name} batch {b}: {times[-1]:.3f}s "
              f"segs={seg_counts[-1]}", file=sys.stderr)
    head = times[: max(3, len(times) // 10)]
    tail = times[-max(3, len(times) // 10):]
    out = {
        "n_batches": n_batches,
        "batch_rows": BATCH_ROWS,
        "corpus_rows": job.corpus().count(),
        "batch_times": times,
        "segment_counts": seg_counts,
        "head_mean": round(sum(head) / len(head), 3),
        "tail_mean": round(sum(tail) / len(tail), 3),
        "total": round(sum(times), 2),
    }
    print(f"{name}: {n_batches} batches, head {out['head_mean']}s "
          f"tail {out['tail_mean']}s total {out['total']}s "
          f"(tail/head {out['tail_mean']/out['head_mean']:.2f})")
    return out


def run_join_tier(
    spark, name: str, sf_dir: str, work: str, n_batches: int,
) -> dict:
    """JoinViewMaintainJob (the KEYED maintained store): seed the full
    orders x customer view, then stream `n_batches` of 500 fact
    UPDATES with auto_compact_batches=8. The claim under test: O(delta)
    per-batch WRITES with merge-on-read fold cost bounded by the
    compaction constant — per-batch time must stay flat over stream
    age; it may scale with the VIEW mass (the fold reads base +
    bounded segments), which the 1x-vs-10x comparison prices."""
    from pyspark.sql import functions as F

    from dtle_spark.model import change_schema
    from dtle_spark.operators.join_view import join_view_of
    from dtle_spark.streaming.join_maintain import JoinViewMaintainJob

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet"))
    dim_dir = os.path.join(work, "dim")
    customer.write.mode("overwrite").parquet(dim_dir)
    dim_cols = {"c_name": "cust_name", "c_mktsegment": "cust_seg"}

    job = JoinViewMaintainJob(
        spark, os.path.join(work, "unused-src", "*"), dim_dir,
        os.path.join(work, "view"), os.path.join(work, "ckpt"),
        key_cols=["o_orderkey"], fk="o_custkey", right_pk="c_custkey",
        right_cols=dim_cols,
        schema=change_schema(orders.schema),
        auto_compact_batches=8,
    )
    job.seed(
        join_view_of(orders, customer, "o_custkey", "c_custkey", dim_cols),
        spark.read.parquet(dim_dir),
    )

    row = F.struct(*[F.col(c) for c in orders.columns])
    bumped = F.struct(*[
        (F.col(c) + 1).alias(c) if c == "o_totalprice" else F.col(c)
        for c in orders.columns
    ])
    times = []
    for b in range(n_batches):
        batch = (
            orders.filter(F.col("o_orderkey") % n_batches == b)
            .limit(500)
            .select(
                F.lit("55555555-5555-5555-5555-555555555555").alias("sid"),
                F.col("o_orderkey").alias("gno"),
                F.col("o_orderkey").alias("seq"),
                F.lit(0).cast("long").alias("lc"),
                F.lit("u").alias("op"),
                F.lit(None).cast("timestamp").alias("ts"),
                F.lit("db1").alias("schema_name"),
                F.lit("orders").alias("table_name"),
                row.alias("before"),
                bumped.alias("after"),
                F.lit(None).cast("string").alias("query"),
            )
            .localCheckpoint()
        )
        t0 = time.perf_counter()
        job.apply_batch(batch, b)
        times.append(round(time.perf_counter() - t0, 3))
        print(f"  join {name} batch {b}: {times[-1]:.3f}s",
              file=sys.stderr)
    head = times[: max(3, len(times) // 10)]
    tail = times[-max(3, len(times) // 10):]
    out = {
        "n_batches": n_batches,
        "batch_rows": 500,
        "view_rows": job.view().count(),
        "batch_times": times,
        "head_mean": round(sum(head) / len(head), 3),
        "tail_mean": round(sum(tail) / len(tail), 3),
        "total": round(sum(times), 2),
    }
    print(f"join {name}: {n_batches} batches, head {out['head_mean']}s "
          f"tail {out['tail_mean']}s total {out['total']}s "
          f"(tail/head {out['tail_mean']/out['head_mean']:.2f})")
    return out


def main() -> None:
    from dtle_spark.session import get_spark

    spark = get_spark("scale_maintainer")
    out_path = os.path.join(REPO, "SCALE_MAINTAINER.json")
    try:
        with open(out_path) as f:
            results = json.load(f)
    except (OSError, ValueError):
        results = {}
    which = sys.argv[1] if len(sys.argv) > 1 else "corpus"
    if which in ("corpus", "all"):
        for name, sf_dir in TIERS.items():
            work = os.path.join(REPO, "scale_data", f"_maint_{name}")
            shutil.rmtree(work, ignore_errors=True)
            os.makedirs(work)
            results[name] = run_tier(spark, name, sf_dir, work)
            shutil.rmtree(work, ignore_errors=True)
    if which in ("join", "all"):
        for name, sf_dir in TIERS.items():
            n = 20 if name == "1x" else 60
            work = os.path.join(REPO, "scale_data", f"_jmaint_{name}")
            shutil.rmtree(work, ignore_errors=True)
            os.makedirs(work)
            results[f"join_{name}"] = run_join_tier(
                spark, name, sf_dir, work, n)
            shutil.rmtree(work, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
