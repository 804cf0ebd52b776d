"""Scale-tier sweep: run the heaviest registry queries at 1x
(driver sf0.1), 3x and 10x (scripts/make_scale_tier.py tiers) and fit
each query's scaling exponent — the measured evidence behind SCALE.md's
100 TB extrapolations (a bucketed/broadcast plan should be ~linear in
rows; materially super-linear exponents get adjudicated there).

Each tier runs through bench.py itself (one subprocess per tier:
fresh JVM, its warmups, GC hygiene, min-of-3) with
SPARK_GRAFT_BENCH_ONLY restricting to the sweep set. Exponent = the
least-squares slope of log(t) over log(scale) across the three
points; r10x = t(10x)/t(1x). Output: SCALE_SWEEP.json + a table on
stdout. Run QUIESCENT — nothing else on the box.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the r12-close heaviest 16 plus the plans the r12 verdict named as
# where super-linear surprises would live (connected components,
# the coreset window/top-n, banded LSH) and q1 as the linear anchor
QUERIES = [
    "cdc_star_view_lineitem", "leakage_safe_split", "ann_topk_ivf_pq",
    "ann_topk_pq", "incremental_dedup", "cdc_minmax_orders",
    "canonical_docs", "hybrid_rrf", "snapshot_diff_orders",
    "cdc_join_view_orders", "snapshot_diff_triaged_orders",
    "q8_market_share", "dq_drift_by_priority", "dedup_clusters",
    "span_dedup_materialize", "q21_sole_blamed_supplier",
    "cluster_representatives", "dedup_minhash_lsh", "q1_pricing_summary",
]

TIERS = [
    ("/root/testdata/sf0.1", 1.0),
    (os.path.join(REPO, "scale_data", "sf0.3"), 3.0),
    (os.path.join(REPO, "scale_data", "sf1"), 10.0),
]


def run_tier(sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=",".join(QUERIES),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        raise SystemExit(f"bench failed at {sf_dir}:\n{out.stderr[-3000:]}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def slope(xs: list[float], ys: list[float]) -> float:
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den


def main() -> None:
    results = {}
    for sf_dir, scale in TIERS:
        if not os.path.isdir(sf_dir):
            raise SystemExit(
                f"{sf_dir} missing — run scripts/make_scale_tier.py first")
        print(f"== tier {scale}x ({sf_dir}) ==", file=sys.stderr)
        rec = run_tier(sf_dir)
        results[scale] = rec
        print(f"   total {rec['value']}s  canary "
              f"{rec['canary']['start_ratio']}/{rec['canary']['end_ratio']}",
              file=sys.stderr)

    scales = [s for _, s in TIERS]
    table = {}
    for q in QUERIES:
        ts = [results[s]["queries"].get(q) for s in scales]
        if any(t is None for t in ts):
            table[q] = {"error": "missing at some tier", "t": ts}
            continue
        table[q] = {
            "t_1x": ts[0], "t_3x": ts[1], "t_10x": ts[2],
            "r10x": round(ts[2] / ts[0], 2),
            "exponent": round(slope(scales, ts), 2),
        }
    payload = {
        "queries": table,
        "tiers": {str(s): {"sf_dir": d, "total": results[s]["value"],
                           "canary": results[s]["canary"]}
                  for d, s in TIERS},
    }
    with open(os.path.join(REPO, "SCALE_SWEEP.json"), "w") as f:
        json.dump(payload, f, indent=1)
    w = max(len(q) for q in QUERIES)
    print(f"{'query':<{w}}  {'1x':>7} {'3x':>7} {'10x':>7} "
          f"{'r10x':>6} {'exp':>5}")
    for q, row in sorted(table.items(), key=lambda kv: -kv[1].get("exponent", 9)):
        if "error" in row:
            print(f"{q:<{w}}  {row['error']}")
            continue
        print(f"{q:<{w}}  {row['t_1x']:>7.3f} {row['t_3x']:>7.3f} "
              f"{row['t_10x']:>7.3f} {row['r10x']:>6.2f} "
              f"{row['exponent']:>5.2f}")


if __name__ == "__main__":
    main()
