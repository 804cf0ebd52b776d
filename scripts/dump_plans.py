"""Dump `.explain("formatted")` for named registry queries to files.

Usage:
    python scripts/dump_plans.py OUT_DIR SUFFIX name [name ...]

writes OUT_DIR/<name>_<SUFFIX>.txt for each query — the plan-evidence
artifact the optimization rounds commit (plans/r16/<q>_{before,after}.txt).
Run from the repo whose tree you want the plan OF (a worktree checked out
at the pre-change commit produces the `before` files).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dtle_spark.queries import REGISTRY
    from dtle_spark.session import get_spark

    spark = get_spark()
    os.makedirs(out_dir, exist_ok=True)
    import contextlib
    import io

    for name in names:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
