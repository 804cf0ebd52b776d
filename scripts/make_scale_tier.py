"""Synthesize larger scale tiers from the driver's sf0.1 fixtures by
key-shifted unions — the local stand-in for "run it at 10x" that
SCALE.md's measured scaling exponents are computed against.

Each tier is K copies of every scaling table, copy i key-shifted by
i*SHIFT so referential integrity is preserved per copy (orders of
copy i reference customers of copy i, lineitems reference copy-i
orders/parts/suppliers). The fixed-size dims (region, nation) stay
as-is, as in TPC-H. Copy 0 is the identity, so the original data is a
subset of every tier.

Content columns that would otherwise make the copies trivial
duplicates are perturbed deterministically:

- documents.text: every token of copy i>0 gets an ``x<i>`` suffix
  (n_chars recomputed) — per-copy length/token distributions are
  preserved while exact/MinHash/SimHash dedup sees genuinely distinct
  documents (10x data must mean ~10x distinct corpus, or the dedup
  tiers would measure a pathological 90%-duplicate workload instead
  of their scaling exponent);
- embeddings.embedding: copy i>0 is offset by a small deterministic
  per-dimension vector (0.05*sin((i)*(j+1))) — distinct vectors, same
  overall geometry, so ANN cell occupancy scales with the data.

Built with DuckDB (no Spark session needed); ~200 MB for the 10x
tier. Run:  python scripts/make_scale_tier.py [--copies 3 10]
Writes /root/repo/scale_data/sf<K/10>/  (gitignored).
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scale_data")
SHIFT = 10_000_000  # above every sf0.1 key

# table -> list of key columns shifted by i*SHIFT per copy
SHIFTED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def _copy_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    parts = []
    for name, _type in cols:
        expr = name
        if name in SHIFTED[table]:
            expr = f"({name} + {i * SHIFT})"
        elif table == "documents" and name == "text" and i > 0:
            expr = f"regexp_replace(text, '(\\S+)', '\\1x{i}', 'g')"
        elif table == "documents" and name == "n_chars" and i > 0:
            expr = f"length(regexp_replace(text, '(\\S+)', '\\1x{i}', 'g'))"
        elif table == "embeddings" and name == "embedding" and i > 0:
            expr = (
                f"[CAST(embedding[j+1] + 0.05*sin({i}*(j+1)) AS FLOAT) "
                f"for j in range(len(embedding))]"
            )
        parts.append(f"{expr} AS {name}")
    return ", ".join(parts)


def build_tier(copies: int) -> str:
    sf = copies / 10
    out = os.path.join(OUT_ROOT, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    for t in FIXED:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    for t in SHIFTED:
        src = os.path.join(SRC, f"{t}.parquet")
        cols = [
            (r[0], r[1]) for r in
            con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}')")
            .fetchall()
        ]
        selects = [
            f"SELECT {_copy_select(t, cols, i)} "
            f"FROM read_parquet('{src}')"
            for i in range(copies)
        ]
        q = " UNION ALL ".join(selects)
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"  {t}: {n} rows")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, nargs="+", default=[3, 10])
    args = ap.parse_args()
    for k in args.copies:
        print(f"tier x{k}:")
        out = build_tier(k)
        print(f"  -> {out}")


if __name__ == "__main__":
    main()
