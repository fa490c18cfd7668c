#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's correctness gate; NOT part of the
shipped library). Usage:

    python3 scripts/dev_check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir tables, and compares sorted rows/columns."""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame, name: str) -> bool:
    ok = True
    if list(a.columns) != list(b.columns):
        print(f"[{name}] SCHEMA mismatch: spark={list(a.columns)} oracle={list(b.columns)}")
        ok = False
    if len(a) != len(b):
        print(f"[{name}] ROWS mismatch: spark={len(a)} oracle={len(b)}")
        return False
    if not ok:
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # exact compare: both sides round() their outputs, so any residual
            # difference is a real cross-engine drift the driver's hash would
            # also see
            bad = ~(
                (av.isna() & bv.isna())
                | (av.astype(float) == bv.astype(float))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        if bad.any():
            i = bad.idxmax()
            print(f"[{name}] VALUE mismatch col={c} row={i}: spark={av[i]!r} oracle={bv[i]!r} ({int(bad.sum())} rows)")
            ok = False
    if ok:
        print(f"[{name}] OK ({len(a)} rows, {len(a.columns)} cols)")
    return ok


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"[{name}] MISSING spark output")
            n_fail += 1
            continue
        a = norm(pd.read_parquet(spark_dir))
        b = norm(con.sql(sql).df())
        if compare(a, b, name):
            n_ok += 1
        else:
            n_fail += 1
    print(f"== {n_ok} ok / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
