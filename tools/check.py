#!/usr/bin/env python3
"""Local pre-flight replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet result (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the sf_dir
parquet tables, then compares: column names (sorted), row counts, and values
(rows sorted, exact for ints/strings, tiny-epsilon report for floats so we
can see how close we are if not bit-equal).
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(out_dir: str, sf_dir: str) -> None:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(p.name for p in out.iterdir() if p.is_dir()):
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name}: no oracle (rows-only check)")
            continue
        try:
            spark_df = pq.read_table(str(out / name)).to_pandas()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: exec error: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype("float64"); bv = bv.astype("float64")
                neq = ~((av == bv) | (av.isna() & bv.isna()))
                if neq.any():
                    diffs = (av[neq] - bv[neq]).abs()
                    bad.append(f"{c}: {int(neq.sum())} diffs, max {diffs.max():.3e}")
            else:
                try:
                    eq = (av.astype(str) == bv.astype(str))
                except Exception:
                    eq = av == bv
                if not eq.all():
                    i = (~eq).idxmax()
                    bad.append(f"{c}: {int((~eq).sum())} diffs, e.g. {av[i]!r} vs {bv[i]!r}")
        if bad:
            print(f"FAIL  {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
