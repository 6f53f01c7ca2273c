#!/usr/bin/env python3
"""Local pre-flight replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet result (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the sf_dir
parquet tables, then compares: column names (sorted), row counts, and values.
Comparison is deliberately EXACT (graft engineers bit-equality via portable
rounding/variance/hash rules — see Queries.scala); float columns report the
max absolute diff on mismatch so near-misses are visible. Rows are sorted
with floats rounded to 9 decimals as sort keys so ulp-level engine noise
cannot misalign the positional compare.
"""
import json, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    sort_keys = {}
    for c in df.columns:
        sort_keys[c] = df[c].round(9) if df[c].dtype.kind == "f" else df[c]
    order = pd.DataFrame(sort_keys).sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)

def compare_columns(a: pd.DataFrame, b: pd.DataFrame, bad: list) -> None:
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
                # nulls arrive as None from parquet/pandas and NaN from
                # duckdb.fetchdf; the string compare would call them
                # different ('None' != 'nan') — treat all-null as equal
                eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            except Exception:
                eq = av == bv
            if not eq.all():
                i = (~eq).idxmax()
                bad.append(f"{c}: {int((~eq).sum())} diffs, e.g. {av[i]!r} vs {bv[i]!r}")

def main(out_dir: str, sf_dir: str) -> None:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    result_dirs = {p.name for p in out.iterdir() if p.is_dir()}
    # a query whose Spark side crashed writes no result dir — that must
    # FAIL here, not silently vanish from the comparison
    for name in sorted(set(oracles) - result_dirs):
        print(f"FAIL  {name}: oracle present but no Spark result (query crashed?)")
        n_fail += 1
    for name in sorted(result_dirs):
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
        try:
            a, b = norm(spark_df), norm(duck_df)
        except Exception as e:
            print(f"FAIL  {name}: normalize error: {e}")
            n_fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = []
        try:
            compare_columns(a, b, bad)
        except Exception as e:
            bad.append(f"compare error: {e}")
        if bad:
            print(f"FAIL  {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
