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

def compare_all(out_dir: str, sf_dir: str):
    """Compare every dumped query against its oracle; returns
    (n_pass, n_fail, per-query {name: "PASS"|"SKIP"|"FAIL: why"})."""
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    status = {}
    result_dirs = {p.name for p in out.iterdir() if p.is_dir()}
    # a query whose Spark side crashed writes no result dir — that must
    # FAIL here, not silently vanish from the comparison
    def fail(name, why):
        nonlocal n_fail
        print(f"FAIL  {name}: {why}")
        status[name] = f"FAIL: {why}"
        n_fail += 1
    for name in sorted(set(oracles) - result_dirs):
        fail(name, "oracle present but no Spark result (query crashed?)")
    for name in sorted(result_dirs):
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name}: no oracle (rows-only check)")
            status[name] = "SKIP"
            continue
        try:
            spark_df = pq.read_table(str(out / name)).to_pandas()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            fail(name, f"exec error: {e}")
            continue
        try:
            a, b = norm(spark_df), norm(duck_df)
        except Exception as e:
            fail(name, f"normalize error: {e}")
            continue
        if list(a.columns) != list(b.columns):
            fail(name, f"columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            fail(name, f"rows {len(a)} vs {len(b)}")
            continue
        bad = []
        try:
            compare_columns(a, b, bad)
        except Exception as e:
            bad.append(f"compare error: {e}")
        if bad:
            fail(name, "; ".join(bad))
        else:
            print(f"PASS  {name} ({len(a)} rows)")
            status[name] = "PASS"
            n_pass += 1
    return n_pass, n_fail, status

def main(out_dir: str, sf_dir: str) -> None:
    n_pass, n_fail, _ = compare_all(out_dir, sf_dir)
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    if "--dirty" in sys.argv[1:]:
        # full dirty-data gate: delegate to dirty_check (build corpus,
        # run graft.Verify on EVERY query, compare, write artifact).
        # Checked before the positional branch so `--dirty <anything>`
        # errors as usage, not as a read of a directory named --dirty
        if len(sys.argv) != 2:
            print(__doc__)
            print("  --dirty takes no other arguments "
                  "(the gate owns its corpus and output paths)")
            sys.exit(2)
        import dirty_check
        dirty_check.main(run=True)
    elif len(sys.argv) == 3:
        main(sys.argv[1], sys.argv[2])
    else:
        print(__doc__)
        print("  or: python3 tools/check.py --dirty   (full dirty-data gate)")
        sys.exit(2)
