#!/usr/bin/env python3
"""Diagnose one query's Spark-vs-oracle divergence on a corpus.

Usage: python3 tools/diffq.py <query_name> [out_dir] [sf_dir] [limit]

Loads the Spark dump from <out_dir>/<name>/ and runs the oracle SQL
from <out_dir>/oracle_sql.json against <sf_dir>'s parquet tables, then
prints the two EXCEPT ALL directions — the row-level counterpart of
tools/check.py's positional compare, for working out WHY a gate row
failed rather than just THAT it failed.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vdirty"
    sf = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dirty_sf"
    limit = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    sql = json.load(open(f"{out}/oracle_sql.json"))[name]
    con.execute(f"CREATE TABLE o AS {sql}")
    con.execute(
        f"CREATE TABLE s AS SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    ns, no = (con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
              for t in ("s", "o"))
    print(f"rows: spark={ns} oracle={no}")
    print("spark-only rows:")
    print(con.execute(
        f"SELECT * FROM s EXCEPT ALL SELECT * FROM o LIMIT {limit}").fetchdf())
    print("oracle-only rows:")
    print(con.execute(
        f"SELECT * FROM o EXCEPT ALL SELECT * FROM s LIMIT {limit}").fetchdf())


if __name__ == "__main__":
    main()
