#!/usr/bin/env python3
"""Dirty-data oracle-parity probe.

The driver's fixtures are clean, so Spark-vs-DuckDB divergences that
only fire on NULLs / malformed JSON stay latent (round 8 found and
fixed seven such classes). This probe materializes a DIRTY copy of
sf0.001 — null event values, malformed props JSON, null document
text/lang, null customer balances (contract-non-null columns like ids
and ts stay clean) — and checks the null-sensitive query subset
against its oracles on it.

Usage:
  python3 tools/dirty_check.py            # build corpus + print next step
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/dirty_sf /tmp/vdirty <NAMES>"
  python3 tools/check.py /tmp/vdirty /tmp/dirty_sf   # expect: PASS for every dumped query

where <NAMES> is the comma list this script prints.
"""
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.001"
DST = "/tmp/dirty_sf"

# Queries whose semantics touch the injected dirt — extend when a new
# operator grows null-dependent behavior.
NAMES = ("q24,q26,q29,q41,q46,q139,q92,q142,q131,q152,q39")

def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part", "orders",
              "embeddings", "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    con.execute(f"""COPY (SELECT c_custkey, c_name, c_nationkey,
      CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
      c_mktsegment FROM read_parquet('{SRC}/customer.parquet'))
      TO '{DST}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT event_id, ts, user_id, event_type,
      CASE WHEN event_id % 23 = 0 THEN NULL ELSE value END AS value,
      CASE WHEN event_id % 31 = 0 THEN '{{not json' ELSE props END AS props
      FROM read_parquet('{SRC}/events.parquet'))
      TO '{DST}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT doc_id,
      CASE WHEN doc_id % 41 = 0 THEN NULL ELSE text END AS text,
      CASE WHEN doc_id % 53 = 0 THEN NULL ELSE lang END AS lang,
      source, n_chars FROM read_parquet('{SRC}/documents.parquet'))
      TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
    counts = con.execute(f"""SELECT
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE value IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE props = '{{not json'),
      (SELECT count(*) FROM read_parquet('{DST}/documents.parquet')
        WHERE text IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/customer.parquet')
        WHERE c_acctbal IS NULL)""").fetchall()[0]
    print(f"dirty corpus at {DST} "
          f"(null values={counts[0]}, bad json={counts[1]}, "
          f"null text={counts[2]}, null acctbal={counts[3]})")
    print("next:")
    print(f'  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify {DST} /tmp/vdirty {NAMES}"')
    print(f"  python3 tools/check.py /tmp/vdirty {DST}")
    print("expect: PASS for every dumped query "
          "(non-dumped oracles report as FAIL noise — ignore)")

if __name__ == "__main__":
    main()
