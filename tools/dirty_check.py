#!/usr/bin/env python3
"""Dirty-data oracle-parity gate.

The driver's fixtures are clean, so Spark-vs-DuckDB divergences that
only fire on NULLs / malformed JSON stay latent (round 8's hand-picked
11-query probe found and fixed seven such classes; round 9 promoted it
to a FULL gate over every oracle-twinned query). This script
materializes a DIRTY copy of sf0.001 — null event values, malformed
and empty props JSON, null/empty/whitespace-only document text,
supplementary-plane (emoji) text, null document lang, null document
SOURCE (every source-grouped operator must agree with DuckDB on the
NULL group / null-drop law), NEGATIVE event values (refunds — the
floor(x+0.5) rounding convention, cent quantization, and every
integer-fold path must hold below zero on both engines), null customer
balances, null embedding vectors and labels, EXTREME event values
(×1e6 — inside every operator's asserted envelope, stressing the
long/decimal cent paths), PRE-EPOCH timestamps (−60 years → negative
epoch-µs: the floor-vs-truncate division divergence class — every
epoch0-anchored day/week key truncates on BOTH engines, seasonCells
floors on both; mixing the two only surfaces below zero), and
EXACT-DUPLICATE KEY REPLAYS (a replayed upstream producer re-emits
whole event/document/EMBEDDING rows, so ids stop being unique — every
dedup / first-by-id / rank-tiebreak-by-id law, and the ANN/clustering
family's count-weighted centroid and recall math, must treat the
replica identically on both engines), and VALUE-CONFLICT REPLAYS (an
at-least-once producer re-emits the same event key with a MUTATED
value/ts — every last-write-wins / interval / per-id-uniqueness law
must resolve the conflicting twin identically on both engines)
(contract-non-null columns like ids stay clean; ts stays non-null; RAGGED vectors stay out by design — the
in-plan vectorDimGuard refuses them loudly, spec-tested) — runs
graft.Verify on ALL queries against it, and compares every dumped
result to its DuckDB oracle on the same dirty corpus.

Usage:
  python3 tools/check.py --dirty          # the whole gate, one command
  python3 tools/dirty_check.py            # same
  python3 tools/dirty_check.py --build    # corpus only + manual steps

Writes DIRTYCHECK.json (repo root): per-query PASS/SKIP/FAIL plus the
corpus dirt counts — the committed artifact for the round.
"""
import json
import os
import shutil
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
DST = "/tmp/dirty_sf"
OUT = "/tmp/vdirty"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "DIRTYCHECK.json")


def build() -> dict:
    """Materialize the dirty corpus; returns the dirt counts."""
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part", "orders",
              "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    # embeddings dirt: NULL vectors (the ANN family's NULL-vector law
    # must DROP them on both engines — a kept NULL vec hands bucket-0
    # queries NULL-cos neighbors) and NULL labels. Ragged vectors are
    # deliberately NOT generated: the in-plan vectorDimGuard refuses
    # them loudly by contract (spec-tested), so a ragged row would
    # crash every embedding query rather than test a parity law.
    # + exact-duplicate KEY replays (vec_id % 37): the r13 events/docs
    # replica classes never fed the ANN/clustering/centroid family
    # duplicate vectors, and centroid sums, bucket joins, and recall
    # ground truths are exactly the count-weighted math the events
    # replicas broke 16 queries with. The replica copies the already-
    # dirtied row verbatim (a producer replays its dirty payload)
    con.execute(f"""COPY (WITH d AS (SELECT vec_id,
      CASE WHEN vec_id % 29 = 0 THEN NULL ELSE embedding END AS embedding,
      CASE WHEN vec_id % 43 = 0 THEN NULL ELSE label END AS label
      FROM read_parquet('{SRC}/embeddings.parquet'))
      SELECT * FROM d
      UNION ALL SELECT * FROM d WHERE vec_id % 37 = 0)
      TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT c_custkey, c_name, c_nationkey,
      CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
      c_mktsegment FROM read_parquet('{SRC}/customer.parquet'))
      TO '{DST}/customer.parquet' (FORMAT PARQUET)""")
    # extreme magnitudes (x1e6, ~3.3e10 cents) stay INSIDE the dyadic
    # EWMA's asserted envelope (Long.MaxValue >> frameRows=8 ~ 3.6e16)
    # — dirt beyond an operator's contract is refused loudly by design,
    # not parity-tested — while stressing every long/decimal cent path,
    # the KS tick grid, winsorize bounds, and the bootstrap's weighted
    # sums three orders of magnitude past normal traffic
    # pre-epoch timestamps (−60 years → negative epoch-µs): the one
    # dirt class where truncating division (DuckDB // and Spark's div,
    # used by every epoch0-anchored day/week key — both truncate, so
    # they agree) and TRUE floor division (seasonCells' pmod-subtract
    # idiom, mirrored in the q202 twin) give different buckets — a
    # floor on one engine against a trunc on the other only fires at
    # negative ts, which the clean fixtures never produce
    # exact-duplicate KEY replays (event_id % 73 / doc_id % 79): a
    # replayed upstream producer re-emits the SAME row — ids stop being
    # unique, which the clean fixtures (and the other 15 classes, which
    # only mutate values in place) never exercise. Every dedup/
    # first-by-id/rank-by-id law must collapse or carry the replay
    # IDENTICALLY on both engines; the replica copies the already-
    # dirtied row (a producer replays its dirty payload verbatim)
    # + VALUE-CONFLICT replays (event_id % 83): the harder at-least-once
    # producer failure — the SAME key re-appended with a DIFFERENT
    # value/ts (value+1, ts+1s), which verbatim replicas cannot
    # exercise. Every last-write-wins / interval / per-id-uniqueness
    # assumption (CDC merge, SCD2, debounce, snapshot diff, any
    # first-by-id) must resolve the mutated twin identically on both
    # engines. The conflict twin mutates the already-dirtied row, so a
    # NULL value stays NULL (NULL+1) — the conflict is then ts-only
    con.execute(f"""COPY (WITH d AS (SELECT event_id,
      CASE WHEN event_id % 71 = 0 THEN ts - INTERVAL 60 YEAR
           ELSE ts END AS ts, user_id, event_type,
      CASE WHEN event_id % 23 = 0 THEN NULL
           WHEN event_id % 29 = 0 THEN -value
           WHEN event_id % 53 = 0 THEN value * 1000000 ELSE value END AS value,
      CASE WHEN event_id % 31 = 0 THEN '{{not json'
           WHEN event_id % 37 = 0 THEN '' ELSE props END AS props
      FROM read_parquet('{SRC}/events.parquet'))
      SELECT * FROM d
      UNION ALL SELECT * FROM d WHERE event_id % 73 = 0
      UNION ALL SELECT event_id, ts + INTERVAL 1 SECOND, user_id,
        event_type, value + 1, props FROM d WHERE event_id % 83 = 0)
      TO '{DST}/events.parquet' (FORMAT PARQUET)""")
    # text dirt beyond NULL: the empty document and the whitespace-only
    # document — the two shapes a web scrape actually produces (both
    # tokenize to empty-STRING tokens, not to no tokens, in both
    # engines: split('',' ') = [''], split('  ',' ') = ['','',''])
    # supplementary-plane dirt: emoji are the one text class where a
    # per-UTF-16-char hash fold and a per-code-point fold DIVERGE (the
    # polyHashDeclarative caveat) — prepending them to real text proves
    # the native expression and every DuckDB oracle agree outside the
    # BMP, across tokenize/shingle/hash/BM25/stat paths, mechanically
    con.execute(f"""COPY (WITH d AS (SELECT doc_id,
      CASE WHEN doc_id % 41 = 0 THEN NULL
           WHEN doc_id % 47 = 0 THEN ''
           WHEN doc_id % 59 = 0 THEN '  '
           WHEN doc_id % 67 = 0 THEN '\U0001F680\U0001F30D café ' || text
           ELSE text END AS text,
      CASE WHEN doc_id % 53 = 0 THEN NULL
           WHEN doc_id % 61 = 0 THEN '' ELSE lang END AS lang,
      CASE WHEN doc_id % 37 = 0 THEN NULL ELSE source END AS source,
      n_chars FROM read_parquet('{SRC}/documents.parquet'))
      SELECT * FROM d
      UNION ALL SELECT * FROM d WHERE doc_id % 79 = 0)
      TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
    c = con.execute(f"""SELECT
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE value IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE props = '{{not json'),
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE props = ''),
      (SELECT count(*) FROM read_parquet('{DST}/documents.parquet')
        WHERE text IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/documents.parquet')
        WHERE text = ''),
      (SELECT count(*) FROM read_parquet('{DST}/documents.parquet')
        WHERE text = '  '),
      (SELECT count(*) FROM read_parquet('{DST}/documents.parquet')
        WHERE lang = ''),
      (SELECT count(*) FROM read_parquet('{DST}/customer.parquet')
        WHERE c_acctbal IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/documents.parquet')
        WHERE text LIKE '\U0001F680%'),
      (SELECT count(*) FROM read_parquet('{DST}/embeddings.parquet')
        WHERE embedding IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/embeddings.parquet')
        WHERE label IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/documents.parquet')
        WHERE source IS NULL),
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE value < 0),
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE event_id % 53 = 0 AND event_id % 23 <> 0
          AND event_id % 29 <> 0),
      (SELECT count(*) FROM read_parquet('{DST}/events.parquet')
        WHERE epoch_us(ts) < 0),
      (SELECT count(DISTINCT event_id)
        FROM read_parquet('{DST}/events.parquet') WHERE event_id % 73 = 0),
      (SELECT count(*) - count(DISTINCT doc_id)
        FROM read_parquet('{DST}/documents.parquet')),
      (SELECT count(*) - count(DISTINCT vec_id)
        FROM read_parquet('{DST}/embeddings.parquet')),
      (SELECT count(DISTINCT event_id)
        FROM read_parquet('{DST}/events.parquet') WHERE event_id % 83 = 0)""").fetchall()[0]
    counts = {"null_event_values": c[0], "bad_props_json": c[1],
              "empty_props": c[2], "null_doc_text": c[3],
              "empty_doc_text": c[4], "blank_doc_text": c[5],
              "empty_lang": c[6], "null_acctbal": c[7],
              "emoji_doc_text": c[8], "null_embedding": c[9],
              "null_label": c[10], "null_source": c[11],
              "negative_value": c[12], "extreme_value": c[13],
              "pre_epoch_ts": c[14], "dup_event_rows": c[15],
              "dup_doc_rows": c[16], "dup_embedding_rows": c[17],
              "conflict_rows": c[18]}
    print(f"dirty corpus at {DST} {counts}")
    return counts


def main(run: bool = True) -> None:
    counts = build()
    if not run:
        print("next:")
        print(f'  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify {DST} {OUT}"')
        print(f"  python3 tools/check.py {OUT} {DST}")
        return
    shutil.rmtree(OUT, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    print(f"running graft.Verify (ALL queries) on {DST} ...")
    proc = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {DST} {OUT}"],
        cwd=REPO, env=env, capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        print(f"FAIL: sbt runMain graft.Verify exited {proc.returncode}")
        sys.exit(1)
    # Verify logs "[verify] <name> failed: ..." per crashed query; a
    # crashed ROWS-ONLY query writes no result dir and has no oracle,
    # so without this sweep it would vanish from the report entirely
    crashed = sorted(set(
        line.split()[1] for line in (proc.stdout + proc.stderr).splitlines()
        if line.startswith("[verify] ") and " failed: " in line))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check
    _, _, status = check.compare_all(OUT, DST)
    for name in crashed:
        if status.get(name, "").startswith("FAIL"):
            continue                     # already reported by the compare
        status[name] = "FAIL: query crashed on the dirty corpus (rows-only)"
        print(f"FAIL  {name}: crashed on the dirty corpus (rows-only)")
    # counts derive from the FINAL status map (the crash sweep above can
    # flip a compare-PASS to FAIL), so they always agree with `queries`
    n_pass = sum(1 for v in status.values() if v == "PASS")
    n_fail = sum(1 for v in status.values() if v.startswith("FAIL"))
    artifact = {"corpus": DST, "dirt": counts,
                "n_pass": n_pass, "n_fail": n_fail,
                "n_skip": sum(1 for v in status.values() if v == "SKIP"),
                "queries": status}
    with open(ARTIFACT, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"\n{n_pass} pass, {n_fail} fail -> {ARTIFACT}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(run="--build" not in sys.argv[1:])
