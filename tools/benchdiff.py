#!/usr/bin/env python3
"""Compare two rounds' bench details: common-query geomean + top movers.

Usage: python3 tools/benchdiff.py <prev> <cur> [top_n]

<prev>/<cur> are each one of:
  - a round number (e.g. 12): resolved to the driver's
    "round N: verdict/advice/correctness/bench" commit and that
    commit's BENCH_DETAIL.json revision;
  - WORK: the working-tree BENCH_DETAIL.json (a just-finished local
    bench run);
  - a path to any detail-format JSON file (one line with "queries"
    min-times and optionally "queries_med").

Prints the min-time geomean ratio cur/prev over the COMMON query set
(the judge's canonical round-over-round number — rounds 11-13 all
re-derived it by hand), both totals restricted to that common set, the
top movers in each direction, and the added/removed query names.
Geomean on mins, not medians: the min is the least-noise-contaminated
sample and is what BENCH_rN headlines. Failed queries (-1) are
excluded from the common set, loudly.
"""
import json
import math
import subprocess
import sys

DETAIL = "BENCH_DETAIL.json"


def load(spec: str) -> dict:
    if spec == "WORK":
        return json.load(open(DETAIL))
    if spec.isdigit():
        subject = f"round {int(spec)}: verdict/advice/correctness/bench"
        commit = subprocess.check_output(
            ["git", "log", "--format=%H", "--fixed-strings",
             f"--grep={subject}"], text=True).split()
        if not commit:
            sys.exit(f"no driver commit found for '{subject}'")
        return json.loads(subprocess.check_output(
            ["git", "show", f"{commit[0]}:{DETAIL}"], text=True))
    return json.load(open(spec))


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    prev_spec, cur_spec = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    prev, cur = load(prev_spec), load(cur_spec)
    pq, cq = prev["queries"], cur["queries"]

    failed = sorted(n for n, t in list(pq.items()) + list(cq.items())
                    if t < 0)
    if failed:
        print(f"EXCLUDED (failed, t<0): {failed}")
    common = sorted(n for n in pq.keys() & cq.keys()
                    if pq[n] > 0 and cq[n] > 0)
    if not common:
        sys.exit("no common successfully-timed queries")

    ratios = {n: cq[n] / pq[n] for n in common}
    geomean = math.exp(sum(math.log(r) for r in ratios.values())
                       / len(ratios))
    tp, tc = (sum(q[n] for n in common) for q in (pq, cq))
    print(f"common queries: {len(common)}  "
          f"(prev-only: {len(pq.keys() - cq.keys())}, "
          f"cur-only: {len(cq.keys() - pq.keys())})")
    print(f"min-time geomean ratio cur/prev: {geomean:.3f}")
    print(f"common-set total min: {tp:.3f} -> {tc:.3f} s "
          f"({tc / tp:.3f}x)")

    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    print(f"\ntop {top_n} improvements (ratio, prev -> cur sec):")
    for n, r in movers[:top_n]:
        print(f"  {r:6.3f}  {pq[n]:8.3f} -> {cq[n]:8.3f}  {n}")
    print(f"\ntop {top_n} regressions (ratio, prev -> cur sec):")
    for n, r in reversed(movers[-top_n:]):
        print(f"  {r:6.3f}  {pq[n]:8.3f} -> {cq[n]:8.3f}  {n}")

    added = sorted(cq.keys() - pq.keys())
    removed = sorted(pq.keys() - cq.keys())
    if added:
        print(f"\nadded in cur ({len(added)}):")
        for n in added:
            print(f"  {cq[n]:8.3f}  {n}")
    if removed:
        print(f"\nremoved in cur ({len(removed)}): {removed}")


if __name__ == "__main__":
    main()
