#!/usr/bin/env python3
"""Regenerate BENCH_FLOORS.json from an ACCEPTED round's bench dump.

Usage: python3 tools/update_floors.py <BENCH_FULL.json> <round-number>

Run this only when a round is accepted as the new reference (its floors
verified quiet-box, per COVERAGE.md's adjudication methodology) — the
floor file is the default old side of bench_diff.py, so refreshing it
from a contended or unreviewed run would silently loosen every future
adjudication. Floors are the accepted round's `queries_min` verbatim:
the adjudication happens before acceptance, not inside this script.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_diff import load  # shared dump-unwrap + sentinel filter

if len(sys.argv) != 3:
    sys.exit("usage: update_floors.py <BENCH_FULL.json> <round-number>")
src, rnd = sys.argv[1], int(sys.argv[2])
d = load(src)
qm = d.get("queries_min", {})
if not qm:
    sys.exit(f"{src} has no usable queries_min")
out = {
    "accepted_round": rnd,
    "source": f"{os.path.basename(src)} (round {rnd}, cache-isolated)",
    "sf": d.get("sf"),
    "queries_min": qm,
}
dst = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_FLOORS.json")
json.dump(out, open(dst, "w"), indent=2, sort_keys=True)
print(f"wrote {dst}: {len(qm)} queries, min-sum {round(sum(qm.values()), 2)}s")
