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

# Canary gate (r18 lesson): the host drifts through multi-hour slowdown
# windows (1.4-2.7x on untouched queries). A record captured in one
# would bake that slack into every floor and blind the next rounds'
# regression adjudication. sketch_approx is the canary — a plain
# lineitem aggregate untouched since r13: if its min in the candidate
# record reads more than CANARY_MAX_RATIO x its CURRENT floor, the
# window was contended; re-run the bench later instead of forcing.
#
# Median gate (r19 lesson): a single canary can scrape under 1.3x by
# luck while the window is still hot (r19: merged canary 1.297 with a
# MEDIAN shared ratio of 1.276 and six untouched queries over 2x). The
# median over all shared floor queries is robust to a handful of real
# regressions (those move the tail, not the median) but catches
# box-wide slowness cold — a quiet window reads ~1.0.
CANARY = "sketch_approx"
CANARY_MAX_RATIO = 1.3
MEDIAN_MAX_RATIO = 1.15

args = [a for a in sys.argv[1:] if a != "--force"]
force = "--force" in sys.argv
if len(args) != 2:
    sys.exit("usage: update_floors.py [--force] <BENCH_FULL.json> <round-number>")
src, rnd = args[0], int(args[1])
d = load(src)
qm = d.get("queries_min", {})
if not qm:
    sys.exit(f"{src} has no usable queries_min")

dst_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_FLOORS.json")
canary_ratio = None
median_ratio = None
if os.path.exists(dst_path):
    old = json.load(open(dst_path)).get("queries_min", {})
    if CANARY in old and CANARY in qm and old[CANARY] > 0:
        canary_ratio = round(qm[CANARY] / old[CANARY], 3)
        if canary_ratio > CANARY_MAX_RATIO and not force:
            sys.exit(f"CANARY GATE: {CANARY} min {qm[CANARY]}s is "
                     f"{canary_ratio}x its floor {old[CANARY]}s "
                     f"(> {CANARY_MAX_RATIO}x) — contended window; re-run "
                     f"the bench on a quiet box (--force to override)")
    shared = [q for q in qm if q in old and old[q] > 0]
    if shared:
        import statistics
        median_ratio = round(statistics.median(
            qm[q] / old[q] for q in shared), 3)
        if median_ratio > MEDIAN_MAX_RATIO and not force:
            sys.exit(f"MEDIAN GATE: median min-ratio over {len(shared)} "
                     f"shared queries is {median_ratio}x "
                     f"(> {MEDIAN_MAX_RATIO}x) — box-wide slowness; "
                     f"re-run the bench on a quiet box (--force to override)")
# Ratchet + drop-warning (r19 ADVICE): floors were previously replaced
# wholesale with the candidate's queries_min, so (a) a query missing
# from the candidate (renamed, errored, sentinel-filtered) silently
# lost its floor, and (b) a per-query regression that slipped past the
# box-wide gates became the new, slower floor. Accepted rounds can now
# only TIGHTEN floors they share with the old file — min(old, new) —
# unless --force (a deliberate re-base, e.g. after a sustained host
# slowdown is adjudicated as the new reality) takes the candidate
# verbatim. Dropped keys always warn; they are never silent.
if os.path.exists(dst_path):
    old = json.load(open(dst_path)).get("queries_min", {})
    dropped = sorted(q for q in old if q not in qm)
    if dropped:
        print(f"WARNING: {len(dropped)} floor key(s) absent from the "
              f"candidate record (renamed/errored/sentinel?): "
              f"{', '.join(dropped)}")
        if not force:
            # r20 ADVICE: a transiently-errored query must KEEP its
            # regression baseline — dropped keys carry their old floors
            # forward by default; only --force (a deliberate re-base /
            # genuine rename cleanup) actually removes them.
            for q in dropped:
                qm[q] = old[q]
            print(f"carried {len(dropped)} dropped floor(s) forward "
                  f"(--force removes them)")
    if not force:
        loosened = sorted(q for q in qm if q in old and qm[q] > old[q])
        if loosened:
            print(f"ratcheting {len(loosened)} floor(s) the candidate "
                  f"read slower than (kept old min): "
                  f"{', '.join(loosened[:10])}"
                  f"{'...' if len(loosened) > 10 else ''}")
        qm = {q: (min(v, old[q]) if q in old else v) for q, v in qm.items()}

out = {
    "accepted_round": rnd,
    "source": f"{os.path.basename(src)} (round {rnd}, cache-isolated)",
    "sf": d.get("sf"),
    "canary": CANARY,
    "canary_ratio_vs_previous_floor": canary_ratio,
    "median_ratio_vs_previous_floor": median_ratio,
    "queries_min": qm,
}
json.dump(out, open(dst_path, "w"), indent=2, sort_keys=True)
print(f"wrote {dst_path}: {len(qm)} queries, "
      f"min-sum {round(sum(qm.values()), 2)}s, "
      f"canary ratio {canary_ratio}, median ratio {median_ratio}")
