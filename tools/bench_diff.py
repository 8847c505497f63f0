#!/usr/bin/env python3
"""Compare two bench dumps (BENCH_FULL.json shape) query by query.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold]

Prints the headline totals, then every query whose MIN moved more than
`threshold` (default 0.15 = 15%) in either direction, with both median
and min deltas. Medians on a contended box lie; `queries_min` is the
noise-robust statistic (see COVERAGE.md's jitter adjudications) — that
is why regressions/improvements are keyed on min, with the median shown
alongside for contention context.
"""
import json
import sys

old_path, new_path = sys.argv[1], sys.argv[2]
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
def load(p):
    d = json.load(open(p))
    # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
    # (and its headline truncates to the top queries — prefer BENCH_FULL
    # dumps when both rounds have them)
    d = d.get("parsed", d) if "queries" not in d else d
    # drop Bench's -1.0 zero-success sentinels (under *_error keys):
    # they are markers, not timings, and would corrupt sums and ratios
    for k in ("queries", "queries_min"):
        if k in d:
            d[k] = {q: v for q, v in d[k].items() if v >= 0}
    return d

old = load(old_path)
new = load(new_path)

o_med, n_med = old.get("queries", {}), new.get("queries", {})
o_min, n_min = old.get("queries_min", o_med), new.get("queries_min", n_med)
for label, dump in (("old", old), ("new", new)):
    if "queries_min" not in dump:
        print(f"WARNING: {label} dump has no queries_min — its 'min' "
              "column below is actually MEDIANS (pre-r12 dump?)")

print(f"total median: {old.get('value')} -> {new.get('value')}   "
      f"min-sum: {old.get('value_min', round(sum(o_min.values()), 3))} -> "
      f"{new.get('value_min', round(sum(n_min.values()), 3))}")

rows = []
for q in sorted(set(o_min) & set(n_min)):
    a, b = o_min[q], n_min[q]
    if a <= 0:
        continue
    ratio = b / a
    if abs(ratio - 1.0) > threshold:
        rows.append((ratio, q, a, b, o_med.get(q), n_med.get(q)))

for ratio, q, a, b, ma, mb in sorted(rows, reverse=True):
    tag = "SLOWER" if ratio > 1 else "faster"
    print(f"  {q:28s} min {a:7.3f} -> {b:7.3f}  ({ratio:5.2f}x {tag})"
          f"   median {ma} -> {mb}")

only_old = sorted(set(o_min) - set(n_min))
only_new = sorted(set(n_min) - set(o_min))
if only_old:
    print("removed:", ", ".join(only_old))
if only_new:
    print("added:  ", ", ".join(only_new))
if not rows:
    print(f"  no per-query min moved more than {threshold:.0%}")
