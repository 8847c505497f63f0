#!/usr/bin/env python3
"""Compare two bench dumps (BENCH_FULL.json shape) query by query.

Usage: python3 tools/bench_diff.py [old.json] <new.json> [threshold]

With a single dump argument, the old side defaults to the checked-in
quiet-box floor set `BENCH_FLOORS.json` (the accepted round's
`queries_min`), so routine adjudications compare against the accepted
floor rather than the previous — possibly contended — round.

Prints the headline totals, then every query whose MIN moved more than
`threshold` (default 0.15 = 15%) in either direction, with both median
and min deltas. Medians on a contended box lie; `queries_min` is the
noise-robust statistic (see COVERAGE.md's jitter adjudications) — that
is why regressions/improvements are keyed on min, with the median shown
alongside for contention context.

Headline sums are recomputed uniformly from the sentinel-filtered
per-query maps on BOTH sides (never mixed with dump-stored totals,
which predate the filter); the dump-stored totals are printed on a
separate line when present, for cross-reference.

Import-safe: `load()` is shared with tools/update_floors.py, so the
dump-unwrap and sentinel-filter rules live in exactly one place.
"""
import json
import math
import os
import sys


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


def main(argv):
    # an existing file is always a file, even if its name parses as a
    # float. A missing path must FAIL BY NAME, never be silently consumed:
    # a non-numeric typo would otherwise reach json.load's raw traceback,
    # and a numeric-looking typo would silently become the threshold (with
    # the old side then silently defaulting to the floors file). So a
    # numeric argument counts as the threshold only when at least one real
    # file argument accompanies it.
    usage = "usage: bench_diff.py [old.json] <new.json> [threshold]"
    threshold = 0.15
    files, numerics = [], []
    for a in argv:
        if os.path.exists(a):
            files.append(a)
        else:
            try:
                numerics.append(float(a))
            except ValueError:
                sys.exit(f"bench_diff.py: no such file: {a}\n{usage}")
    if numerics and not files:
        sys.exit("bench_diff.py: no dump file given — numeric argument(s) "
                 f"{numerics} look like a mistyped path, not a threshold\n"
                 f"{usage}")
    if len(numerics) > 1:
        sys.exit(f"bench_diff.py: more than one threshold given: {numerics}\n"
                 f"{usage}")
    if numerics:
        # nan/inf/negative parse as floats but degenerate the comparison
        # (abs(ratio-1) > nan is False for EVERY query — a silently
        # toothless adjudication); only a finite non-negative value is a
        # usable threshold
        if not math.isfinite(numerics[0]) or numerics[0] < 0:
            sys.exit("bench_diff.py: threshold must be finite and "
                     f"non-negative, got {numerics[0]}\n{usage}")
        threshold = numerics[0]
    if len(files) == 1:
        floors = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_FLOORS.json")
        files = [floors] + files
        print(f"(old side defaulted to accepted floors: {floors})")
    if len(files) != 2:
        sys.exit(usage)
    old_path, new_path = files

    old = load(old_path)
    new = load(new_path)

    o_med, n_med = old.get("queries", {}), new.get("queries", {})
    o_min = old.get("queries_min", o_med)
    n_min = new.get("queries_min", n_med)
    for label, dump in (("old", old), ("new", new)):
        if "queries_min" not in dump:
            print(f"WARNING: {label} dump has no queries_min — its 'min' "
                  "column below is actually MEDIANS (pre-r12 dump?)")

    def fmt_sum(m):
        return round(sum(m.values()), 3) if m else None

    # both headline columns computed the same way: sums over the filtered
    # per-query maps (dump-stored 'value'/'value_min' predate the filter)
    print(f"total median-sum: {fmt_sum(o_med)} -> {fmt_sum(n_med)}   "
          f"min-sum: {fmt_sum(o_min)} -> {fmt_sum(n_min)}")
    stored = [old.get("value"), new.get("value"),
              old.get("value_min"), new.get("value_min")]
    if any(v is not None for v in stored):
        print(f"  (dump-stored: median {stored[0]} -> {stored[1]}, "
              f"min {stored[2]} -> {stored[3]})")

    # Standing adjudication for job-count-heavy queries (the dedup_cluster
    # pattern: O(log n) driver-paced rounds of paired jobs, whose
    # interleaved medians — and sometimes mins — inflate 2x under bench
    # contention while focused quiet runs sit at the floor; three rounds
    # of manual adjudication motivated making it mechanical). Queries
    # listed in BENCH_FOCUSED.json carry a quiet-box FOCUSED-RUN floor
    # (SPARK_GRAFT_ONLY=<q>); an interleaved "SLOWER" within threshold of
    # that floor is a contention artifact, not a regression.
    focused_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_FOCUSED.json")
    focused = {}
    if os.path.exists(focused_path):
        focused = json.load(open(focused_path)).get("queries_min", {})

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
        note = ""
        if ratio > 1 and q in focused:
            ff = focused[q]
            if b <= ff * (1.0 + threshold):
                note = (f"   [job-count-heavy; within focused floor "
                        f"{ff} — contention artifact]")
            else:
                note = (f"   [job-count-heavy; EXCEEDS focused floor {ff} "
                        f"— re-measure with SPARK_GRAFT_ONLY={q}]")
        print(f"  {q:28s} min {a:7.3f} -> {b:7.3f}  ({ratio:5.2f}x {tag})"
              f"   median {ma} -> {mb}{note}")

    only_old = sorted(set(o_min) - set(n_min))
    only_new = sorted(set(n_min) - set(o_min))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:  ", ", ".join(only_new))
    if not rows:
        print(f"  no per-query min moved more than {threshold:.0%}")


if __name__ == "__main__":
    main(sys.argv[1:])
