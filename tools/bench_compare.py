#!/usr/bin/env python3
"""Per-query bench comparison with the uniform-ratio noise test.

This VM's wall-clock numbers carry a ±30% host-state spread that is
UNIFORM across queries (ROUND9_NOTES: identical binaries measured
72.8–115.1 s over one day, median per-query ratio 1.38 between two such
runs, including queries no commit touched). A raw per-query diff
therefore cries wolf on every run. The honest comparison, codified
here:

  1. compute each common query's new/old time ratio;
  2. take the MEDIAN ratio as the host-speed factor for this pair of
     runs (the fleet-wide shift that is machine state, not code);
  3. flag only queries whose ratio deviates from that median by more
     than --threshold (default 1.5x in either direction) — a
     NON-uniform jump, the only kind that can be a real regression or
     a real win.

Sub-second queries carry the largest RELATIVE jitter (a 0.3 s absolute
wobble is a 1.5x ratio at 0.6 s but noise at 3 s), so --min-sec
(default 1.0) exempts queries under that time in BOTH runs from
flagging — they still count toward the median.

Usage:
    python3 tools/bench_compare.py OLD.json NEW.json \
        [--threshold 1.5] [--min-sec 1.0]

Exit code 1 if any query exceeds the threshold (so CI-ish loops can
gate on it); the listing is the artifact either way.
"""
import json
import sys


def main(old_path, new_path, threshold=1.5, min_sec=1.0):
    with open(old_path) as f:
        old = json.load(f)["queries"]
    with open(new_path) as f:
        new = json.load(f)["queries"]

    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if not common:
        print("no common queries between the two artifacts")
        return 1

    ratios = {q: new[q] / old[q] for q in common}
    med = sorted(ratios.values())[len(ratios) // 2]
    print(f"{len(common)} common queries; median ratio {med:.3f} "
          f"(host-speed factor — uniform shift is machine state, not code)")
    if only_old:
        print(f"dropped since old: {', '.join(only_old)}")
    if only_new:
        print(f"new since old: {', '.join(only_new)}")

    flagged = []
    for q in common:
        if old[q] < min_sec and new[q] < min_sec:
            continue  # sub-floor in both runs: relative jitter dominates
        # normalize out the host factor, then test non-uniformity
        rel = ratios[q] / med
        if rel > threshold or rel < 1.0 / threshold:
            flagged.append((rel, q))
    if flagged:
        print(f"\nNON-uniform deviations (>{threshold}x off the median "
              f"— candidate real changes):")
        for rel, q in sorted(flagged, reverse=True):
            print(f"  {q}: {old[q]:.3f}s -> {new[q]:.3f}s "
                  f"(ratio {ratios[q]:.2f}, {rel:.2f}x off-median)")
    else:
        print(f"\nall per-query ratios within {threshold}x of the median "
              f"— any total-time difference is host noise, not code")
    return 1 if flagged else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    thr, floor = 1.5, 1.0
    if "--threshold" in argv:
        i = argv.index("--threshold")
        thr = float(argv[i + 1])
        del argv[i:i + 2]
    if "--min-sec" in argv:
        i = argv.index("--min-sec")
        floor = float(argv[i + 1])
        del argv[i:i + 2]
    sys.exit(main(argv[0], argv[1], thr, floor))
