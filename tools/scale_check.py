#!/usr/bin/env python3
"""Scale-linearity check: compare two Bench JSONs at different scale
factors and flag queries growing super-linearly.

Usage: python3 tools/scale_check.py <bench_lo.json> <bench_hi.json> <data_ratio>

For each query present in both runs, prints t_hi / t_lo against the
data ratio. A query is flagged SUPER when its time ratio exceeds the
data ratio by >25% (allowing noise + the constant-overhead floor makes
sub-linear ratios common and fine).
"""
import json
import sys


def main() -> int:
    lo = json.load(open(sys.argv[1]))["queries"]
    hi = json.load(open(sys.argv[2]))["queries"]
    ratio = float(sys.argv[3])
    shared = sorted(set(lo) & set(hi), key=lambda q: -hi[q])
    flagged = []
    print(f"{'query':34s} {'lo_s':>8s} {'hi_s':>8s} {'x':>7s}  vs data x{ratio:g}")
    for q in shared:
        r = hi[q] / max(lo[q], 1e-9)
        mark = ""
        if r > ratio * 1.25:
            mark = "  <-- SUPER"
            flagged.append(q)
        print(f"{q:34s} {lo[q]:8.2f} {hi[q]:8.2f} {r:7.2f}{mark}")
    print(f"\nshared={len(shared)} flagged={len(flagged)} {flagged}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
