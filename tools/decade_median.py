#!/usr/bin/env python3
"""Median-of-k scaling-decade table from repeated paired BenchOne legs.

Usage: decade_median.py <growth_x> <small1.log,small2.log,...> <big1.log,...>

Single paired legs proved inadequate on this host: contention arrives
in multi-minute waves (probes read 0.10-1.03 within ONE leg), and a
wave landing on one query in one leg fabricates a superlinear entry.
Per-query probes (SPARK_GRAFT_CALIB_EACH=1) normalize within the wave;
the per-query MEDIAN across k independent legs then drops whichever
reading the wave still caught — the same median-of-k discipline
BASELINE.md applies to streaming bench pins.
"""
import statistics
import sys

from decade_ratio import BASE_CALIB, parse


def norm_readings(paths):
    """{query: [normalized seconds, one per leg]}"""
    out = {}
    for p in paths:
        qs, cal = parse(p)
        for q, (t, c) in qs.items():
            out.setdefault(q, []).append(t * BASE_CALIB / (c or cal))
    return out


def main(growth, small_paths, big_paths):
    s = norm_readings(small_paths)
    b = norm_readings(big_paths)
    rows = []
    for q in s:
        if q in b:
            sm = statistics.median(s[q])
            bm = statistics.median(b[q])
            rows.append((q, sm, bm, bm / sm if sm > 0 else float("inf"),
                         len(s[q]), len(b[q])))
    rows.sort(key=lambda r: -r[3])
    if not rows:
        sys.exit("decade_median: the small and big legs share no query names "
                 "(did a leg abort before printing any readings?)")
    # rep counts can differ per query when a leg aborted mid-run —
    # report the range across rows, not one arbitrary row's counts
    def reps(idx):
        ks = sorted({r[idx] for r in rows})
        return str(ks[0]) if len(ks) == 1 else f"{ks[0]}-{ks[-1]}"
    print(f"| query | small s (med/{reps(4)}) | big s (med/{reps(5)}) "
          f"| time x ({growth}x data) |")
    print("|---|---|---|---|")
    for q, sm, bm, x, _, _ in rows:
        print(f"| `{q}` | {sm:.2f} | {bm:.2f} | {x:.2f} |")
    over = [q for q, sm, bm, x, _, _ in rows if x > growth and bm > 1.0]
    print(f"\nsuperlinear (> {growth}x AND >1s at the big leg): {over}")


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2].split(","), sys.argv[3].split(","))
