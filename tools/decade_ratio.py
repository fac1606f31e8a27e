#!/usr/bin/env python3
"""Build a BASELINE.md scaling-decade table from two paired BenchOne
logs (same member list, same order, run back-to-back).

Usage: python3 tools/decade_ratio.py <small.log> <big.log> <data_x>

Readings are calibration-normalized within each leg (mean of the leg's
first/last probe) so a host-contention band that differs between legs
divides out; the printed ratio is then (big/calib_big)/(small/calib_small)
relative to the CPU-probe baseline 0.25 s. A sacrificial lead entry
(same query repeated later in the list) absorbs first-query cold I/O —
when a name appears twice, the LAST reading wins.
"""
import re, sys

BASE_CALIB = 0.25


def parse(path):
    """{query: (seconds, per-query calib or None)}, endpoint-mean calib.

    With SPARK_GRAFT_CALIB_EACH=1 each line carries its own probe
    reading taken seconds after the query — normalization then happens
    INSIDE a contention wave instead of averaging across the leg."""
    qs, calib = {}, None
    for line in open(path):
        m = re.search(r"\[info\] (\w+) +([0-9.]+) s +\(", line)
        if m:
            c = re.search(r"\[calib=([0-9.]+)\]", line)
            qs[m.group(1)] = (float(m.group(2)),
                              float(c.group(1)) if c else None)
        c = re.search(r"__calib__ first=([0-9.]+) last=([0-9.]+)", line)
        if c:
            calib = (float(c.group(1)) + float(c.group(2))) / 2
    if calib is None:
        sys.exit(f"{path}: no __calib__ line (leg incomplete?)")
    return qs, calib


def main(small_path, big_path, growth):
    s, cs = parse(small_path)
    b, cb = parse(big_path)
    rows = []
    for q in s:
        if q in b:
            st, scal = s[q]
            bt, bcal = b[q]
            sn = st * BASE_CALIB / (scal or cs)
            bn = bt * BASE_CALIB / (bcal or cb)
            rows.append((q, sn, bn, bn / sn if sn > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"calib: small {cs:.3f}  big {cb:.3f}  (readings normalized to {BASE_CALIB})")
    print(f"| query | small s | big s | time x ({growth}x data) |")
    print("|---|---|---|---|")
    for q, sn, bn, x in rows:
        print(f"| `{q}` | {sn:.2f} | {bn:.2f} | {x:.2f} |")
    over = [q for q, sn, bn, x in rows if x > growth and bn > 1.0]
    print(f"\nsuperlinear (> {growth}x AND >1s at the big leg): {over}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]))
