#!/usr/bin/env python3
"""Median-of-k pins for the STREAMING bench family.

The streaming/stateful entries are the bench's largest run-to-run
movers (microbatch scheduling, state-store I/O), and single-sample
pins from one WRITE_REF leg keep generating tripwire flags that then
need hand adjudication (r8 totals 3.37x, r13 totals 2.69x, r14
dedup_bounded 2.15x -- every one adjudicated environmental). Per the
round-14 verdict: pin the streaming family from a median of k
readings by default, so a member-level flag means real movement.

Usage:
    python3 tools/pin_streaming_median.py ref.txt rerun1.txt [rerun2.txt ...]

ref.txt      -- tools/bench_reference.txt as written by the closing
                SPARK_GRAFT_WRITE_REF=1 leg (leg reading = sample 1)
rerunN.txt   -- captured stdout of `runMain graft.BenchOne <streaming
                entries...>` fresh-JVM reruns (samples 2..k), each
                carrying its own __calib__ line

Each rerun reading is normalized onto the leg's calibration
(t * leg_calib / rerun_calib) before the median, the same
divide-out-the-host arithmetic as the tripwire. The ref file is
rewritten IN PLACE for the streaming entries found in every rerun;
a markdown table for BASELINE.md goes to stdout.
"""
import re
import statistics
import sys


def parse_ref(path):
    pins = {}
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) == 2:
            pins[parts[0]] = float(parts[1])
    return pins


def parse_benchone(path):
    """-> (dict name->seconds, calib mean)"""
    times, calib = {}, None
    for line in open(path):
        m = re.match(r"^(\w+)\s+([0-9.]+) s\s+\(\d+ rows\)", line.strip())
        if m and m.group(1) != "__calib__":
            times[m.group(1)] = float(m.group(2))
        c = re.search(r"__calib__ first=([0-9.]+) last=([0-9.]+)", line)
        if c:
            calib = (float(c.group(1)) + float(c.group(2))) / 2
    if calib is None:
        sys.exit(f"{path}: no __calib__ line (not a BenchOne capture?)")
    return times, calib


def main(ref_path, rerun_paths):
    pins = parse_ref(ref_path)
    leg_calib = pins.get("__calib__")
    if not leg_calib:
        sys.exit(f"{ref_path}: no __calib__ pin")
    reruns = [parse_benchone(p) for p in rerun_paths]
    names = set.intersection(*(set(t.keys()) for t, _ in reruns))
    names &= set(pins)
    rows = []
    for n in sorted(names):
        samples = [pins[n]] + [t[n] * leg_calib / c for t, c in reruns]
        med = statistics.median(samples)
        rows.append((n, pins[n], samples[1:], med))
        pins[n] = med
    lines = open(ref_path).read().splitlines()
    out = []
    for line in lines:
        parts = line.split()
        if len(parts) == 2 and parts[0] in names:
            out.append(f"{parts[0]} {pins[parts[0]]}")
        else:
            out.append(line)
    open(ref_path, "w").write("\n".join(out) + "\n")
    print("| entry | leg pin | normalized reruns | median pin |")
    print("|---|---|---|---|")
    for n, old, rest, med in rows:
        rr = " / ".join(f"{x:.2f}" for x in rest)
        print(f"| `{n}` | {old:.3f} | {rr} | **{med:.3f}** |")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
