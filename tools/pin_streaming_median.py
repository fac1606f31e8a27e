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


def selftest():
    """Round-trip a synthetic ref + rerun set: median pins rewrite IN
    PLACE for entries present in every rerun, non-streaming lines and
    comments survive verbatim, and calib-less captures abort loudly.
    This script rewrites the grading reference — verify before trust."""
    import contextlib
    import io
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="pin_selftest_")
    ref = os.path.join(d, "ref.txt")
    with open(ref, "w") as f:
        f.write("# comment line survives\n")
        f.write("__calib__ 0.5\n")
        f.write("s1 4.0\n")          # reruns 8.0@1.0 -> 4.0, 2.0@0.5 -> 2.0: median(4,4,2) = 4.0
        f.write("s2 6.0\n")          # reruns 2.0@0.5 -> 2.0, 2.0@0.5 -> 2.0: median(6,2,2) = 2.0
        f.write("untouched 1.25\n")  # absent from reruns: pin carries verbatim

    def rerun(name, rows, first, last):
        p = os.path.join(d, name)
        with open(p, "w") as f:
            for q, t in rows:
                f.write(f"{q:28s} {t:8.2f} s  (5 rows)\n")
            f.write(f"__calib__ first={first:.3f} last={last:.3f}\n")
        return p

    r1 = rerun("r1.txt", [("s1", 8.0), ("s2", 2.0)], 1.0, 1.0)
    r2 = rerun("r2.txt", [("s1", 2.0), ("s2", 2.0)], 0.5, 0.5)
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(ref, [r1, r2])
    pins = parse_ref(ref)
    assert pins["s1"] == 4.0, pins
    assert pins["s2"] == 2.0, pins
    assert pins["untouched"] == 1.25, pins
    assert pins["__calib__"] == 0.5, pins
    text = open(ref).read()
    assert "# comment line survives" in text, text
    got = out.getvalue()
    assert "| `s1` | 4.000 |" in got and "**4.000**" in got, got
    assert "| `s2` | 6.000 |" in got and "**2.000**" in got, got

    # a rerun with no __calib__ line must abort, not silently pin
    bad = rerun("bad.txt", [("s1", 1.0)], 0.5, 0.5)
    with open(bad, "w") as f:
        f.write("s1    1.00 s  (5 rows)\n")
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            main(ref, [bad])
        raise AssertionError("calib-less rerun did not abort")
    except SystemExit as e:
        assert "__calib__" in str(e.code), e.code

    # a ref without a __calib__ pin must abort before touching anything
    noref = os.path.join(d, "noref.txt")
    with open(noref, "w") as f:
        f.write("s1 4.0\n")
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            main(noref, [r1])
        raise AssertionError("calib-less ref did not abort")
    except SystemExit as e:
        assert "__calib__" in str(e.code), e.code
    print("pin_streaming_median selftest: PASS")


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
    elif len(sys.argv) < 3:
        sys.exit(__doc__)
    else:
        main(sys.argv[1], sys.argv[2:])
