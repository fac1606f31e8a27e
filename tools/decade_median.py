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


def selftest():
    """Round-trip a synthetic capture set through the real pipeline:
    normal medians, an aborted leg (differing rep counts), and the
    empty-intersection abort. This script decides which numbers get
    pinned as the grading reference — it gets the same
    verify-before-trust treatment as the engine's own operators."""
    import contextlib
    import io
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="decade_selftest_")

    def leg(name, rows, first=0.25, last=0.25):
        p = os.path.join(d, name)
        with open(p, "w") as f:
            for q, t, c in rows:
                f.write(f"[info] {q:28s} {t:8.2f} s  (5 rows)  [calib={c:.3f}]\n")
            f.write(f"[info] __calib__ first={first:.3f} last={last:.3f}\n")
        return p

    # qa: small medians 2.0 (1.0, 3.0), big 10.0 -> 5.0x at 3x = superlinear
    # qb: per-query calib normalizes a wave (2.0 @ 0.5 -> 1.0); 2.5x = clean
    s1 = leg("s1.log", [("qa", 1.0, 0.25), ("qb", 2.0, 0.5)])
    s2 = leg("s2.log", [("qa", 3.0, 0.25), ("qb", 1.0, 0.25)])
    b1 = leg("b1.log", [("qa", 10.0, 0.25), ("qb", 2.0, 0.25)])
    b2 = leg("b2.log", [("qa", 10.0, 0.25), ("qb", 6.0, 0.5)])
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(3.0, [s1, s2], [b1, b2])
    got = out.getvalue()
    assert "| `qa` | 2.00 | 10.00 | 5.00 |" in got, got
    assert "| `qb` | 1.00 | 2.50 | 2.50 |" in got, got
    assert "superlinear (> 3.0x AND >1s at the big leg): ['qa']" in got, got

    # aborted leg: qb missing from one small leg -> rep range "1-2"
    s3 = leg("s3.log", [("qa", 2.0, 0.25)])
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(3.0, [s1, s3], [b1])
    got = out.getvalue()
    assert "(med/1-2)" in got, got
    assert "| `qb` | 1.00 |" in got, got  # qb still rides its 1 sample

    # empty intersection (a leg aborted before any reading) must exit
    # loudly, never print an empty table
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            main(3.0, [leg("sx.log", [("qx", 1.0, 0.25)])], [b1])
        raise AssertionError("empty intersection did not abort")
    except SystemExit as e:
        assert "share no query names" in str(e.code), e.code

    # a capture with no __calib__ line (not a BenchOne log) exits loudly
    bad = os.path.join(d, "bad.log")
    with open(bad, "w") as f:
        f.write("[info] qa    1.00 s  (5 rows)\n")
    try:
        norm_readings([bad])
        raise AssertionError("calib-less capture did not abort")
    except SystemExit:
        pass
    print("decade_median selftest: PASS")


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
    else:
        main(float(sys.argv[1]), sys.argv[2].split(","), sys.argv[3].split(","))
