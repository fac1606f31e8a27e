#!/usr/bin/env python3
"""Optimization-round evidence: per-query medians across N BEFORE legs
vs N AFTER legs (defaults: the round-19 legs; --before/--after override).
Each median is also locally calibrated: the query's reading in each leg
is scaled by (0.25 / that leg's bracketing-probe mean) so a wave hitting
one leg's window does not masquerade as code movement. Summary sums are
computed over the INTERSECTION of the two key sets on both sides (a
query missing from one side is reported, never silently summed — the
r18 ADVICE asymmetry). --selftest round-trips calibration, medians, and
the symmetric-sum rule on synthetic legs."""
import json, statistics, sys

PROBE_BASE = 0.25  # the host's historical clean-probe band (BASELINE.md)

def local_calib(leg, idx_of):
    wins = leg["calib_windows"]
    def for_index(i):
        before = [c for (q, c) in wins if q <= i]
        after = [c for (q, c) in wins if q > i]
        b = before[-1] if before else wins[0][1]
        a = after[0] if after else b
        return (a + b) / 2
    return {name: for_index(i) for name, i in idx_of.items()}

def load(path):
    leg = json.load(open(path))
    names = sorted(leg["queries"])
    idx_of = {n: i for i, n in enumerate(names)}
    cal = local_calib(leg, idx_of)
    raw = leg["queries"]
    calibrated = {n: raw[n] * (PROBE_BASE / cal[n]) for n in names}
    return raw, calibrated

def medians(paths):
    raws, cals = zip(*[load(p) for p in paths])
    keys = set(raws[0])
    med_raw = {k: statistics.median([r[k] for r in raws]) for k in keys}
    med_cal = {k: statistics.median([c[k] for c in cals]) for k in keys}
    return med_raw, med_cal

def selftest():
    import tempfile, os
    leg = {"queries": {"a": 1.0, "b": 2.0}, "calib_windows": [[0, 0.5], [2, 0.5]]}
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(leg, f); f.close()
    raw, cal = load(f.name)
    os.unlink(f.name)
    assert raw == {"a": 1.0, "b": 2.0}
    # probe at 0.5 = 2x the 0.25 base -> calibrated readings halve
    assert abs(cal["a"] - 0.5) < 1e-12 and abs(cal["b"] - 1.0) < 1e-12
    # median across three synthetic legs, middle leg wavy: the raw
    # median moves with the wave, the calibrated median does not
    legs = []
    for probe, t in [(0.25, 1.0), (0.75, 3.0), (0.25, 1.0)]:
        legs.append({"queries": {"q": t},
                     "calib_windows": [[0, probe], [1, probe]]})
    import tempfile, os as _os
    paths = []
    for leg_ in legs:
        g = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(leg_, g); g.close(); paths.append(g.name)
    mr, mc = medians(paths)
    for p in paths: _os.unlink(p)
    assert abs(mr["q"] - 1.0) < 1e-12 and abs(mc["q"] - 1.0) < 1e-12
    # symmetric-sum rule: a query present only on the BEFORE side must
    # not inflate the improvement ratio — both sums run over the
    # intersection (r18 ADVICE item 1)
    common, drop = summary_sets({"x": 1.0, "only_b": 9.0}, {"x": 1.0})
    assert common == ["x"] and drop == ["only_b"]
    print("PASS optleg_compare selftest (local calibration + medians + symmetric sums)")

def summary_sets(b, a):
    common = sorted(set(b) & set(a))
    dropped = sorted(set(b) ^ set(a))
    return common, dropped

def leg_args(argv, flag, default):
    if flag in argv:
        i = argv.index(flag)
        paths = []
        for tok in argv[i + 1:]:
            if tok.startswith("--"):
                break
            paths.append(tok)
        return paths or default
    return default

if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest(); sys.exit(0)
    argv = sys.argv[1:]
    # defaults = the round-19 evidence sets: 5 same-binary before legs
    # (two fresh + the three r18 after-legs, no source change between),
    # 4 after legs (the fourth committed to before it ran)
    before = leg_args(argv, "--before",
                      ["tools/bench_r19_leg1.json", "tools/bench_r19_leg2.json",
                       "tools/bench_r18_optleg1.json", "tools/bench_r18_optleg2.json",
                       "tools/bench_r18_optleg3.json"])
    after = leg_args(argv, "--after",
                     [f"tools/bench_r19_optleg{i}.json" for i in (1, 2, 3, 4)])
    consumed = set(before + after + ["--before", "--after"])
    braw, bcal = medians(before)
    araw, acal = medians(after)
    common, dropped = summary_sets(braw, araw)
    watch = [a for a in argv if a not in consumed] or common
    print(f"{'query':40s} {'before':>8s} {'after':>8s} {'raw x':>6s}   "
          f"{'b-cal':>8s} {'a-cal':>8s} {'cal x':>6s}")
    for q in watch:
        if q not in braw or q not in araw:
            continue
        rr = araw[q] / braw[q] if braw[q] else float("nan")
        cr = acal[q] / bcal[q] if bcal[q] else float("nan")
        print(f"{q:40s} {braw[q]:8.2f} {araw[q]:8.2f} {rr:6.2f}   "
              f"{bcal[q]:8.2f} {acal[q]:8.2f} {cr:6.2f}")
    if dropped:
        print(f"\n[excluded from sums — present on one side only] {dropped}")
    tb, ta = sum(braw[k] for k in common), sum(araw[k] for k in common)
    cb, ca = sum(bcal[k] for k in common), sum(acal[k] for k in common)
    print(f"\nsum-of-medians raw {tb:.1f} -> {ta:.1f} ({ta/tb:.3f}x); "
          f"calibrated {cb:.1f} -> {ca:.1f} ({ca/cb:.3f}x)  "
          f"[n={len(common)} common queries]")
