#!/usr/bin/env python3
"""Build the BASELINE.md sf0.1-vs-sf1 scaling table from paired bench
runs (same host, back-to-back so the contention band cancels in the
ratio).

Inputs (written by graft.Bench):
  target/bench_sf01.json / target/bench_sf1.json         per-query seconds
  target/bench_metrics_sf01.json / ..._sf1.json          per-query shuffle/spill MB

Usage: python3 tools/scale_ratio.py [growth]   (default growth=10)

Output: a markdown table sorted by ratio desc, with shuffle-volume
ratios as corroborating evidence, plus a summary block. Queries whose
time ratio exceeds `growth` are listed as superlinear candidates —
each needs an explanation or a fix in BASELINE.md.
"""
import json, sys

growth = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
b0 = json.load(open('target/bench_sf01.json'))
b1 = json.load(open('target/bench_sf1.json'))
m0 = json.load(open('target/bench_metrics_sf01.json'))
m1 = json.load(open('target/bench_metrics_sf1.json'))

q0, q1 = b0['queries'], b1['queries']
rows = []
for k in sorted(q0):
    if k not in q1:
        continue
    t0, t1 = q0[k], q1[k]
    ratio = t1 / t0 if t0 > 0.05 else float('nan')
    s0 = m0.get(k, {}).get('shuffle_read_mb', 0.0)
    s1 = m1.get(k, {}).get('shuffle_read_mb', 0.0)
    srat = s1 / s0 if s0 > 0.5 else None
    sp1 = m1.get(k, {}).get('spill_disk_mb', 0.0)
    rows.append((k, t0, t1, ratio, s0, s1, srat, sp1))

rows.sort(key=lambda r: -(r[3] if r[3] == r[3] else 0))
tot0 = sum(r[1] for r in rows)
tot1 = sum(r[2] for r in rows)
print(f"paired queries: {len(rows)}  total sf0.1 {tot0:.1f}s  sf1 {tot1:.1f}s  "
      f"ratio {tot1/tot0:.2f}x at {growth:.0f}x data")
print(f"calib sf0.1 {b0['calib_first']:.2f}/{b0['calib_last']:.2f}  "
      f"sf1 {b1['calib_first']:.2f}/{b1['calib_last']:.2f}")
over = [r for r in rows if r[3] == r[3] and r[3] > growth and r[2] > 1.0]
print(f"superlinear (> {growth:.0f}x time AND >1s at sf1): {[r[0] for r in over]}")
sub = [r for r in rows if r[3] == r[3] and r[3] <= 2.0]
print(f"flat (<=2x): {len(sub)} queries")
print()
print("| query | sf0.1 s | sf1 s | time x | shuf0.1 MB | shuf1 MB | shuf x | spill1 MB |")
print("|---|---|---|---|---|---|---|---|")
for k, t0, t1, ratio, s0, s1, srat, sp1 in rows:
    sr = f"{srat:.1f}" if srat else "—"
    print(f"| {k} | {t0:.2f} | {t1:.2f} | {ratio:.1f} | {s0:.1f} | {s1:.1f} | {sr} | {sp1:.0f} |")
