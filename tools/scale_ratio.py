#!/usr/bin/env python3
"""Per-query sf0.1 -> sf1 scaling ratios from two BENCH_DETAIL files.

Usage: python3 tools/scale_ratio.py BENCH_DETAIL.json BENCH_SF1_DETAIL.json
Prints every query's (sf0.1 median, sf1 median, ratio) sorted by
ratio descending, plus a family rollup. The flag threshold follows
the round-9 ask: ratio > 15 is super-linear for 10x data (>1.5x
linear) and must be fixed or attributed.
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
rows = []
skipped = []
for name in sorted(set(qa) | set(qb)):
    if name in qa and name in qb and qa[name] > 0:
        rows.append((name, qa[name], qb[name], qb[name] / qa[name]))
    else:
        skipped.append(name)
if skipped:
    # no silent caps: a query absent from either record must be named
    print(f"SKIPPED (absent from one record or zero-timed): {skipped}\n")
rows.sort(key=lambda r: -r[3])
print(f"{'query':42s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
for n, x, y, r in rows:
    flag = " <-- SUPER-LINEAR" if r > 15 else ""
    print(f"{n:42s} {x:8.3f} {y:8.3f} {r:7.2f}{flag}")

tot_a = sum(x for _, x, _, _ in rows)
tot_b = sum(y for _, _, y, _ in rows)
print(f"\ntotal medians: sf0.1 {tot_a:.1f}s  sf1 {tot_b:.1f}s  ratio {tot_b / tot_a:.2f}")
flagged = [n for n, _, _, r in rows if r > 15]
print(f"flagged (>15x): {len(flagged)} {flagged}")

# family rollup by query-number band
fams = {
    "relational q01-q24": range(1, 25),
    "dedup/sim/text q25-q60": range(25, 61),
    "curation q61-q100": range(61, 101),
    "analytics q101-q150": range(101, 151),
    "analytics q151-q200": range(151, 201),
    "warehouse/graph/bitmap q201+": range(201, 300),
}
print("\nfamily rollup (sum of medians):")
for fam, rng in fams.items():
    xs = [(x, y) for n, x, y, _ in rows
          if int(n[1:].split("_")[0]) in rng]
    if xs:
        sa = sum(x for x, _ in xs)
        sb = sum(y for _, y in xs)
        print(f"  {fam:34s} {sa:7.2f} -> {sb:7.2f}  ratio {sb / sa:5.2f}  ({len(xs)} queries)")
