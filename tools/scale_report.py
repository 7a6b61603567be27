#!/usr/bin/env python3
"""Scaling report: per-query wall-time ratio across a 10x data step
and the implied scaling exponent e (t ~ N^e: e = log10(t_hi / t_lo)).
Families roll up by query-name prefix (tpch q-queries folded).
Failed entries (-1) are skipped unless a retry artifact resolves them.
Usage: python3 tools/scale_report.py <lo.json> <hi.json> [hi_retry.json]
"""
import json, math, re, sys
from collections import defaultdict

lo = json.load(open(sys.argv[1]))["queries"]
hi = json.load(open(sys.argv[2]))["queries"]
if len(sys.argv) > 3:
    retry = json.load(open(sys.argv[3]))["queries"]
    for k, v in hi.items():
        if v < 0 and retry.get(k, -1) >= 0:
            hi[k] = retry[k]

FLOOR = 0.20  # below this, fixed overhead dominates and e is meaningless

def fam(name):
    return "tpch" if re.match(r"q\d+_", name) else name.split("_")[0]

rows = [(n, lo[n], hi[n], hi[n] / lo[n], math.log10(hi[n] / lo[n]))
        for n in sorted(set(lo) & set(hi)) if lo[n] > 0 and hi[n] >= 0]
skipped = [n for n in sorted(set(lo) & set(hi)) if lo[n] <= 0 or hi[n] < 0]
if skipped:
    print(f"skipped (failed in an artifact): {', '.join(skipped)}\n")

rows.sort(key=lambda r: -r[3])
print(f"{'query':34s} {'t_lo':>7s} {'t_hi':>8s} {'ratio':>7s} {'exp':>6s}")
for name, t0, t1, r, e in rows:
    flag = "" if max(t0, t1) >= FLOOR else "  (noise-floor)"
    print(f"{name:34s} {t0:7.2f} {t1:8.2f} {r:7.2f} {e:6.2f}{flag}")

print("\nfamily rollup (sum of per-query times, exponent of the sums):")
fsum = defaultdict(lambda: [0.0, 0.0, 0])
for name, t0, t1, r, e in rows:
    fsum[fam(name)][0] += t0; fsum[fam(name)][1] += t1; fsum[fam(name)][2] += 1
for f, (t0, t1, n) in sorted(fsum.items(), key=lambda kv: -kv[1][1]):
    print(f"{f:16s} n={n:3d} t_lo={t0:7.2f}  t_hi={t1:8.2f}  "
          f"ratio={t1/t0:6.2f}  exp={math.log10(t1/t0):5.2f}")
t0 = sum(r[1] for r in rows); t1 = sum(r[2] for r in rows)
print(f"\nTOTAL            n={len(rows):3d} t_lo={t0:7.2f}  t_hi={t1:8.2f}  "
      f"ratio={t1/t0:6.2f}  exp={math.log10(t1/t0):5.2f}")
