#!/usr/bin/env python3
"""Scaling report: per-query sf0.1 -> sf1 wall-time ratio and the
implied scaling exponent e (t ~ N^e for a 10x data step:
e = log10(t_sf1 / t_sf01)). Families roll up by query-name prefix.
Usage: python3 tools/scale_report.py BENCH_FULL.json bench_sf1.json
"""
import json, sys, math
from collections import defaultdict

b01 = json.load(open(sys.argv[1]))["queries"]
b1 = json.load(open(sys.argv[2]))["queries"]
FLOOR = 0.20  # below this, fixed overhead dominates and e is meaningless

def fam(name):
    for p in ("events", "match", "dedup", "knn", "embed", "text", "sample",
              "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q9",
              "contamination", "graph", "mm", "clean", "quality", "privacy",
              "approx", "bpe", "extract"):
        if name.startswith(p):
            return {"q1":"tpch","q2":"tpch","q3":"tpch","q4":"tpch","q5":"tpch",
                    "q6":"tpch","q7":"tpch","q9":"tpch"}.get(p, p)
    return "other"

rows = []
for name in sorted(set(b01) & set(b1)):
    t0, t1 = b01[name], b1[name]
    e = math.log10(t1 / t0) if t0 > 0 else float("nan")
    rows.append((name, t0, t1, t1 / t0, e))

rows.sort(key=lambda r: -r[3])
print(f"{'query':34s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>7s} {'exp':>6s}")
for name, t0, t1, r, e in rows:
    flag = "" if max(t0, t1) >= FLOOR else "  (noise-floor)"
    print(f"{name:34s} {t0:7.2f} {t1:8.2f} {r:7.2f} {e:6.2f}{flag}")

print("\nfamily rollup (sum of per-query times, exponent of the sums):")
fsum = defaultdict(lambda: [0.0, 0.0])
for name, t0, t1, r, e in rows:
    fsum[fam(name)][0] += t0; fsum[fam(name)][1] += t1
for f, (t0, t1) in sorted(fsum.items(), key=lambda kv: -kv[1][1]):
    print(f"{f:16s} sf0.1={t0:7.2f}  sf1={t1:8.2f}  ratio={t1/t0:6.2f}  exp={math.log10(t1/t0):5.2f}")
t0 = sum(r[1] for r in rows); t1 = sum(r[2] for r in rows)
print(f"\nTOTAL            sf0.1={t0:7.2f}  sf1={t1:8.2f}  ratio={t1/t0:6.2f}  exp={math.log10(t1/t0):5.2f}")
