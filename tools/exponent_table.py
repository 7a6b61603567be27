#!/usr/bin/env python3
"""Build the per-family sf1 -> sf10 scaling-exponent table for
BASELINE.md from two full-registry bench artifacts.

Family = implementing source file, taken from the key -> file:line
column of VERDICT.md's coverage tables (the judge-maintained
inventory, one row per registered query).

e = log10(T_sf10 / T_sf1) for the family TOTAL: e = 1.0 is perfectly
linear in rows, e < 1 sublinear (fixed overheads amortizing), e > 1
superlinear (the number the table exists to catch).

Usage: exponent_table.py VERDICT.md bench_sf1.json bench_sf10.json
Prints a markdown table; per-family worst-query column names the
query with the highest per-query ratio so a superlinear family is
immediately attributable.
"""
import json
import math
import re
import sys


def key_to_file(verdict_path):
    # file cells may carry a directory prefix (multimodal/
    # BinaryColumns.scala:530, sources/Extraction.scala:95) — the
    # family is the bare file stem either way
    m = {}
    pat = re.compile(
        r"^\|\s*`([a-z0-9_]+)`\s*\|.*?\|"
        r"\s*(?:[A-Za-z0-9_]+/)*([A-Za-z0-9_]+)\.scala:\d+")
    for line in open(verdict_path):
        mm = pat.match(line)
        if mm:
            m[mm.group(1)] = mm.group(2)
    return m


def main(verdict, sf1_path, sf10_path):
    fam_of = key_to_file(verdict)
    q1 = json.load(open(sf1_path))["queries"]
    q10 = json.load(open(sf10_path))["queries"]
    fams = {}
    for k, t10 in q10.items():
        t1 = q1.get(k)
        if t1 is None or t1 <= 0 or t10 <= 0:
            continue
        fam = fam_of.get(k, "UNKNOWN")
        fams.setdefault(fam, []).append((k, t1, t10))
    print("| family | queries | sf1 s | sf10 s | e | worst query (ratio) |")
    print("| --- | --- | --- | --- | --- | --- |")
    rows = []
    for fam, items in fams.items():
        s1 = sum(t1 for _, t1, _ in items)
        s10 = sum(t10 for _, _, t10 in items)
        e = math.log10(s10 / s1)
        wk, w1, w10 = max(items, key=lambda it: it[2] / it[1])
        rows.append((e, fam, len(items), s1, s10, wk, w10 / w1))
    for e, fam, n, s1, s10, wk, wr in sorted(rows, reverse=True):
        print(f"| {fam} | {n} | {s1:.1f} | {s10:.1f} | {e:.2f} "
              f"| `{wk}` ({wr:.1f}x) |")
    # dropped attribution must be VISIBLE: an UNKNOWN family row means
    # the VERDICT.md table format drifted past the regex above
    unknown = [k for k in q10 if k in q1 and fam_of.get(k) is None]
    if unknown:
        print(f"\nWARNING: {len(unknown)} queries fell to UNKNOWN "
              f"(first: {sorted(unknown)[:5]}) — fix key_to_file's regex")
    t1 = sum(v for v in q1.values() if v > 0)
    t10 = sum(v for v in q10.values() if v > 0)
    print(f"\ntotal: sf1 {t1:.1f}s -> sf10 {t10:.1f}s, "
          f"e = {math.log10(t10 / t1):.2f} over a 10x row scale-up")


if __name__ == "__main__":
    main(*sys.argv[1:4])
