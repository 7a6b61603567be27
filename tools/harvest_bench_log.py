#!/usr/bin/env python3
"""Rebuild a bench artifact from a (possibly interrupted) Bench run
log: every completed query's per-rep times are in its `[bench]` line,
so an interrupted sweep still yields per-query numbers for the
queries it finished. The output is clearly labeled partial
(n_queries < registry size) and therefore refused as BENCH_FULL.json
by Bench's own discipline — name it bench_*_partial.json.

Usage: harvest_bench_log.py run.log out.json sf_dir
"""
import json
import re
import sys


def main(log_path, out_path, sf_dir):
    qs, reps = {}, {}
    pat = re.compile(r"\[bench\] (\S+)\s+([0-9.]+) s\s+\[([0-9. ]+)\]")
    for line in open(log_path, errors="replace"):
        m = pat.search(line)
        if m:
            qs[m.group(1)] = float(m.group(2))
            reps[m.group(1)] = [float(x) for x in m.group(3).split()]
    total = sum(v for v in qs.values() if v >= 0)
    out = {
        "metric": "total", "value": total, "unit": "sec", "sf": sf_dir,
        "n_queries": len(qs), "source": f"harvested from {log_path}",
        "queries": qs, "reps_per_query": reps,
    }
    json.dump(out, open(out_path, "w"))
    print(f"{len(qs)} queries, total {total:.1f}s -> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
