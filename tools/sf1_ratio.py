#!/usr/bin/env python3
"""Compare an sf1 bench JSON line against the sf0.1 artifact's medians.

Usage: sf1_ratio.py <sf1_bench_log> <BENCH_rN.json> [ratio_flag]

Prints every query's (sf1_s, sf0.1_s, ratio) sorted by ratio desc and
flags ratios above the threshold (default 15 — the superlinear-creep
bar: sf1 is 10x the rows, so a healthy linear-ish query lands near
10x or below once fixed overheads amortize).
"""
import json
import re
import sys


def bench_queries(path):
    txt = open(path).read()
    # the bench prints one JSON object per line among log noise; take
    # the last line carrying a "queries" object
    best = None
    for line in txt.splitlines():
        line = line.strip()
        i = line.find('{"metric"')
        if i >= 0 and '"queries"' in line:
            best = line[i:]
    if best is None:
        raise SystemExit(f"no bench JSON with queries found in {path}")
    return json.loads(best)


def main():
    sf1_log, r17, flag = sys.argv[1], sys.argv[2], \
        float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    a = bench_queries(sf1_log)
    m = re.search(r'\{"metric".*"queries".*\}', open(r17).read())
    # second arg: a driver BENCH_rN.json artifact OR another bench log
    b = json.loads(m.group(0)) if m else bench_queries(r17)
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q, v1 in qa.items():
        v01 = qb.get(q)
        if v01 is None or not isinstance(v1, (int, float)):
            rows.append((float("inf"), q, v1, v01))
            continue
        rows.append((v1 / v01, q, v1, v01))
    rows.sort(reverse=True)
    n_flag = 0
    for ratio, q, v1, v01 in rows:
        mark = ""
        if ratio > flag:
            mark = "  <-- SUPERLINEAR?"
            n_flag += 1
        r = f"{ratio:8.1f}" if ratio != float("inf") else "     n/a"
        v01s = f"{v01:8.3f}" if isinstance(v01, (int, float)) else "     n/a"
        print(f"{q:35s} sf1={v1:9.3f}s sf0.1={v01s}s ratio={r}{mark}")
    total1 = sum(v for v in qa.values() if isinstance(v, (int, float)))
    total01 = sum(v for v in qb.values() if isinstance(v, (int, float)))
    print(f"\nTOTAL sf1={total1:.1f}s sf0.1={total01:.1f}s "
          f"ratio={total1 / total01:.1f}  flagged>{flag}x: {n_flag}")
    print(f"status fields: sf1={a.get('status')} ")


if __name__ == "__main__":
    main()
