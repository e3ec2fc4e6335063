#!/usr/bin/env python3
"""Compare two Bench JSON records per-query: ratio = time_b / time_a.

Usage: python3 tools/scale_compare.py <bench_a.json> <bench_b.json> [linear_factor]

linear_factor is the data-scale ratio between the two runs (default 10);
queries whose time ratio exceeds it are flagged SUPERLINEAR. Driver-side
analysis tooling only — not part of the library.
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
lin = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb), key=lambda q: -(qb[q] / max(qa[q], 1e-9)))
print(f"{'query':40s} {'a_sec':>8s} {'b_sec':>8s} {'ratio':>7s}")
sup = []
for q in common:
    r = qb[q] / max(qa[q], 1e-9)
    # a <1s base amplifies JIT/scheduler noise into fake ratios; only
    # flag superlinear when the larger run costs real time
    flag = " SUPERLINEAR" if r > lin and qb[q] > 1.0 else ""
    if flag:
        sup.append(q)
    print(f"{q:40s} {qa[q]:8.2f} {qb[q]:8.2f} {r:7.1f}{flag}")
print(f"\ntotals: a={a['value']:.1f}s ({len(qa)}q)  b={b['value']:.1f}s ({len(qb)}q)")
print(f"common={len(common)}  superlinear(> {lin}x, >1s): {len(sup)} {sup}")
only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
if only_a:
    print(f"only in a: {only_a}")
if only_b:
    print(f"only in b: {only_b}")
