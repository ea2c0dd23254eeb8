#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1): per-query ratio,
sorted by scaling factor, flagging superlinear outliers. Usage:
  python3 tools/compare_bench.py BENCH_r13.json /tmp/bench_sf1.json [data_ratio=10]
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


a = load(sys.argv[1])
b = load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb), key=lambda q: -(qb[q] / max(qa[q], 1e-9)))
print(f"{'query':34s} {'base':>8s} {'new':>8s} {'x':>7s}")
for q in common:
    x = qb[q] / max(qa[q], 1e-9)
    flag = " <— superlinear" if x > ratio and qb[q] > 2.0 else ""
    print(f"{q:34s} {qa[q]:8.2f} {qb[q]:8.2f} {x:7.2f}{flag}")
print(f"\nsum base={sum(qa[q] for q in common):.1f}s "
      f"new={sum(qb[q] for q in common):.1f}s "
      f"overall x={sum(qb[q] for q in common)/sum(qa[q] for q in common):.2f} "
      f"(data x{ratio:.0f})")
only_b = sorted(set(qb) - set(qa))
if only_b:
    print("only in new:", ", ".join(f"{q}={qb[q]:.2f}s" for q in only_b))
