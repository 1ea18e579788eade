#!/usr/bin/env python3
"""Shared-set comparison of two BENCH_local_*.json records: per-query
median ratio over the intersection, sorted by ratio, with unstable
flags carried so a contaminated median is visible next to its delta.
Usage: bench_delta.py OLD.json NEW.json [ratio_threshold=1.3]
"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
shared = sorted(set(old['queries']) & set(new['queries']))
uo, un = set(old.get('unstable', [])), set(new.get('unstable', []))
rows = []
for q in shared:
    a, b = old['queries'][q], new['queries'][q]
    rows.append((b / a if a > 0 else float('inf'), q, a, b,
                 ('old!' if q in uo else '') + ('new!' if q in un else '')))
rows.sort(reverse=True)
so = sum(old['queries'][q] for q in shared)
sn = sum(new['queries'][q] for q in shared)
print(f"shared {len(shared)} queries: old sum {so:.1f}s new sum {sn:.1f}s "
      f"ratio {sn/so:.2f}x")
print(f"unstable flags: old {len(uo)} new {len(un)}; "
      f"gc: old {old.get('gc_policy','rep?')}/{old.get('gc_secs','?')}s "
      f"new {new.get('gc_policy','rep?')}/{new.get('gc_secs','?')}s")
print(f"\nqueries over {thr}x (new/old):")
for r, q, a, b, flag in rows:
    if r > thr:
        print(f"  {r:6.2f}x  {q:32s} {a:8.3f} -> {b:8.3f}  {flag}")
print(f"\nqueries under {1/thr:.2f}x (improved):")
for r, q, a, b, flag in rows:
    if r < 1 / thr:
        print(f"  {r:6.2f}x  {q:32s} {a:8.3f} -> {b:8.3f}  {flag}")
