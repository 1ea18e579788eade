#!/usr/bin/env python3
"""Render the sf0.1 -> sf1 per-query scaling table (markdown) from two
Bench JSON lines. Usage: scaling_table.py <sf01.json> <sf1.json>"""
import json
import sys

with open(sys.argv[1]) as f:
    small = json.load(f)
with open(sys.argv[2]) as f:
    big = json.load(f)

qs = sorted(small["queries"])
rows = []
for q in qs:
    s, b = small["queries"][q], big["queries"].get(q)
    if b is None:
        continue
    rows.append((q, s, b, b / s))
rows.sort(key=lambda r: -r[3])

print(f"| query | sf0.1 (med of {small.get('reps', '?')}) | sf1 | ×10-data factor |")
print("|---|---|---|---|")
for q, s, b, f in rows:
    print(f"| `{q}` | {s:.2f} s | {b:.2f} s | {f:.1f}× |")
ts, tb = sum(r[1] for r in rows), sum(r[2] for r in rows)
print(f"| **total** | **{ts:.1f} s** | **{tb:.1f} s** | **{tb/ts:.1f}×** |")
