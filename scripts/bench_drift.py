#!/usr/bin/env python
"""Per-query drift report: current BENCH_DETAIL.json vs a previous round's
driver bench (BENCH_r{N}.json 'parsed' payload). Flags ratio > 1.3x — the
isolated best-of-3 adjudication threshold from the round protocol."""
import json
import sys

cur = json.load(open("BENCH_DETAIL.json"))["queries"]
prev_doc = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_r10.json"))
prev = prev_doc.get("parsed", prev_doc).get("queries", {})
rows = []
for name, t in cur.items():
    p = prev.get(name)
    if isinstance(t, dict):
        t = t.get("best", t.get("s"))
    if isinstance(p, dict):
        p = p.get("best", p.get("s"))
    # skip malformed/unknown-shape entries instead of crashing the report
    if isinstance(t, (int, float)) and isinstance(p, (int, float)) and p:
        rows.append((t / p, name, p, t))
rows.sort(reverse=True)
flagged = [r for r in rows if r[0] > 1.3]
print(f"{len(rows)} compared, {len(flagged)} over 1.3x")
for ratio, name, p, t in flagged[:20]:
    print(f"  {name}: {p:.2f}s -> {t:.2f}s ({ratio:.2f}x)")
if rows:
    import statistics
    print("median ratio:", round(statistics.median(r[0] for r in rows), 3))
