#!/usr/bin/env python3
"""Drop ledger rows for queries that need a quiet re-probe (contention-
contaminated measurements, replanned queries, probe failures), so
probe_sweep.sh re-runs exactly those. Usage:
  tools/probe_requeue.py q1 q2 ...        # drop named rows
  tools/probe_requeue.py --over 25        # drop every ratio>25 row
"""
import json
import sys

LEDGER = "docs/probe100.jsonl"
rows = [json.loads(l) for l in open(LEDGER)]
if sys.argv[1] == "--over":
    t = float(sys.argv[2])
    drop = {r["q"] for r in rows
            if r.get("ratio", 0) > t or "error" in r
            or ("raised" in r and "SparkException" in r.get("raised", ""))}
else:
    drop = set(sys.argv[1:])
kept = [r for r in rows if r["q"] not in drop]
with open(LEDGER, "w") as f:
    for r in kept:
        f.write(json.dumps(r) + "\n")
print(f"dropped {len(rows) - len(kept)} rows: "
      f"{', '.join(sorted(drop & {r['q'] for r in rows}))}")
