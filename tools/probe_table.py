#!/usr/bin/env python3
"""Render docs/probe100.jsonl as the SURVEY §6 complete per-query table.

Auto-classifies slopes (the 32-core headroom model from the r9 probe
notes: perfectly linear work shows ratio <= 100 with the gap = idle-core
headroom at base scale):
    <= 8   sublinear (cores absorb it)
    <= 25  linear
    >  25  ADJUDICATE -- needs a documented linear-by-nature reason or a
           replan (the q26/q28/e17 class)
    raised = a scale guard fired: the measured at-scale behavior.
Usage: probe_table.py [ledger] > table.md
"""
import json
import sys

ledger = sys.argv[1] if len(sys.argv) > 1 else "docs/probe100.jsonl"
rows = sorted((json.loads(l) for l in open(ledger)), key=lambda r: r["q"])
print("| query | sf0.1 warm | 100× warm | ratio | slope class |")
print("| --- | --- | --- | --- | --- |")
n = {"sub": 0, "lin": 0, "adj": 0, "raise": 0}
for r in rows:
    q = r["q"]
    if "raised" in r:
        print(f"| {q} | {r['sf01_warm']:.2f} s | RAISED | — | "
              f"guard fired: `{r['raised'][:90]}` |")
        n["raise"] += 1
    elif "error" in r:
        print(f"| {q} | — | ERROR | — | `{r['error'][:90]}` |")
        n["adj"] += 1
    else:
        ratio = r["ratio"]
        cls = ("sublinear" if ratio <= 8 else
               "linear" if ratio <= 25 else "**ADJUDICATE**")
        n["sub" if ratio <= 8 else "lin" if ratio <= 25 else "adj"] += 1
        print(f"| {q} | {r['sf01_warm']:.2f} s | {r['x100_warm']:.2f} s "
              f"| {ratio:.1f} | {cls} |")
print(f"\n{len(rows)} rows: {n['sub']} sublinear, {n['lin']} linear, "
      f"{n['adj']} to adjudicate, {n['raise']} guard raises",
      file=sys.stderr)
