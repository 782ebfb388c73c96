#!/usr/bin/env python3
"""Render docs/probe100.jsonl as the SURVEY §6 complete per-query table.

Auto-classifies slopes (the 32-core headroom model from the r9 probe
notes: perfectly linear work shows ratio <= 100 with the gap = idle-core
headroom at base scale):
    <= 8   sublinear (cores absorb it)
    <= 25  linear
    >  25  needs an adjudication note in docs/probe_adjudications.json
           (a documented linear-by-nature reason or a replan — the
           q26/q28/e17 class); with a note it renders as
           "adjudicated", without one as **ADJUDICATE** and the script
           exits 1 (survey_lint.py check 6 enforces the same registry).
    raised = a scale guard fired: the measured at-scale behavior —
           also requires an adjudication note (by-design vs defect).
Usage: probe_table.py [ledger] > table.md
"""
import json
import os
import sys

ledger = sys.argv[1] if len(sys.argv) > 1 else "docs/probe100.jsonl"
adj_path = os.path.join(os.path.dirname(ledger) or ".",
                        "probe_adjudications.json")
adj = {}
if os.path.exists(adj_path):
    adj = {k: v for k, v in json.load(open(adj_path)).items()
           if not k.startswith("_")}
rows = sorted((json.loads(l) for l in open(ledger)), key=lambda r: r["q"])
print("| query | sf0.1 warm | 100× warm | ratio | slope class |")
print("| --- | --- | --- | --- | --- |")
n = {"sub": 0, "lin": 0, "adj": 0, "unadj": 0, "raise": 0}
for r in rows:
    q = r["q"]
    note = adj.get(q)
    if "raised" in r:
        n["raise"] += 1
        tail = (f"adjudicated: {note[:110]}" if note
                else f"**ADJUDICATE** `{r['raised'][:90]}`")
        if not note:
            n["unadj"] += 1
        print(f"| {q} | {r['sf01_warm']:.2f} s | RAISED | — | {tail} |")
    elif "error" in r:
        n["unadj"] += 1
        print(f"| {q} | — | ERROR | — | `{r['error'][:90]}` |")
    else:
        ratio = r["ratio"]
        if ratio <= 8:
            cls, key = "sublinear", "sub"
        elif ratio <= 25:
            cls, key = "linear", "lin"
        elif note:
            cls, key = f"adjudicated: {note[:110]}", "adj"
        else:
            cls, key = "**ADJUDICATE**", "unadj"
        n[key] += 1
        print(f"| {q} | {r['sf01_warm']:.2f} s | {r['x100_warm']:.2f} s "
              f"| {ratio:.1f} | {cls} |")
print(f"\n{len(rows)} rows: {n['sub']} sublinear, {n['lin']} linear, "
      f"{n['adj']} adjudicated, {n['raise']} guard raises, "
      f"{n['unadj']} UNADJUDICATED", file=sys.stderr)
sys.exit(1 if n["unadj"] else 0)
