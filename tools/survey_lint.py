#!/usr/bin/env python3
"""Standing lint for SURVEY.md's audit trail (VERDICT r12 item 2).

The builder-session-20 phantom-citation incident proved that any
hand-written audit row citing a test can be phantom until a machine
checks it. FormulaAuditSpec machine-checks its own registry; this lint
extends the same discipline to SURVEY.md itself -- the audit trail the
judge reads -- plus the per-query probe-coverage gate (VERDICT r12
item 1).

Checks (whole SURVEY, not just section 2.11 -- history blocks cite the
same artifacts):
  1. every full query id  [qdesvmx]NN_word  is a declared query
  2. every short id       [qdesvmx]NN       prefixes a declared query
  3. every cited *Spec/*Props suite is a defined class/object in
     src/test/scala/graft
  4. every file.scala:line anchor names a file that exists (resolved
     against src/main/scala/graft, src/test/scala/graft, repo root)
     with the line number within the file
  5. every DECLARED query has a probe row in docs/probe100.jsonl
     (skipped with --no-probes while a sweep is in flight)

usage: survey_lint.py <declared-names.json> [--repo ROOT] [--no-probes]
       declared-names.json = JSON array of query names, or the
       oracle_sql.json object Verify dumps (keys are used)
exit 0 = clean; exit 1 = findings (each printed as "FAIL: ...").
"""
import json
import os
import re
import sys

FAMILIES = "qdesvmx"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repo = "."
    if "--repo" in sys.argv:
        repo = sys.argv[sys.argv.index("--repo") + 1]
    check_probes = "--no-probes" not in sys.argv
    declared_raw = json.load(open(args[0]))
    declared = set(declared_raw if isinstance(declared_raw, list)
                   else declared_raw.keys())

    survey = open(os.path.join(repo, "SURVEY.md"), encoding="utf-8").read()
    test_dir = os.path.join(repo, "src/test/scala/graft")
    test_corpus = "\n".join(
        open(os.path.join(test_dir, f), encoding="utf-8").read()
        for f in sorted(os.listdir(test_dir)) if f.endswith(".scala"))
    main_corpus = ""
    for root, _, files in os.walk(os.path.join(repo, "src/main/scala")):
        for f in files:
            if f.endswith(".scala"):
                main_corpus += open(os.path.join(root, f),
                                    encoding="utf-8").read() + "\n"

    fails = []

    # 1. full query ids: declared, or a literal tag in library source
    #    (raise-message tags like "e56_gini" are real quoted artifacts)
    for qid in sorted(set(re.findall(
            rf"\b([{FAMILIES}]\d\d_\w+)\b", survey))):
        if qid not in declared and f'"{qid}"' not in main_corpus:
            fails.append(f"query id {qid} cited in SURVEY is not declared "
                         "and is no source literal")

    # 2. short ids must prefix a declared query (word-boundary tokens
    #    like "q26", "s01" in prose and tables) or be a real spec-layer
    #    artifact (v04, the demoted brute-force baseline, lives only in
    #    LshRecallSpec -- a short id in neither place is phantom)
    prefixes = {q[:3] for q in declared}
    for sid in sorted(set(re.findall(
            rf"\b([{FAMILIES}]\d\d)\b(?!_)", survey))):
        if sid not in prefixes and not re.search(rf"\b{sid}\b", test_corpus):
            fails.append(f"short id {sid} cited in SURVEY prefixes no "
                         "declared query and appears in no test source")

    # 3. suite citations
    for suite in sorted(set(re.findall(r"\b([A-Z]\w+(?:Spec|Props))\b",
                                       survey))):
        if (f"class {suite}" not in test_corpus
                and f"object {suite}" not in test_corpus):
            fails.append(f"suite {suite} cited in SURVEY is not defined "
                         "in src/test/scala/graft")

    # 4. file:line anchors
    roots = ["src/main/scala/graft", "src/test/scala/graft", "."]
    for m in re.finditer(r"`?([\w/.-]+\.(?:scala|py)):(\d+)", survey):
        rel, line = m.group(1), int(m.group(2))
        path = next((os.path.join(repo, r, rel) for r in roots
                     if os.path.isfile(os.path.join(repo, r, rel))), None)
        if path is None:
            fails.append(f"anchor {rel}:{line} names a missing file")
            continue
        n = sum(1 for _ in open(path, encoding="utf-8"))
        if line > n:
            fails.append(f"anchor {rel}:{line} exceeds file length {n}")

    # 5. probe coverage (the standing per-query scale gate)
    # 6. adjudication coverage (VERDICT r13 item 4): every ledger row
    #    probe_table.py classes ADJUDICATE (ratio>25) or that records a
    #    guard raise must have a note in docs/probe_adjudications.json;
    #    stale notes (query no longer qualifying, or not declared) are
    #    also findings so the registry cannot rot.
    if check_probes:
        ledger = os.path.join(repo, "docs/probe100.jsonl")
        probed, needs_adj = set(), set()
        if os.path.exists(ledger):
            for row in open(ledger, encoding="utf-8"):
                try:
                    rec = json.loads(row)
                except json.JSONDecodeError:
                    continue
                if "error" in rec:
                    continue
                probed.add(rec["q"])
                if "raised" in rec or rec.get("ratio", 0) > 25:
                    needs_adj.add(rec["q"])
        missing = sorted(declared - probed)
        if missing:
            fails.append(f"{len(missing)} declared queries have no "
                         f"probe100 ledger row: {', '.join(missing[:15])}"
                         + (" ..." if len(missing) > 15 else ""))
        adj_path = os.path.join(repo, "docs/probe_adjudications.json")
        adj = set()
        if os.path.exists(adj_path):
            adj = {k for k in json.load(open(adj_path))
                   if not k.startswith("_")}
        for q in sorted(needs_adj - adj):
            fails.append(f"probe row {q} classes ADJUDICATE (ratio>25 "
                         "or raised) but has no note in "
                         "docs/probe_adjudications.json")
        for q in sorted(adj - needs_adj):
            fails.append(f"adjudication note {q} is stale: no ledger row "
                         "with ratio>25 or a raise")

    for f in fails:
        print(f"FAIL: {f}")
    if not fails:
        print(f"survey lint clean: {len(declared)} declared queries, "
              f"probes {'checked' if check_probes else 'skipped'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
