#!/bin/bash
# Full 100x probe sweep over every declared query (VERDICT r12 item 1).
# Chunks the query list so one JVM failure can't kill the sweep and the
# session caches can't accumulate across all 237 queries. Appends
# machine-readable rows to docs/probe100.jsonl (see ScaleProbe100).
# Usage: tools/probe_sweep.sh [queries-file] [chunk-size]
set -u
cd /root/repo
LIST="${1:-/tmp/probe_queries.txt}"
CHUNK="${2:-15}"
LEDGER="${GRAFT_PROBE_LEDGER:-docs/probe100.jsonl}"
# 100x chunks hold transient per-query state (memory-sink rows while a
# query is being timed, spill maps); 12g was the r13 chunk-OOM (exit 52
# killed s14/s28 mid-chunk). ScaleProbe100 scrubs between queries, so
# this only needs to cover ONE query's transient peak.
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-32g}"
LOG=/tmp/probe_sweep.log
: > "$LOG"

# skip queries that already have a ledger row (restartable)
TODO=$(python3 - "$LIST" "$LEDGER" <<'EOF'
import json, sys, os
names = [l.strip() for l in open(sys.argv[1]) if l.strip()]
done = set()
if os.path.exists(sys.argv[2]):
    for line in open(sys.argv[2]):
        try: done.add(json.loads(line)["q"])
        except Exception: pass
print(" ".join(n for n in names if n not in done))
EOF
)
set -- $TODO
total=$#
echo "[sweep] $total queries to probe" | tee -a "$LOG"
i=0
while [ $# -gt 0 ]; do
  batch=""
  n=0
  while [ $# -gt 0 ] && [ $n -lt "$CHUNK" ]; do
    batch="$batch $1"; shift; n=$((n+1)); i=$((i+1))
  done
  echo "[sweep] chunk through $i/$total: $batch" | tee -a "$LOG"
  GRAFT_PROBE_LEDGER="$LEDGER" \
    sbt -batch "runMain graft.tools.ScaleProbe100$batch" 2>&1 \
    | grep -E "\[probe100\]|error\]" >> "$LOG"
done
echo "[sweep] DONE" | tee -a "$LOG"
