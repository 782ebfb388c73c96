#!/bin/bash
# Mutation-kill audit of the FormulaAudit magic-constant families
# (VERDICT r12 item 7): flip each registered constant in a scratch
# build and record that the named independent-truth spec FAILS. A
# mutant that SURVIVES means the registry's "fails if the constant
# drifts" claim is false for that row -> it needs a new fixture.
#
# CMS (x05) bucket/width constants are EXCLUDED by contract: the
# registry documents them as contract-preserving (the CMS guarantee
# holds for ANY hash family; the guarantee itself is the pinned truth).
#
# Usage: tools/mutation_audit.sh   (runs all mutants, ~20 min)
# Output: /tmp/mutation_audit.md (markdown table for SURVEY §5.1)
set -u
cd /root/repo
OPS=src/main/scala/graft/operators
OUT=/tmp/mutation_audit.md
LOG=/tmp/mutation_audit.log
: > "$LOG"
echo "| mutant | file | flip | killing spec | outcome |" > "$OUT"
echo "| --- | --- | --- | --- | --- |" >> "$OUT"

run_mutant() {
  local id="$1" file="$2" find="$3" repl="$4" suite="$5" tname="$6"
  if ! grep -qF "$find" "$file"; then
    echo "| $id | $file | (PATTERN NOT FOUND) | $suite | ERROR |" >> "$OUT"
    return
  fi
  python3 - "$file" "$find" "$repl" <<'EOF'
import sys
p, find, repl = sys.argv[1:4]
s = open(p).read()
assert s.count(find) == 1, f"{p}: pattern count {s.count(find)} != 1"
open(p, "w").write(s.replace(find, repl))
EOF
  local rc_apply=$?
  if [ $rc_apply -ne 0 ]; then
    git checkout -- "$file"
    echo "| $id | $file | (AMBIGUOUS PATTERN) | $suite | ERROR |" >> "$OUT"
    return
  fi
  echo "=== $id ===" >> "$LOG"
  sbt -batch "testOnly graft.$suite -- -z \"$tname\"" >> "$LOG" 2>&1
  local rc=$?
  git checkout -- "$file"
  local outcome
  if [ $rc -ne 0 ]; then outcome="KILLED"; else outcome="SURVIVED"; fi
  echo "| $id | ${file##*/} | \`$find\` -> \`$repl\` | $suite: $tname | $outcome |" >> "$OUT"
  echo "[$id] $outcome" | tee -a "$LOG"
}

run_mutant hll-raw-divisor "$OPS/Extras.scala" \
  'HllZ = 1L << 25' 'HllZ = 1L << 24' \
  SketchBoundsSpec "x01's RAW-branch estimate holds at 5000 distinct keys"
run_mutant hll-alpha "$OPS/Extras.scala" \
  '0.7213 / (1.0 + 1.079 / 256.0)' '0.7013 / (1.0 + 1.079 / 256.0)' \
  SketchBoundsSpec "x01's RAW-branch estimate holds at 5000 distinct keys"
run_mutant x02-ceil-target "$OPS/Extras.scala" \
  '$"n" * k + 99L' '$"n" * k + 0L' \
  SketchBoundsSpec "x02 binned quantiles within one bin width of the exact type-1 values"
run_mutant e54-landing-bin "$OPS/Events.scala" \
  '$"cum" >= $"target" && $"cum" - $"bc" < $"target"' \
  '$"cum" > $"target" && $"cum" - $"bc" < $"target"' \
  GraftSpec "e54 binned fences agree with e53's exact ones within one bin width"
run_mutant d33-ln-freeze "$OPS/TextStatsOps.scala" \
  'round(log($"rank") * 1e4)' 'round(log($"rank") * 1e3)' \
  GraftSpec "d33 Zipf slope equals a plain-Scala brute-force recomputation"
run_mutant d26-ln-freeze "$OPS/TextStatsOps.scala" \
  'round(log($"n" / $"c".cast("double")) * 1e6)' \
  'round(log($"n" / $"c".cast("double")) * 1e5)' \
  GraftSpec "d26 token entropy equals a plain-Scala brute-force recomputation"
run_mutant d29-damping "$OPS/TextLshOps.scala" \
  'val base = 15L * unit / 100L' 'val base = 14L * unit / 100L' \
  GraftSpec "d29 equals a plain-Scala power iteration on the declared pair graph"
run_mutant d58-budget "$OPS/TextCurationOps.scala" \
  '$"total_tokens" * 3L, lit(4L)' '$"total_tokens" * 2L, lit(4L)' \
  GraftSpec "d58 equals the iterative water-filling algorithm"
run_mutant d28-bm25-k1 "$OPS/TextRetrievalOps.scala" \
  'val Bm25K1 = 1.2' 'val Bm25K1 = 1.35' \
  GraftSpec "d28 BM25 equals a plain-Scala brute-force recomputation"
run_mutant e56-gini-rank "$OPS/Events.scala" \
  '$"ic" * 2L - ($"nu" + 1L) * $"tc"' '$"ic" * 2L - ($"nu" + 2L) * $"tc"' \
  GraftSpec "e56 gini equals the mean-absolute-difference identity"

echo "=== table ==="
cat "$OUT"
