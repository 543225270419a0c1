#!/usr/bin/env bash
# Mechanized round close — regenerates EVERY gate artifact from the
# CURRENT tree (the round-8/round-10 failure mode was closing on
# evidence older than the last commits). Usage:
#
#   dev/close.sh <label> [prev_close.json]
#
# e.g. dev/close.sh r11a dev/bench_r10f_close.json
#
# Writes dev/oracle_parity_sf0.01_<label>.txt,
#        dev/oracle_parity_sf0.1_<label>.txt,
#        dev/bench_<label>_close.json
# and REFUSES to overwrite existing artifacts (pick a fresh label).
# Steps: compile -> full test suite (SKIP_TESTS=1 to skip) ->
# PlanAudit -> Verify+DuckDB parity at BOTH SFs -> bench at sf0.1,
# PER-QUERY MIN ACROSS BENCH_PASSES RUNS (default 3 — shared-box
# contention swings single passes up to 4x; the min is the honest
# steady state) -> query-count assertion (bench keys == verify dirs,
# zero failures) -> gate-geomean / breach / regression report ->
# dirty-tree check.
set -euo pipefail
cd "$(dirname "$0")/.."

LABEL="${1:?usage: dev/close.sh <label> [prev_close.json]}"
PREV="${2:-}"
P001="dev/oracle_parity_sf0.01_${LABEL}.txt"
P01="dev/oracle_parity_sf0.1_${LABEL}.txt"
BENCH="dev/bench_${LABEL}_close.json"
for f in "$P001" "$P01" "$BENCH"; do
  [ -e "$f" ] && { echo "REFUSING: $f exists — pick a fresh label"; exit 1; }
done

echo "== [1/7] compile =="
sbt -batch compile >/dev/null

if [ "${SKIP_TESTS:-0}" != "1" ]; then
  echo "== [2/7] full test suite =="
  sbt -batch test 2>&1 | tail -3
else
  echo "== [2/7] tests SKIPPED by request =="
fi

echo "== [3/7] PlanAudit =="
sbt -batch "runMain graft.PlanAudit" 2>&1 | grep -E "\[audit\]" | tail -1 \
  | tee /tmp/close_audit.txt
grep -q "flagged=0" /tmp/close_audit.txt || { echo "PlanAudit FLAGGED"; exit 1; }

echo "== [4/7] oracle parity sf0.01 =="
rm -rf /tmp/close_verify001
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/close_verify001" \
  > /dev/null 2>&1 || { echo "Verify sf0.01 crashed"; exit 1; }
python3 dev/check_oracle.py /root/testdata/sf0.01 /tmp/close_verify001 \
  | tee "$P001" | tail -3
grep -q "FAILURES: 0" "$P001" || { echo "PARITY FAILURES at sf0.01"; exit 1; }
[ "$(cat /tmp/close_verify001/_failures.json)" = "{}" ] \
  || { echo "Verify recorded query failures"; exit 1; }

echo "== [5/7] oracle parity sf0.1 =="
rm -rf /tmp/close_verify01
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.1 /tmp/close_verify01" \
  > /dev/null 2>&1 || { echo "Verify sf0.1 crashed"; exit 1; }
python3 dev/check_oracle.py /root/testdata/sf0.1 /tmp/close_verify01 \
  | tee "$P01" | tail -3
grep -q "FAILURES: 0" "$P01" || { echo "PARITY FAILURES at sf0.1"; exit 1; }
[ "$(cat /tmp/close_verify01/_failures.json)" = "{}" ] \
  || { echo "Verify recorded query failures"; exit 1; }

echo "== [6/7] close bench at sf0.1 (min of ${BENCH_PASSES:-3} passes) =="
# Per-query minimum across N passes: shared-box contention swings a
# single pass up to 4x, and round 12 burned three manual recheck
# benches clearing phantom >2x breaches — the minimum is the honest
# steady-state number by construction.
PASSES="${BENCH_PASSES:-3}"
rm -f /tmp/close_bench_*.json /tmp/close_bench_*.log
for i in $(seq 1 "$PASSES"); do
  echo "   bench pass $i/$PASSES"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > "/tmp/close_bench_$i.log" 2>&1 \
    || { echo "bench pass $i crashed"; tail -5 "/tmp/close_bench_$i.log"; exit 1; }
  grep -o '{"metric".*' "/tmp/close_bench_$i.log" > "/tmp/close_bench_$i.json"
done
python3 - "$BENCH" /tmp/close_bench_*.json <<'EOF'
import json, sys
out_path, paths = sys.argv[1], sys.argv[2:]
runs = [json.load(open(p)) for p in paths]
base = runs[0]
qmin = {q: min(r["queries"][q] for r in runs) for q in base["queries"]}
for r in runs[1:]:
    assert set(r["queries"]) == set(base["queries"]), "query sets differ between passes"
base["queries"] = qmin
base["value"] = round(sum(qmin.values()), 6)
base["bench_passes"] = len(runs)
json.dump(base, open(out_path, "w"))
print(f"merged min-of-{len(runs)}: total {base['value']}s over {len(qmin)} queries")
EOF

echo "== [7/7] assertions + report =="
N_BENCH=$(python3 -c "import json,sys; print(len(json.load(open('$BENCH'))['queries']))")
N_VERIFY=$(find /tmp/close_verify01 -mindepth 1 -maxdepth 1 -type d | wc -l)
echo "bench queries: $N_BENCH   verify dirs: $N_VERIFY"
[ "$N_BENCH" = "$N_VERIFY" ] \
  || { echo "COUNT MISMATCH: bench $N_BENCH != verify $N_VERIFY"; exit 1; }
# --strict: a NEW gate breach or any >1.5x regression vs the prev
# close FAILS the close (the r14o1 lesson: the report printed both and
# the round shipped anyway). Keep BENCH_PASSES identical between the
# before and after closes of an optimization round — min-of-7 vs
# min-of-5 made the r14 comparison needlessly arguable.
python3 dev/bench_report.py "$BENCH" ${PREV:+"$PREV" --strict}

if [ -n "$(git status --porcelain)" ]; then
  echo "WARNING: tree is DIRTY — the artifacts above describe uncommitted"
  echo "state; commit (including these artifacts) before calling the round"
  echo "closed:"
  git status --short
  exit 1
fi
echo "CLOSE OK: $P001 $P01 $BENCH all regenerated from HEAD"
