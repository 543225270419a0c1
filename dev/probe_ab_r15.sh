#!/usr/bin/env bash
# r15 dev helper: probe a query list twice — parallelismFirst=false
# (the new GraftSession default) vs =true (Spark default, r14 behavior)
# — at 32 cores, REPS reps each. Usage: probe_ab_r15.sh q1,q2,... [reps]
set -euo pipefail
cd "$(dirname "$0")/.."
QS="${1:?query list}"
REPS="${2:-3}"
echo "== A: parallelismFirst=false (new default) =="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS="$REPS" \
  sbt -batch "runMain graft.QueryProbe $QS /root/testdata/sf0.1" 2>&1 \
  | grep -E "\[probe\].*min=" || true
echo "== B: parallelismFirst=true (r14 behavior) =="
GRAFT_AQE_PARALLELISM_FIRST=true SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS="$REPS" \
  sbt -batch "runMain graft.QueryProbe $QS /root/testdata/sf0.1" 2>&1 \
  | grep -E "\[probe\].*min=" || true
