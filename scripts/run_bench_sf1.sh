#!/bin/bash
# Bench sweep without the sbt lock; delegates to run_main.sh, which also
# guards against measuring a stale build (src newer than classes).
SPARK_GRAFT_SF_DIR=${1:-/tmp/sf1} SPARK_GRAFT_BENCH_OUT=${2:-target/bench_full_sf1.json} \
  bash "$(dirname "$0")/run_main.sh" graft.Bench
rc=$?
echo "BENCH_EXIT=$rc"
exit $rc
