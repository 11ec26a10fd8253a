#!/bin/bash
# Serialized TPU measurement session (only ONE process may touch the TPU;
# CLAUDE.md).  Runs the round's standard captures back to back and logs
# each to /tmp/tpu_session/<name>.log.  Usage:
#   bash tools/tpu_session.sh [stage bench parity ladder]
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_session
mkdir -p "$OUT"
steps=${@:-"stage bench parity ladder"}

run() {
  name=$1; shift
  echo "=== $name: $* (
$(date))" | tee -a "$OUT/driver.log"
  timeout "${STEP_TIMEOUT:-3600}" "$@" >"$OUT/$name.log" 2>"$OUT/$name.err"
  echo "=== $name rc=$? ($(date))" | tee -a "$OUT/driver.log"
}

for s in $steps; do
  case "$s" in
    stage)  run stage  python -u tools/stage_table.py --frames 3 ;;
    bench)  run bench  python -u bench.py ;;
    parity) run parity python -u tools/tpu_parity.py
            run parity_bench python -u tools/tpu_parity.py --bench ;;
    ladder) run ladder python -u tools/bench_ladder.py --configs 1 2 3 4 5 --frames 3
            run ladder_streamed python -u tools/bench_ladder.py --configs 6 7 8 --frames 3 ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "session done $(date)" | tee -a "$OUT/driver.log"
