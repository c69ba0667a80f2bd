#!/bin/bash
# Round-3 TPU measurement batch — run when the axon tunnel recovers.
# Ordered by value; each step logs to /tmp/r3batch/.
set -u
mkdir -p /tmp/r3batch
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a /tmp/r3batch/summary.log
  timeout "$TMO" "$@" > "/tmp/r3batch/$name.log" 2>&1
  rc=$?
  tail -6 "/tmp/r3batch/$name.log" | tee -a /tmp/r3batch/summary.log
  echo "rc=$rc" | tee -a /tmp/r3batch/summary.log
}

TMO=${TMO:-600}
run bench python bench.py                       # verify drive + fold-v2 headline
run twopass_100k python -m tools.twopass_ab 100000 2 4
run twopass_1m  python -m tools.twopass_ab 1000000 2 4 8
run exec_stats  python -m tools.exec_stats 100000 1000000
run whitted_trace python -m tools.trace_frame 100000 --whitted
run gather python -m tools.gather_micro
run whitted_1080 python -m tools.whitted_bench --width 1920 --height 1080 --depth 3 --frames 5
echo "=== batch done $(date +%H:%M:%S)" | tee -a /tmp/r3batch/summary.log
