#!/bin/bash
# Round-4 TPU measurement batch (VERDICT r3 #1/#2/#4/#7): the wedge-proofed
# bench, the dormant-lever A/Bs, executed-pair stats, and the Whitted 1080p
# re-measurement.  Each step logs to /tmp/r4batch/; summary.log is the
# round artifact source for TPU_RUNS_r4.md.
set -u
mkdir -p /tmp/r4batch
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a /tmp/r4batch/summary.log
  timeout "$TMO" "$@" > "/tmp/r4batch/$name.log" 2>&1
  rc=$?
  tail -8 "/tmp/r4batch/$name.log" | tee -a /tmp/r4batch/summary.log
  echo "rc=$rc" | tee -a /tmp/r4batch/summary.log
}

TMO=${TMO:-900}
run bench python bench.py                       # wedge-proofed + whitted_1080p_ms
run tests_tpu python -m pytest tests_tpu/ -q    # hardware suite into the artifact
run twopass_100k python -m tools.twopass_ab 100000 2 4 8
run twopass_1m  python -m tools.twopass_ab 1000000 2 4 8 16
run exec_stats  python -m tools.exec_stats 100000 1000000
run whitted_1080 python -m tools.whitted_bench --width 1920 --height 1080 --depth 3 --frames 5
# second-session additions: operand schemes/depth probes + culling floor
run dma_ab_100k python -m tools.dma_ab 100000
run dma_ab_1m   python -m tools.dma_ab 1000000
run subtile_100k python -m tools.subtile_ab 100000
run subtile_1m  python -m tools.subtile_ab 1000000
echo "=== batch done $(date +%H:%M:%S)" | tee -a /tmp/r4batch/summary.log
