#!/bin/bash
# Round-5 TPU queue B: adapt-vs-infer segment splits for Gd=2 and Gd=1
# (locating the ~14 ms/clip separating gd2_seq 24.47 fps from the 25.0
# north-star bar — BENCH_r05 run2 / results_r05/bench_default_r5_run2.log).
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5b.pid
trap 'rm -f /tmp/tpu_queue_r5b.pid' EXIT
R=results_r05
mkdir -p "$R"
step() {
  if [ -e /tmp/tpu_stop ]; then
    echo "[queue] stop sentinel /tmp/tpu_stop — exiting before: $1"; exit 0
  fi
  echo; echo "=== $1 — $(date +%H:%M:%S) ==="
  shift
  timeout "$1" "${@:2}" 2>&1 | tee "$R/$LOG"
  echo "[queue] rc=$?"
}
LOG=adapt_split_g2.log step "adapt/infer split Gd=2" 3600 python tools/adapt_bench.py --groups 2
LOG=adapt_split_g1.log step "adapt/infer split Gd=1" 3600 python tools/adapt_bench.py --groups 1
LOG=adapt_split_g2_run2.log step "adapt/infer split Gd=2 run 2 (cached)" 1800 python tools/adapt_bench.py --groups 2
echo; echo "=== queue B done — $(date +%H:%M:%S) ==="
