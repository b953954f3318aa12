#!/bin/bash
# Round-4 TPU queue D: per-call (session-reproducible) regime A/Bs for the
# two packed-conv defaults that were justified by amortized-regime numbers
# now known to be unreliable (results_r04/tpu_queue_r4c.log):
#   1. TOF phase-packed s2d conv path (shipped default ON since round 3)
#   2. DUF packed trunk (serving_clone default since round 4a) — re-probe
#      with session-unique input seeds to rule out tunnel memoization.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r4d.pid
trap 'rm -f /tmp/tpu_queue_r4d.pid' EXIT
R=results_r04
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
LOG=tof_dispatch_ab_run1.log step "TOF per-call A/B run 1 (plain compiles)" 2400 python tools/tof_serve_bench.py --mode both --reps 6 --dispatch
LOG=tof_dispatch_ab_run2.log step "TOF per-call A/B run 2" 1200 python tools/tof_serve_bench.py --mode both --reps 6 --dispatch
LOG=duf_dispatch_b16_uniqseed.log step "DUF B=16 per-call, session-unique seeds" 1200 python tools/duf_serve_bench.py --mode both --batch 16 --dispatch
echo; echo "=== queue D done — $(date +%H:%M:%S) ==="
