#!/bin/bash
# Round-4 TPU queue B (post-noise-job): default bench capture + cache
# pre-warm for the driver, EDVR-L serving (window + seq), and the DUF
# B=16 dispatch-regime reconciliation probe.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r4b.pid
trap 'rm -f /tmp/tpu_queue_r4b.pid' EXIT
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
LOG=bench_default_r4_run1.log step "default bench run 1 (cold compiles; NOT authoritative)" 5400 python bench.py
LOG=bench_default_r4_run2.log step "default bench run 2 (cached; authoritative)" 3600 python bench.py
LOG=bench_edvr_l_serve_r4_run1.log step "EDVR-L serve run 1 (compiles)" 4500 python bench.py --edvr-l-serve
LOG=bench_edvr_l_serve_r4_run2.log step "EDVR-L serve run 2 (cached)" 2400 python bench.py --edvr-l-serve
LOG=bench_edvr_l_serve_seq_run1.log step "EDVR-L serve SEQ run 1 (compiles)" 4500 python bench.py --edvr-l-serve --seq
LOG=bench_edvr_l_serve_seq_run2.log step "EDVR-L serve SEQ run 2 (cached)" 2400 python bench.py --edvr-l-serve --seq
LOG=duf_dispatch_probe_b16.log step "DUF B=16 per-call dispatch probe" 2400 python tools/duf_serve_bench.py --mode both --batch 16 --dispatch
LOG=duf_dispatch_probe_b16_run2.log step "DUF B=16 per-call dispatch probe run 2" 1200 python tools/duf_serve_bench.py --mode both --batch 16 --dispatch
echo; echo "=== queue B done — $(date +%H:%M:%S) ==="
