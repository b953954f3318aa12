#!/bin/bash
# Round-4 TPU queue C: (a) DUF bench-context discrepancy — fresh-process
# bench.py --duf-serve vs the tool at the same B=4 (default-line leg read
# 42.8 ms/window where the standalone sweep says 14.6); (b) finish the
# per-call dispatch probes queue B lost to the session crash.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r4c.pid
trap 'rm -f /tmp/tpu_queue_r4c.pid' EXIT
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
LOG=duf_bench_leg_fresh_run1.log step "bench --duf-serve fresh process run 1" 1800 python bench.py --duf-serve
LOG=duf_bench_leg_fresh_run2.log step "bench --duf-serve fresh process run 2 (cached)" 900 python bench.py --duf-serve
LOG=duf_tool_b4_s2d.log step "tool s2d B=4 (same-session comparator)" 900 python tools/duf_serve_bench.py --mode s2d --batch 4
LOG=duf_dispatch_probe_b16_run2.log step "DUF B=16 per-call dispatch probe run 2" 1200 python tools/duf_serve_bench.py --mode both --batch 16 --dispatch
LOG=duf_dispatch_b2.log step "per-call duf both batch=2" 1200 python tools/duf_serve_bench.py --mode both --batch 2 --dispatch
LOG=duf_dispatch_b4.log step "per-call duf both batch=4" 1200 python tools/duf_serve_bench.py --mode both --batch 4 --dispatch
LOG=duf_dispatch_b8.log step "per-call duf both batch=8" 1200 python tools/duf_serve_bench.py --mode both --batch 8 --dispatch
echo; echo "=== queue C done — $(date +%H:%M:%S) ==="
