#!/bin/bash
# Round-4 TPU queue F: grouped streaming re-measure after replacing the
# vmapped-params lowering with sequential per-group dispatches of the
# plain executable (G=2 was 99.9, G=4 108.3 ms/frame/stream vmapped).
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r4f.pid
trap 'rm -f /tmp/tpu_queue_r4f.pid' EXIT
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
LOG=stream_groups_g2_dispatch.log step "B=4 adapt-then-serve, G=2 per-group dispatch" 2400 python tools/stream_bench.py --streams 4 --adapt --param-groups 2
LOG=stream_groups_g4_dispatch.log step "B=4 adapt-then-serve, G=4 (per-stream) per-group dispatch" 2400 python tools/stream_bench.py --streams 4 --adapt --param-groups 4
echo; echo "=== queue F done — $(date +%H:%M:%S) ==="
