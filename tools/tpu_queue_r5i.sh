#!/bin/bash
# Round-5 TPU queue I: grouped multi-stream adapt-then-serve REMEASURED
# on the round-5 fused push, ALL legs in one session (the round-4
# numbers G=1 65.7 / G=2 65.4 / G=4 71.3 ms/frame/stream predate the
# fused core and were cross-session — CLAUDE.md gotcha: streaming
# design comparisons are only valid in-session). Each leg runs twice;
# run 2 (cached executables) is authoritative. The no-adapt B=4 anchor
# re-runs first so the shared-params baseline is in-session too.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5i.pid
trap 'rm -f /tmp/tpu_queue_r5i.pid' EXIT
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
for run in 1 2; do
  LOG=stream_b4_plain_r5i_run$run.log step "b4 no-adapt anchor run$run" 1800 \
    python tools/stream_bench.py --streams 4
  for g in 1 2 4; do
    LOG=stream_b4_adapt_g${g}_r5i_run$run.log step "b4 adapt G=$g run$run" 3600 \
      python tools/stream_bench.py --streams 4 --adapt --param-groups $g
  done
done
echo; echo "=== queue I done — $(date +%H:%M:%S) ==="
