#!/bin/bash
# Round-4g serial TPU queue: measure the lax.map redesigns.
#   1. clip_parallel_probe serial vs batched(lax.map) — the offline
#      clip-parallel path after the round-4d swap (vmapped leg skipped:
#      measured 2.633s this session, clip_parallel_probe_g2.log).
#   2. stream_bench grouped serving G=2 / G=4 (run1 warms compiles,
#      run2 authoritative — CLAUDE.md first-timed-call gotcha).
# ONE process on the tunnel at a time; stop sentinel honored between
# steps (touch /tmp/tpu_stop to hand off after the current step).
set -u -o pipefail
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu_queue_r4g.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
R=results_r04

step() { # step <timeout_s> <log> <cmd...>
  if [ -f /tmp/tpu_stop ]; then echo "[queue] stop sentinel — exiting"; exit 0; fi
  local t=$1 log=$2; shift 2
  echo "[queue] $(date +%H:%M:%S) start: $* -> $log"
  timeout "$t" "$@" 2>&1 | tee "$log"
  echo "[queue] rc=$? for: $*"
}

step 3000 $R/clip_parallel_probe_batched.log \
  python tools/clip_parallel_probe.py --clips 2 --groups 2 --skip vmapped
step 2400 $R/stream_groups_g2_laxmap_run1.log \
  python tools/stream_bench.py --adapt --streams 4 --param-groups 2
step 2400 $R/stream_groups_g2_laxmap_run2.log \
  python tools/stream_bench.py --adapt --streams 4 --param-groups 2
step 2400 $R/stream_groups_g4_laxmap_run1.log \
  python tools/stream_bench.py --adapt --streams 4 --param-groups 4
step 2400 $R/stream_groups_g4_laxmap_run2.log \
  python tools/stream_bench.py --adapt --streams 4 --param-groups 4
echo "[queue] done $(date +%H:%M:%S)"
