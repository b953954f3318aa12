#!/bin/bash
# Round-4 TPU queue E:
#   1-2. Default bench twice — run 1 pays the cold remote-AOT compiles of
#        the two NEW legs (tof_fps/duf_fps adapt+infer products) so the
#        driver's end-of-round bench and run 2 land on cached
#        executables; run 2 is authoritative.
#   3-4. Grouped-streaming frontier at B=4 adapt-then-serve: G=1 (all
#        streams share ONE adapted param set — should approach the 51.1
#        ms/frame/stream shared-params cost) and G=2 (two groups of two).
#        G=4 (fully per-stream) measured 108.3 ms/frame/stream in
#        results_r04/stream_adapt_multi.log.
# Streaming legs are HOST-sensitive: no concurrent pytest (CLAUDE.md).
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r4e.pid
trap 'rm -f /tmp/tpu_queue_r4e.pid' EXIT
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
LOG=bench_default_r4e_run1.log step "default bench run 1 (cold compiles of tof_fps/duf_fps legs; NOT authoritative)" 5400 python bench.py
LOG=bench_default_r4e_run2.log step "default bench run 2 (authoritative)" 3600 python bench.py
LOG=stream_groups_g1.log step "B=4 adapt-then-serve, one shared adapted group (G=1)" 2400 python tools/stream_bench.py --streams 4 --adapt --param-groups 1
LOG=stream_groups_g2.log step "B=4 adapt-then-serve, two groups of two (G=2)" 2400 python tools/stream_bench.py --streams 4 --adapt --param-groups 2
echo; echo "=== queue E done — $(date +%H:%M:%S) ==="
