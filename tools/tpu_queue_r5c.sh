#!/bin/bash
# Round-5 TPU queue C: (1) adapt-segment levers — the segment is
# Gd-independent at ~0.275 s = 40% of the Gd=2 clip (adapt_split_g{1,2});
# profile it and sweep the DCN frame-chunk budget at SLR scale.
# (2) streaming measurements on the round-5 fused single-dispatch design
# (B=1, multi-stream, adapt-then-serve) + the new TOF/DUF window
# streamers. HOST-sensitive: no concurrent pytest during these legs.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5c.pid
trap 'rm -f /tmp/tpu_queue_r5c.pid' EXIT
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
LOG=profile_adapt_only_g2.log step "profile adapt scan Gd=2" 2400 python tools/profile_ops.py --workload adapt_only --groups 2 --top 25
LOG=adapt_split_g2_cb4.log step "Gd=2 chunk-budget 4MB" 2400 python tools/adapt_bench.py --groups 2 --chunk-budget 4194304 --skip infer
LOG=adapt_split_g2_cb8.log step "Gd=2 chunk-budget 8MB" 2400 python tools/adapt_bench.py --groups 2 --chunk-budget 8388608 --skip infer
LOG=adapt_split_g1_cb4.log step "Gd=1 chunk-budget 4MB" 2400 python tools/adapt_bench.py --groups 1 --chunk-budget 4194304 --skip infer
LOG=stream_b1_r5.log step "streaming B=1 fused (run 1: compiles)" 3600 python tools/stream_bench.py --groups 2
LOG=stream_b1_r5_run2.log step "streaming B=1 fused (run 2)" 1800 python tools/stream_bench.py --groups 2
LOG=stream_b1_adapt_r5.log step "streaming B=1 adapt-then-serve fused" 3600 python tools/stream_bench.py --groups 2 --adapt
LOG=stream_b4_r5.log step "streaming B=4 shared fused" 3600 python tools/stream_bench.py --groups 2 --streams 4
LOG=stream_b4_g2_r5.log step "streaming B=4 adapt grouped G=2 fused" 4500 python tools/stream_bench.py --groups 2 --streams 4 --adapt --param-groups 2
LOG=stream_tof_r5.log step "TOF window streamer" 4500 python tools/stream_bench.py --arch tof
LOG=stream_tof_r5_run2.log step "TOF window streamer run 2" 2400 python tools/stream_bench.py --arch tof
LOG=stream_duf_r5.log step "DUF window streamer" 3600 python tools/stream_bench.py --arch duf
LOG=stream_duf_r5_run2.log step "DUF window streamer run 2" 1800 python tools/stream_bench.py --arch duf
echo; echo "=== queue C done — $(date +%H:%M:%S) ==="
