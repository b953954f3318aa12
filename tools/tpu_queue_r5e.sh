#!/bin/bash
# Round-5 TPU queue E (after queue D): the diagnosis legs.
#   1. C2 profiles — locate the Gd=2-vs-Gd=1 inference gap (0.426 vs
#      0.395 s, adapt_split_g{1,2}.log) at kernel and forward level.
#   2. adapt_only profile with --dump — identify the 115 ms fusion:Custom
#      in the adaptation scan (profile_adapt_only_g2.log).
#   3. stream_probe — decompose the fused-push regression (94.4 vs 74.7
#      ms/frame, stream_b1_r5.log).
#   4. TOF/DUF window-streamer first measurements (round-4 verdict item 5;
#      queue C was cut before these legs ran).
# HOST-sensitive: no concurrent pytest during the stream legs.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5e.pid
trap 'rm -f /tmp/tpu_queue_r5e.pid' EXIT
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
LOG=profile_fwd_g2.log step "EDVR forward profile Gd=2" 1800 python tools/profile_ops.py --workload edvr_fwd --groups 2 --top 20 --dump 10
LOG=profile_fwd_g1.log step "EDVR forward profile Gd=1" 1800 python tools/profile_ops.py --workload edvr_fwd --groups 1 --top 20 --dump 10
LOG=profile_dcn_g2.log step "DCN kernel profile Gd=2 (L1 scale, 20 frames)" 1800 python tools/profile_ops.py --workload dcn --groups 2 --top 12 --dump 8
LOG=profile_dcn_g1.log step "DCN kernel profile Gd=1" 1800 python tools/profile_ops.py --workload dcn --groups 1 --top 12 --dump 8
LOG=profile_adapt_dump_g2.log step "adapt scan profile Gd=2 with raw names" 2400 python tools/profile_ops.py --workload adapt_only --groups 2 --top 25 --dump 14
LOG=stream_probe_g2.log step "streaming push decomposition Gd=2" 3600 python tools/stream_probe.py --groups 2
LOG=stream_probe_g1.log step "streaming push decomposition Gd=1" 2400 python tools/stream_probe.py --groups 1
LOG=stream_tof_r5.log step "TOF window streamer" 4500 python tools/stream_bench.py --arch tof
LOG=stream_tof_r5_run2.log step "TOF window streamer run 2" 2400 python tools/stream_bench.py --arch tof
LOG=stream_duf_r5.log step "DUF window streamer" 3600 python tools/stream_bench.py --arch duf
LOG=stream_duf_r5_run2.log step "DUF window streamer run 2" 1800 python tools/stream_bench.py --arch duf
echo; echo "=== queue E done — $(date +%H:%M:%S) ==="
