#!/bin/bash
# Round-5 TPU queue C2 (short): locate the Gd=2-vs-Gd=1 inference gap
# (0.426 vs 0.395 s — adapt_split_g{1,2}.log) with kernel-level and
# full-forward profiles. The dcn_fused row count and lane width are
# IDENTICAL at Gd=2 and Gd=1 (J=2K rows of 128 lanes either way), so the
# 31 ms must be source-build bytes (4-corner src is 2x), VMEM residency,
# or PCD glue — the profiles decide.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5c2.pid
trap 'rm -f /tmp/tpu_queue_r5c2.pid' EXIT
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
LOG=profile_dcn_g2.log step "DCN kernel profile Gd=2 (L1 scale, 20 frames)" 1800 python tools/profile_ops.py --workload dcn --groups 2 --top 12
LOG=profile_dcn_g1.log step "DCN kernel profile Gd=1" 1800 python tools/profile_ops.py --workload dcn --groups 1 --top 12
LOG=profile_fwd_g2.log step "EDVR forward profile Gd=2" 1800 python tools/profile_ops.py --workload edvr_fwd --groups 2 --top 20
LOG=profile_fwd_g1.log step "EDVR forward profile Gd=1" 1800 python tools/profile_ops.py --workload edvr_fwd --groups 1 --top 20
echo; echo "=== queue C2 done — $(date +%H:%M:%S) ==="
