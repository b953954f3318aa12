#!/bin/bash
# Round-5 TPU queue J: WIDEN the production-scale (nf=64, 5+10) blind
# quality matrix from 2 kernels to 7, reusing the cached training roots
# (/tmp/blind_r5_prod{,_s1} hold the supervised/MFDN/meta checkpoints
# for Gd 8/2/1 at both seeds — these legs are EVAL-ONLY). Kernels
# complete the round-3 toy matrix (iso 1.2 / 2.6) and the round-4
# robustness cells (iso 3.5 near the sampler edge, 4:1 anisotropy,
# 3% read noise) at the shipped EDVR-M shape.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5j.pid
trap 'rm -f /tmp/tpu_queue_r5j.pid' EXIT
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
K="iso:1.2 iso:2.6 iso:3.5 aniso:3.2:0.8:0.3 iso:1.8:n0.03"
for seed in 0 1; do
  root=/tmp/blind_r5_prod
  [ "$seed" = 1 ] && root=/tmp/blind_r5_prod_s1
  for gd in 8 2 1; do
    LOG=blind_prod_wide_gd${gd}_s${seed}.log \
      step "widen nf=64 5+10 Gd=$gd seed $seed (eval-only)" 10800 \
      python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 \
        --back-rbs 10 --groups $gd --kernels $K --seed $seed \
        --meta-iters 150 --adapt-lrs 1e-6 1e-5 --root $root
  done
done
echo; echo "=== queue J done — $(date +%H:%M:%S) ==="
