#!/bin/bash
# Round-5 TPU queue K: THIRD SEED for the production-scale (nf=64,
# 5+10) Gd frontier. The shipped deployment claims rest on a two-seed
# mean (Gd=2 matches-or-beats Gd=8 by +0.16 dB; Gd=1 −0.12 dB under)
# with measured seed noise ~0.4 dB — a third seed either tightens or
# revises both. Fresh root (seed 2 bakes new data textures + training
# seeds); the full 7-kernel row so seed 2 contributes to the widened
# queue-J matrix in one pass. Gd=8 leg trains vsr/MFDN/meta once; the
# Gd=2/1 legs reuse the shared root's MFDN + data and train only their
# own vsr/meta checkpoints (same layout queue D/H used).
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5k.pid
trap 'rm -f /tmp/tpu_queue_r5k.pid' EXIT
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
K="iso:1.8 aniso:2.4:1.2:0.79 iso:1.2 iso:2.6 iso:3.5 aniso:3.2:0.8:0.3 iso:1.8:n0.03"
root=/tmp/blind_r5_prod_s2
for gd in 8 2 1; do
  LOG=blind_prod_wide_gd${gd}_s2.log \
    step "nf=64 5+10 Gd=$gd seed 2 (train+eval, 7 kernels)" 14400 \
    python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 \
      --back-rbs 10 --groups $gd --kernels $K --seed 2 \
      --meta-iters 150 --adapt-lrs 1e-6 1e-5 --root $root
done
echo; echo "=== queue K done — $(date +%H:%M:%S) ==="
