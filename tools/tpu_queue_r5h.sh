#!/bin/bash
# Round-5 TPU queue H: seed-1 confirmation of the production-scale Gd
# frontier reversal (queue D/G measured seed 0 only: Gd=2 +0.35 dB over
# Gd=8, Gd=1 -0.08 dB). One more seed hardens/falsifies the ordering
# that now carries the deployment guidance and the north-star claim.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5h.pid
trap 'rm -f /tmp/tpu_queue_r5h.pid' EXIT
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
K="iso:1.8 aniso:2.4:1.2:0.79"
LOG=blind_prod_gd8_s1.log step "blind nf=64 5+10 Gd=8 seed 1" 14400 \
  python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 --back-rbs 10 \
    --groups 8 --kernels $K --seed 1 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_prod_s1
LOG=blind_prod_gd2_s1.log step "blind nf=64 5+10 Gd=2 seed 1 (shared root)" 14400 \
  python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 --back-rbs 10 \
    --groups 2 --kernels $K --seed 1 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_prod_s1
LOG=blind_prod_gd1_s1.log step "blind nf=64 5+10 Gd=1 seed 1 (shared root)" 14400 \
  python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 --back-rbs 10 \
    --groups 1 --kernels $K --seed 1 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_prod_s1
echo; echo "=== queue H done — $(date +%H:%M:%S) ==="
