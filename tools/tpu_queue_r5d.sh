#!/bin/bash
# Round-5 TPU queue D: the blind-adaptation quality protocol at the
# PRODUCTION EDVR-M shape (nf=64, front 5, back 10) — round-4 verdict
# weak item 1: every deployment-guiding quality number so far was
# measured at nf=32, 2+3. Two kernels (iso sigma1.8 + the matrix's
# anisotropic cell), seed 0, Gd=8 vs Gd=2 (the recommended config) —
# confirms or revises the "Gd=2 within 0.35 dB" claim at scale.
# Plus the SFDN-vs-MFDN estimator A/B (verdict item 8) at the historical
# toy shape so it slots into the existing matrix.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5d.pid
trap 'rm -f /tmp/tpu_queue_r5d.pid' EXIT
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
# Protocol matches the round-3 matrix exactly (meta 150, lr sweep
# [1e-6, 1e-5], adapt_steps 20) so the production-shape Gd gap is
# directly comparable to the toy-shape 0.36 dB figure.
K="iso:1.8 aniso:2.4:1.2:0.79"
LOG=blind_prod_gd8.log step "blind protocol nf=64 5+10 Gd=8" 14400 \
  python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 --back-rbs 10 \
    --groups 8 --kernels $K --seed 0 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_prod
LOG=blind_prod_gd2.log step "blind protocol nf=64 5+10 Gd=2 (shared root)" 14400 \
  python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 --back-rbs 10 \
    --groups 2 --kernels $K --seed 0 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_prod
LOG=blind_est_mfdn.log step "estimator A/B leg 1: MFDN (toy shape)" 7200 \
  python tools/blind_adaptation_check.py --estimator mfdn \
    --kernels iso:1.8 --seed 0 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_est
LOG=blind_est_sfdn.log step "estimator A/B leg 2: SFDN (shared root)" 7200 \
  python tools/blind_adaptation_check.py --estimator sfdn \
    --kernels iso:1.8 --seed 0 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_est
echo; echo "=== queue D done — $(date +%H:%M:%S) ==="
