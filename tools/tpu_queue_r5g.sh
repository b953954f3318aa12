#!/bin/bash
# Round-5 TPU queue G (chained after queue D): the north-star decider.
# Queue D measured the production-shape (nf=64, 5+10) Gd frontier at
# Gd=8 vs Gd=2 and found Gd=2 BEATS Gd=8 (+0.35 dB on both kernels,
# results_r05/blind_prod_gd{8,2}.log). If Gd=1 also matches/beats Gd=8
# at production scale, then the FLAGSHIP config (Gd=1, seq) at 25.79
# fps = 5.16x is a quality-parity config and the SURVEY §6 north star
# (>=5x at PSNR parity) is met outright. Shares /tmp/blind_r5_prod so
# the MFDN estimator + data trainings are reused; only the Gd=1
# meta-training + evals run fresh.
# Chains into queue E (diagnosis legs) when done.
set -u -o pipefail
cd "$(dirname "$0")/.."
# wait for queue D to release the tunnel (single-process rule)
while [ -e /tmp/tpu_queue_r5d.pid ] && kill -0 "$(cat /tmp/tpu_queue_r5d.pid)" 2>/dev/null; do
  sleep 30
done
echo $$ > /tmp/tpu_queue_r5g.pid
trap 'rm -f /tmp/tpu_queue_r5g.pid' EXIT
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
LOG=blind_prod_gd1.log step "blind protocol nf=64 5+10 Gd=1 (shared root)" 14400 \
  python tools/blind_adaptation_check.py --nf 64 --front-rbs 5 --back-rbs 10 \
    --groups 1 --kernels $K --seed 0 --meta-iters 150 \
    --adapt-lrs 1e-6 1e-5 --root /tmp/blind_r5_prod
echo; echo "=== queue G done — $(date +%H:%M:%S); chaining queue E ==="
exec bash tools/tpu_queue_r5e.sh
