"""dynavsr_tpu — a TPU-native blind video super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
esw0116/DynaVSR (WACV 2021): EDVR-style VSR backbone (PCD deformable
alignment, TSA fusion), TOF/DUF baselines, MFDN/SFDN downscaling estimators,
MAML-style meta-training and fully on-device per-clip test-time adaptation.

Layout (see SURVEY.md §7):
  configs/   typed config + YAML loading (reference: options/options.py)
  data/      frame IO, windows, MATLAB-bicubic resize, degradation synthesis
  ops/       Pallas kernels + pure-JAX references (DCN, grid_sample, ...)
  models/    EDVR / TOF / DUF / MFDN-SFDN as flax.linen modules (NHWC)
  train/     supervised + MAML meta trainers, losses, LR schedules
  adapt/     test-time adaptation (jitted per-clip lax.scan, clip-parallel)
  eval/      bit-compatible PSNR/SSIM, Vid4/REDS4 harness
  convert/   PyTorch .pth -> params pytree importer (OIHW->HWIO)
  parallel/  mesh + sharding helpers (data/clip parallelism over ICI)
"""

__version__ = "0.1.0"
