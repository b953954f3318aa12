"""Measured torch-CPU anchor for the GPU-baseline derivation (BASELINE.md).

The reference publishes no throughput numbers (SURVEY.md §6 [H]) and this
environment has no GPU, so bench.py's vs_baseline denominator is an
estimate. This tool grounds it with two measurements (round-2 VERDICT
item 3):

1. **torch-CPU anchor** — the SAME pipeline bench.py measures (per clip:
   5 Adam adaptation steps on the SLR pseudo-task, then 16-window
   sliding-window inference; EDVR-M groups=8 at Vid4-like 144x176 LR),
   run with the pure-torch replicas from tests/torch_replicas.py
   (vectorized gather-based modulated deformable conv — no custom CUDA,
   the honest "torch without the reference's .cu kernels" baseline) on
   this host's CPU, fp32, all cores.

2. **FLOP count** — XLA cost analysis of our EDVR-M forward at the exact
   bench shapes, from which BASELINE.md derives a V100-class fps estimate
   (published V100 peak x a sustained-efficiency band).

    python tools/torch_cpu_anchor.py [--repeats 2] [--windows 16]

Prints one JSON line with both numbers.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tests"))


def flops_per_window(h=144, w=176, nframes=5):
    """XLA cost analysis of one EDVR-M forward window on the CPU backend."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from dynavsr_tpu.models.edvr import EDVR

    model = EDVR(nf=64, nframes=nframes, groups=8, front_RBs=5, back_RBs=10)
    x = jnp.zeros((1, nframes, h, w, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    compiled = jax.jit(model.apply).lower(params, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--adapt-steps", type=int, default=5)
    ap.add_argument("--adapt-windows", type=int, default=8)
    ap.add_argument("--skip-flops", action="store_true")
    args = ap.parse_args()

    import torch

    from torch_replicas import EDVR as TorchEDVR

    h, w, nframes, scale = 144, 176, 5, 4
    torch.manual_seed(0)
    model = TorchEDVR(nf=64, nframes=nframes, groups=8, front_RBs=5,
                      back_RBs=10)
    model.eval()

    lr_windows = torch.rand(args.windows, nframes, 3, h, w)
    slr_windows = torch.rand(args.adapt_windows, nframes, 3, h // scale,
                             w // scale)
    lr_centers = torch.rand(args.adapt_windows, 3, h, w)

    def adapt_and_infer():
        # fork -> k Adam steps on (SLR -> LR center) -> sliding inference;
        # mirrors adapt/adaptation.py make_adapt_and_infer step for step.
        import copy

        m = copy.deepcopy(model)
        opt = torch.optim.Adam(m.parameters(), lr=1e-6)
        for _ in range(args.adapt_steps):
            opt.zero_grad()
            pred = m(slr_windows)
            diff = pred - lr_centers
            loss = torch.sqrt(diff * diff + 1e-6).mean()  # Charbonnier
            loss.backward()
            opt.step()
        with torch.no_grad():
            outs = [m(lr_windows[i: i + 4]) for i in range(0, args.windows, 4)]
        return torch.cat(outs)

    # EDVR's pyramid needs H, W % 4 == 0: 36x44 SLR is fine.
    t_warm0 = time.perf_counter()
    adapt_and_infer()  # warmup (allocator, MKL planning)
    warm = time.perf_counter() - t_warm0
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        adapt_and_infer()
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = args.windows / best

    out = {
        "metric": "torch_cpu_edvr_m_x4_fps_with_adaptation",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "best_s_per_clip": round(best, 2),
        "warmup_s": round(warm, 2),
        "torch_threads": torch.get_num_threads(),
    }
    if not args.skip_flops:
        fw = flops_per_window(h, w, nframes)
        out["edvr_m_fwd_flops_per_window"] = fw
        out["infer_flops_per_clip"] = fw * args.windows
    print(json.dumps(out))
    print(f"# times={[round(t, 2) for t in times]}", file=sys.stderr)


if __name__ == "__main__":
    main()
