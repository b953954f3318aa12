"""EDVR-L memory/compile proof on TPU (VERDICT.md round-1 item 8).

Compiles and times one supervised step and one second-order meta step at
the reference's EDVR-L size (nf=128, back_RBs=40 — options/train/
train_EDVR_L_*.yml, SURVEY.md §2.1) at the reference's per-device batch
(global 32 / 8 GPUs = 4). SURVEY §7 hard-part #2 flags meta-training
memory at this size; the inner lax.scan + jax.checkpoint design must fit
in one chip's HBM.

    python tools/edvr_l_step_check.py [--batch 4] [--meta-batch 2]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def fetch(tree):
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(jnp.ravel(leaf)[:8])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--meta-batch", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.train.meta import MetaConfig, make_meta_train_step
    from dynavsr_tpu.train.trainer import (
        TrainerConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    model = EDVR(nf=128, nframes=5, groups=8, front_RBs=5, back_RBs=40,
                 dtype=jnp.bfloat16)
    b = args.batch
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.uniform(ks[0], (b, 5, 64, 64, 3), jnp.float32)
    gt = jax.random.uniform(ks[1], (b, 256, 256, 3), jnp.float32)

    t0 = time.perf_counter()
    params = jax.jit(model.init)(ks[2], x[:1])
    fetch(params)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"EDVR-L params: {n_params/1e6:.2f} M (init {time.perf_counter()-t0:.1f}s)")

    cfg = TrainerConfig(lr=4e-4, scheme="constant")
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(cfg))
    step = make_train_step(model, cfg, donate=False)
    t0 = time.perf_counter()
    state, m = step(state, {"LQs": x, "GT": gt})
    fetch(m)
    print(f"supervised step compile+run: {time.perf_counter()-t0:.1f}s "
          f"l_pix={float(m['l_pix']):.4f}")
    times = []
    for i in range(args.repeats):
        xi = jax.random.uniform(ks[3 + (i % 3)], x.shape, jnp.float32)
        t0 = time.perf_counter()
        state, m = step(state, {"LQs": xi, "GT": gt})
        fetch(m)
        times.append(time.perf_counter() - t0)
    sup = min(times)
    print(f"supervised step (batch {b}): {sup:.3f}s = {b/sup:.2f} samples/s/chip")

    # meta step: GT_size 128 like the round-1 meta smoke, 2nd-order grads
    mb = args.meta_batch
    meta = make_meta_train_step(model, MetaConfig(inner_lr=1e-5, inner_steps=1),
                                donate=False)
    batch = {
        "SLR": jax.random.uniform(ks[4], (mb, 5, 8, 8, 3), jnp.float32),
        "LR": jax.random.uniform(ks[5], (mb, 5, 32, 32, 3), jnp.float32),
        "LR_center": jax.random.uniform(ks[6], (mb, 32, 32, 3), jnp.float32),
        "HR_center": jax.random.uniform(ks[7], (mb, 128, 128, 3), jnp.float32),
    }
    mstate = TrainState.create(apply_fn=model.apply, params=state.params,
                               tx=make_optimizer(cfg))
    t0 = time.perf_counter()
    mstate, mm = meta(mstate, batch)
    fetch(mm)
    print(f"meta step compile+run: {time.perf_counter()-t0:.1f}s "
          f"l_outer={float(mm['l_outer']):.4f}")
    times = []
    for i in range(args.repeats):
        batch["LR"] = jax.random.uniform(ks[3 + (i % 3)],
                                         (mb, 5, 32, 32, 3), jnp.float32)
        t0 = time.perf_counter()
        mstate, mm = meta(mstate, batch)
        fetch(mm)
        times.append(time.perf_counter() - t0)
    print(f"meta step (batch {mb}): {min(times):.3f}s")
    print("EDVR-L step check OK")


if __name__ == "__main__":
    main()
