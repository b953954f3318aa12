"""Probe: does vmapping the per-clip adapt+infer over clips pay the
grouped-conv lowering tax on a single chip?

make_adapt_and_infer_batched (adapt/adaptation.py) vmaps the WHOLE
per-clip pipeline over a leading clips axis. After the first adaptation
step the params are per-clip, so every conv in the adapt scan and the
inference runs with BATCHED WEIGHTS — which XLA lowers to grouped/
looped convs. The streaming serving path measured that lowering at
~1.5x (results_r04/stream_groups_*_dispatch.log vs the vmapped design);
this probe measures the same effect on the offline clip-parallel path
by comparing, on ONE chip at the bench shapes:

  serial:  C sequential dispatches of make_adapt_and_infer (dense convs)
  batched: one make_adapt_and_infer_batched dispatch (lax.map over clips,
           dense convs — the shipped design)
  vmapped: one make_adapt_and_infer_vmapped dispatch over C clips
           (batched conv weights -> grouped lowering; superseded)

Measured 2026-08-19 (EDVR Gd=2, C=2, 16 windows, 5 steps, one chip):
serial 23.43 fps / vmapped 12.15 fps -> the vmap tax is 1.93x
(results_r04/clip_parallel_probe_g2.log); the batched lax.map design
replaced vmap in adapt/adaptation.py on that evidence.

Per-call regime on session-unique inputs (CLAUDE.md timing gotchas).

    python tools/clip_parallel_probe.py [--clips 2] [--groups 2]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--adapt-windows", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--skip", default="",
                    help="comma list: serial,batched,vmapped")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.adapt.adaptation import (
        AdaptConfig,
        make_adapt_and_infer,
        make_adapt_and_infer_batched,
        make_adapt_and_infer_vmapped,
    )
    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    c, h, w, scale = args.clips, 144, 176, 4
    model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                 back_RBs=10, dtype=jnp.bfloat16)
    cfg = AdaptConfig(n_steps=args.steps, lr=1e-6)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    lw_shape = (c, args.windows, 5, h, w, 3)
    slr = jax.random.uniform(
        ks[1], (c, args.adapt_windows, 5, h // scale, w // scale, 3))
    lrc = jax.random.uniform(ks[2], (c, args.adapt_windows, h, w, 3))
    params = jax.jit(model.init)(
        ks[3], jax.random.uniform(ks[0], (1,) + lw_shape[2:]))

    # Session-unique inputs: the tunnel memoizes identical (executable,
    # inputs) calls; inputs[0] is a dedicated warmup, never re-timed.
    seed0 = (os.getpid() ^ int(time.time() * 1e3)) & 0x7FFFFFFF
    inputs = [
        jax.random.uniform(jax.random.PRNGKey(seed0 + i), lw_shape)
        for i in range(args.repeats + 1)
    ]

    def fetch(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(jnp.ravel(leaf)[:8])

    def timeit(call, label):
        fetch(call(inputs[0]))
        times = []
        for lw in inputs[1:]:
            t0 = time.perf_counter()
            fetch(call(lw))
            times.append(time.perf_counter() - t0)
        best = min(times)
        fps = c * args.windows / best
        print(f"{label:28s} best {best:.3f}s = {fps:.2f} fps "
              f"times {[round(t, 3) for t in times]}", flush=True)
        return best

    t_ser = t_b = t_vm = float("nan")
    if "serial" not in skip:
        run1 = make_adapt_and_infer(model, cfg)

        def serial(lw):
            return [run1(params, slr[i], lrc[i], lw[i]) for i in range(c)]

        t_ser = timeit(serial, f"serial {c} dispatches")
    if "batched" not in skip:
        runm = make_adapt_and_infer_batched(model, cfg)
        t_b = timeit(lambda lw: runm(params, slr, lrc, lw),
                     f"batched lax.map C={c}")
    if "vmapped" not in skip:
        runc = make_adapt_and_infer_vmapped(model, cfg)
        t_vm = timeit(lambda lw: runc(params, slr, lrc, lw),
                      f"vmapped C={c}")
    print(f"\nclips={c} groups={args.groups} windows={args.windows} "
          f"steps={args.steps}: serial={t_ser:.3f}s batched={t_b:.3f}s "
          f"vmapped={t_vm:.3f}s -> vmapped/serial = {t_vm / t_ser:.2f}x "
          f"batched/serial = {t_b / t_ser:.2f}x", flush=True)


if __name__ == "__main__":
    main()
