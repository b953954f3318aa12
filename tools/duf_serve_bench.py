"""DUF x4 serving forward bench: packed channel-major trunk on/off.

Times the full DUF forward at Vid4 x4 serving shapes (7-frame LR windows,
144x176, bf16) with reps amortized INSIDE one executable (per-call tunnel
dispatch would otherwise dominate — CLAUDE.md gotchas). The s2d=True path
runs the dense trunk spatially phase-packed (models/duf.py docstring;
~80% of DUF-16L serving FLOPs sit in cout=32 convs at 1/4 MXU lanes).

Run: python tools/duf_serve_bench.py [--reps 8] [--mode both|s2d|plain]
     [--batch 4] [--layers 3]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(s2d: bool, reps: int, batch: int, layers: int,
          h: int = 144, w: int = 176, dispatch: bool = False) -> float:
    from dynavsr_tpu.models.duf import DUF

    model = DUF(scale=4, dense1_layers=layers, dtype=jnp.bfloat16, s2d=s2d)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.uniform(ks[0], (batch, 7, h, w, 3))
    params = jax.jit(model.init)(ks[1], x[:1])

    if dispatch:
        # Per-call regime (what adapt_bench's infer leg measures): each
        # rep is its own tunnel dispatch on a distinct device-resident
        # input; best-of-reps. Compares against the amortized fori_loop
        # regime below to bound the dispatch/loop-scheduling delta.
        f = jax.jit(lambda x: model.apply(params, x)[0, :4, 0, 0])
        # Session-unique seeds: the tunnel memoizes identical
        # (executable, input) calls across processes (CLAUDE.md gotchas).
        base = (os.getpid() * 1000003) ^ (int(time.time()) & 0xFFFFFF)
        inputs = [jax.random.uniform(jax.random.PRNGKey(base + i), x.shape)
                  for i in range(reps + 1)]
        _ = np.asarray(f(inputs[0]))  # compile + warm
        times = []
        for xi in inputs[1:]:
            t0 = time.perf_counter()
            _ = np.asarray(f(xi))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"s2d={s2d} batch={batch} layers={layers} [per-call]: "
              f"{dt*1e3:.1f} ms/batch = {dt/batch*1e3:.1f} ms/window "
              f"({batch/dt:.2f} windows/s) times="
              f"{[round(t*1e3,1) for t in times]}", flush=True)
        return dt

    def body(i, acc):
        xi = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
        return acc + model.apply(params, xi)[0, :4, 0, 0]

    f = jax.jit(lambda x: jax.lax.fori_loop(0, reps, body, jnp.zeros(4)))
    _ = np.asarray(f(x))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(f(x + jnp.asarray(1e-5, x.dtype)))
    dt = (time.perf_counter() - t0) / reps
    print(f"s2d={s2d} batch={batch} layers={layers}: {dt*1e3:.1f} ms/batch = "
          f"{dt/batch*1e3:.1f} ms/window ({batch/dt:.2f} windows/s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--mode", choices=["both", "s2d", "plain"], default="both")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--layers", type=int, default=3,
                    help="dense1_layers (16L:3, 28L:9, 52L:21)")
    ap.add_argument("--h", type=int, default=144)
    ap.add_argument("--w", type=int, default=176)
    ap.add_argument("--dispatch", action="store_true",
                    help="per-call timing regime (separate dispatches on "
                         "distinct inputs) instead of the amortized "
                         "in-executable fori_loop")
    args = ap.parse_args()

    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    if args.mode in ("plain", "both"):
        t_plain = bench(False, args.reps, args.batch, args.layers,
                        args.h, args.w, args.dispatch)
    if args.mode in ("s2d", "both"):
        t_s2d = bench(True, args.reps, args.batch, args.layers,
                      args.h, args.w, args.dispatch)
    if args.mode == "both":
        print(f"speedup: {t_plain/t_s2d:.2f}x", flush=True)


if __name__ == "__main__":
    main()
