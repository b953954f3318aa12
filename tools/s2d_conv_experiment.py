"""Space-to-depth conv experiment: can SpyNet's lane-starved 7x7 convs be
reformulated to feed the MXU full 128-lane tiles?

Motivation (ROOFLINE.md / NOTES_ROUND4 #7): TOF x4 serving is conv-bound —
SpyNet's 7x7 stacks with cout in {32, 64, 32, 16, 2} run the MXU at
~cout/128 of peak because the conv-as-matmul output lane dimension IS cout.

Reformulation (pure XLA, no gathers): a stride-1 KxK conv equals a stride-2
(K+1)x(K+1) conv producing 4*cout phase-packed channels, followed by
depth-to-space:

    y[2p+a, 2q+b, co] = sum_{dy,dx} x[2p+a+dy-K//2, ...] w[dy, dx, :, co]
                      = (conv(x_pad3, W, stride=2))[p, q, (a, b, co)]
    with W[k, j, ci, (a,b,co)] = w[k-a, j-b, ci, co]  (zero outside 0..K-1)

FLOP inflation (K+1)^2/K^2 (64/49 = 1.31x for K=7) buys 4x output lanes —
model predicts ~3x on cout<=32 layers, ~1.5x on cout=64.

Run: python tools/s2d_conv_experiment.py  (needs the TPU; one process only)
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# The ONE tested copy of the packing math — this tool measures the shipped
# formulation, not a parallel re-derivation of it.
from dynavsr_tpu.ops.conv_s2d import conv2d_s2d as conv_s2d  # noqa: E402


def conv_plain(x: jax.Array, w: jax.Array) -> jax.Array:
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timeit(conv, x, w, reps=20):
    """Amortize `reps` conv executions inside ONE executable (per-call tunnel
    dispatch is tens of ms and would otherwise dominate; cf.
    tools/pallas_consume_experiment.py). The input is varied per iteration
    (i-dependent bias) and every iteration's output feeds the result, so
    neither the tunnel memoizer nor DCE can elide work."""

    def body(i, acc):
        xi = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
        return acc + conv(xi, w)[0, 0, :4, 0].astype(jnp.float32)

    f = jax.jit(lambda x, w: jax.lax.fori_loop(0, reps, body, jnp.zeros(4)))
    _ = np.asarray(f(x, w))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(f(x + jnp.asarray(1e-5, x.dtype), w))
    return (time.perf_counter() - t0) / reps


def spynet_block_widths():
    # (cin, cout) per conv in one SpyNetBlock (input 3+3+2=8 channels)
    return [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=704)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    print(f"# per-conv timings, B={args.batch} {args.h}x{args.w}, K={args.k}, bf16")
    print(f"{'cin':>4} {'cout':>4} {'plain ms':>9} {'s2d ms':>9} {'speedup':>8} {'max|err|':>9}")
    tot_plain = tot_s2d = 0.0
    for cin, cout in spynet_block_widths():
        ks = jax.random.split(key, 2)
        key = ks[0]
        x = jax.random.uniform(ks[0], (args.batch, args.h, args.w, cin), jnp.bfloat16)
        w = (jax.random.uniform(ks[1], (args.k, args.k, cin, cout), jnp.bfloat16) - 0.5) * 0.1
        fp = jax.jit(conv_plain)
        fs = jax.jit(conv_s2d)
        err = float(jnp.max(jnp.abs(fp(x, w).astype(jnp.float32) - fs(x, w).astype(jnp.float32))))
        tp = timeit(conv_plain, x, w, args.reps)
        ts = timeit(conv_s2d, x, w, args.reps)
        tot_plain += tp
        tot_s2d += ts
        print(f"{cin:>4} {cout:>4} {tp*1e3:>9.3f} {ts*1e3:>9.3f} {tp/ts:>8.2f} {err:>9.4f}")
    print(f"block totals: plain {tot_plain*1e3:.2f} ms, s2d {tot_s2d*1e3:.2f} ms, "
          f"speedup {tot_plain/tot_s2d:.2f}x")


if __name__ == "__main__":
    main()
