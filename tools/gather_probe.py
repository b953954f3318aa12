"""Microbench: XLA row-gather / scatter rates at the DCN kernel's shapes.

Pins the roofline numbers in ROOFLINE.md: ns/row as a function of source
size (VMEM-resident vs spilled) and row width, plus the scatter-add rate
(the backward's col2im analog). One TPU process at a time.

    python tools/gather_probe.py
"""

from __future__ import annotations

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()

    def fetch(x):
        np.asarray(jnp.ravel(x)[:8])

    def bench(fn, args_list, label, rows):
        # args_list[0] is warmup-only — the tunnel memoizes identical
        # (executable, inputs) calls, so it must not be re-timed.
        out = fn(*args_list[0])
        fetch(out)
        times = []
        for a in args_list[1:]:
            t0 = time.perf_counter()
            out = fn(*a)
            fetch(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{label:58s} {best*1e3:8.2f} ms  {best/rows*1e9:6.2f} ns/row",
              flush=True)
        return best

    key = jax.random.PRNGKey(0)
    n_rows = 1_822_000  # one 144x176 frame-site at Gd=8: HW*gd*k

    # source-size sweep at 32 bf16 lanes (the 4-corner-packed row)
    for src_rows, tag in [
        (213_120, "one-frame packed src 13.6MB (hp*wp*gd)"),
        (53_280, "quarter src 3.4MB"),
        (426_240, "two-frame src 27MB"),
        (1_704_960, "eight-frame src 109MB"),
    ]:
        src = jax.random.uniform(key, (src_rows, 32), jnp.bfloat16)
        idxs = [
            jax.random.randint(jax.random.PRNGKey(i), (n_rows,), 0, src_rows)
            for i in range(1, 4)
        ]
        f = jax.jit(lambda s, p: jnp.take(s, p, axis=0, mode="clip"))
        bench(f, [(src, p) for p in idxs],
              f"gather 1.82M rows x 32 lanes, {tag}", n_rows)

    # row-width sweep at the one-frame source size
    for lanes in (8, 16, 64, 128):
        src = jax.random.uniform(key, (213_120, lanes), jnp.bfloat16)
        idxs = [
            jax.random.randint(jax.random.PRNGKey(i), (n_rows,), 0, 213_120)
            for i in range(1, 4)
        ]
        f = jax.jit(lambda s, p: jnp.take(s, p, axis=0, mode="clip"))
        bench(f, [(src, p) for p in idxs],
              f"gather 1.82M rows x {lanes} lanes, one-frame src", n_rows)

    # near-sorted indices (the DCN's real access pattern: raster + small
    # offsets) vs uniform random
    base = jnp.arange(n_rows, dtype=jnp.int32) % 213_120
    jit_f = jax.jit(lambda s, p: jnp.take(s, p, axis=0, mode="clip"))
    src = jax.random.uniform(key, (213_120, 32), jnp.bfloat16)
    idxs = [
        jnp.clip(base + jax.random.randint(jax.random.PRNGKey(i), (n_rows,),
                                           -1440, 1440), 0, 213_119)
        for i in range(1, 4)
    ]
    bench(jit_f, [(src, p) for p in idxs],
          "gather 1.82M rows x 32 lanes, NEAR-SORTED idx", n_rows)

    # scatter-add (backward's col2im): grads into the packed source
    def scat(p, g):
        return jnp.zeros((213_120, 32), jnp.bfloat16).at[p].add(g)

    f = jax.jit(scat)
    gs = [jax.random.uniform(jax.random.PRNGKey(i), (n_rows, 32), jnp.bfloat16)
          for i in range(1, 4)]
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (n_rows,), 0, 213_120)
            for i in range(1, 4)]
    bench(f, list(zip(idxs, gs)),
          "scatter-add 1.82M rows x 32 lanes, uniform idx", n_rows)
    idxs_ns = [
        jnp.clip(base + jax.random.randint(jax.random.PRNGKey(i), (n_rows,),
                                           -1440, 1440), 0, 213_119)
        for i in range(1, 4)
    ]
    bench(f, list(zip(idxs_ns, gs)),
          "scatter-add 1.82M rows x 32 lanes, NEAR-SORTED idx", n_rows)


if __name__ == "__main__":
    main()
