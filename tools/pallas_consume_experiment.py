"""Microbench: Pallas multiply+contract consumption of the DCN gathered
block vs the XLA formulation (wfield broadcast + multi-contraction dot).

Shapes = one L1 frame of the parity config: J=72, NF=25344, 4cg=32, cout=64.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

J, NF, CL, CO = 72, 25344, 32, 64
CG = 8
TN = 1408   # NF = 18 * 1408
TJ = 8      # J = 9 * 8


def xla_consume(v, wc, w4):
    # v: (J, NF, CL); wc: (4, J, NF); w4: (J, CL, CO)
    wfield = jnp.concatenate(
        [jnp.broadcast_to(wc[c][..., None], (J, NF, CG)) for c in range(4)],
        axis=-1)
    return jax.lax.dot_general(
        v * wfield, w4, dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)


def kernel(v_ref, wc_ref, w4_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(t, acc):
        vb = v_ref[t]  # (TN, CL)
        f0 = jnp.broadcast_to(wc_ref[4 * t][:, None], (TN, CG))
        f1 = jnp.broadcast_to(wc_ref[4 * t + 1][:, None], (TN, CG))
        f2 = jnp.broadcast_to(wc_ref[4 * t + 2][:, None], (TN, CG))
        f3 = jnp.broadcast_to(wc_ref[4 * t + 3][:, None], (TN, CG))
        field = jnp.concatenate([f0, f1, f2, f3], axis=1).astype(jnp.bfloat16)
        return acc + jax.lax.dot(
            vb * field, w4_ref[t], preferred_element_type=jnp.float32)

    o_ref[:] += jax.lax.fori_loop(
        0, TJ, body, jnp.zeros((TN, CO), jnp.float32))


def pallas_consume(v, wc, w4):
    # wc arrives (4, J, NF) -> (J, 4, NF) -> (J*4, NF) so a j-chunk's corner
    # rows are contiguous.
    wc_r = wc.transpose(1, 0, 2).reshape(J * 4, NF).astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NF, CO), jnp.float32),
        grid=(NF // TN, J // TJ),
        in_specs=[
            pl.BlockSpec((TJ, TN, CL), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ * 4, TN), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, CL, CO), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, CO), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )(v, wc_r, w4)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    v = jax.random.uniform(ks[0], (J, NF, CL), jnp.bfloat16)
    wc = jax.random.uniform(ks[1], (4, J, NF), jnp.bfloat16)
    w4 = jax.random.uniform(ks[2], (J, CL, CO), jnp.bfloat16) * 0.1

    def rep20(f):
        def g(v, wc, w4):
            def body(i, acc):
                o = f(v + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-4), wc, w4)
                return acc + o[0, 0]
            return jax.lax.fori_loop(0, 20, body, jnp.float32(0.0))
        return jax.jit(g)

    fx20 = rep20(xla_consume)
    fp20 = rep20(pallas_consume)
    fx = jax.jit(xla_consume)
    fp = jax.jit(pallas_consume)
    ox = np.asarray(fx(v, wc, w4))
    op = np.asarray(fp(v, wc, w4))
    print("max|diff|", np.abs(ox - op).max(), " rel",
          np.abs(ox - op).max() / np.abs(ox).max())

    def bench(f, label, reps=5):
        ts = []
        for i in range(reps):
            vi = v + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter()
            o = f(vi, wc, w4)
            _ = np.asarray(o[:4, 0])
            ts.append(time.perf_counter() - t0)
        print(f"{label}: best {min(ts)*1e3:.2f} ms  {[round(t*1e3,2) for t in ts]}")

    bench(fx, "XLA consume")
    bench(fp, "Pallas consume")

    def bench20(f, label, reps=4):
        ts = []
        for i in range(reps):
            vi = v + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter()
            o = f(vi, wc, w4)
            _ = float(o)
            ts.append(time.perf_counter() - t0)
        print(f"{label}: best {min(ts)/20*1e3:.3f} ms/frame  {[round(t*1e3,1) for t in ts]}")

    bench20(fx20, "XLA consume x20")
    bench20(fp20, "Pallas consume x20")


if __name__ == "__main__":
    main()
