"""Two-process jax.distributed rehearsal (CPU) — VERDICT.md round-1 item 6
+ round-3 item 4 (run the PRODUCT steps across the process boundary).

The multi-host branch (cli/train.py --launcher jax ->
jax.distributed.initialize) was written in round 1 but never executed.
This test launches TWO real processes that form a distributed JAX cluster
over localhost, then checks the pieces the trainer relies on:
  * process_count/process_index are correct on both ranks,
  * the loader's per-process sharding (DistIterSampler analog) draws
    disjoint, deterministic index streams,
  * rank-0 gating picks exactly one writer,
  * a psum across the processes' devices produces the global sum (the
    gradient all-reduce path; gloo CPU collectives),
  * ONE real sharded make_train_step (reference train.py DDP all-reduce
    [H]): batch sharded over the 2x2-device cluster, params replicated —
    both ranks must end with BIT-IDENTICAL params, matching the
    single-process step,
  * ONE clip-parallel make_adapt_and_infer_batched (the DynaVSR product
    loop): 4 clips sharded over the cluster; every clip's SR must match
    the single-process per-clip path.
"""

import pytest

# Compile-heavy on CPU: behind the slow marker (pytest.ini; VERDICT r2 #8).
pytestmark = pytest.mark.slow

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank, (jax.process_index(), rank)
assert jax.device_count() == 4, jax.device_count()  # 2 local x 2 procs

# loader sharding: disjoint deterministic streams per process
from dynavsr_tpu.data.loader import PrefetchLoader
class Rng:
    def __len__(self): return 16
    def __getitem__(self, i): return {"i": i}
l = PrefetchLoader(Rng(), 2, seed=7,
                   process_index=jax.process_index(),
                   process_count=jax.process_count())
idx = l._index_stream()
print("IDX", rank, ",".join(map(str, idx.tolist())), flush=True)

# rank-0 gating (the trainer's logger/ckpt condition)
print("RANK0" if jax.process_index() == 0 else "RANKN", flush=True)

# cross-process psum over all 4 devices (the DP gradient all-reduce path)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()), ("data",))
# global sum with sharded input and replicated output: XLA emits the
# cross-process all-reduce, exactly like the trainer's gradient psum.
f = jax.jit(lambda x: jnp.sum(x),
            in_shardings=NamedSharding(mesh, P("data")),
            out_shardings=NamedSharding(mesh, P()))
local = jnp.arange(1.0, 3.0) + 2.0 * rank  # proc0: [1,2], proc1: [3,4]
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), np.asarray(local))
out = f(arr)
print("PSUM", float(np.asarray(out)), flush=True)

# ---- product stage A: one sharded supervised train step across the
# 2-process cluster (the trainer's real gradient all-reduce path).
outdir = sys.argv[3]
from dynavsr_tpu.models.edvr import EDVR
from dynavsr_tpu.train.trainer import (
    TrainerConfig, TrainState, make_optimizer, make_train_step)
from jax.flatten_util import ravel_pytree
from jax.sharding import NamedSharding, PartitionSpec

repl = NamedSharding(mesh, PartitionSpec())
data = NamedSharding(mesh, PartitionSpec("data"))
def to_global(tree, sh):
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
        tree)

model = EDVR(nf=8, nframes=3, groups=2, front_RBs=1, back_RBs=1)
ks = jax.random.split(jax.random.PRNGKey(0), 4)
lqs = np.asarray(jax.random.uniform(ks[0], (4, 3, 16, 16, 3)))
gts = np.asarray(jax.random.uniform(ks[1], (4, 64, 64, 3)))
params = model.init(ks[2], jnp.asarray(lqs[:1]))
cfg = TrainerConfig(lr=1e-3, scheme="constant")
state = TrainState.create(apply_fn=model.apply, params=params,
                          tx=make_optimizer(cfg))
step = make_train_step(model, cfg, mesh=mesh, donate=False)
lo = slice(2 * rank, 2 * rank + 2)  # this process's rows of the global batch
batch = {"LQs": to_global(lqs[lo], data), "GT": to_global(gts[lo], data)}
nstate, metrics = step(to_global(state, repl), batch)
print("LPIX", repr(float(np.asarray(metrics["l_pix"]))), flush=True)
flat, _ = ravel_pytree(jax.device_get(nstate.params))
np.save(f"{outdir}/params_rank{rank}.npy", np.asarray(flat))

# ---- product stage B: clip-parallel adapt+infer across the cluster
# (the DynaVSR serving loop; each device adapts its own clip).
from dynavsr_tpu.adapt.adaptation import (
    AdaptConfig, make_adapt_and_infer_batched)
acfg = AdaptConfig(n_steps=2, lr=1e-4)
runb = make_adapt_and_infer_batched(model, acfg, mesh=mesh)
kk = jax.random.split(jax.random.PRNGKey(1), 3)
slr = np.asarray(jax.random.uniform(kk[0], (4, 2, 3, 4, 4, 3)))
lrc = np.asarray(jax.random.uniform(kk[1], (4, 2, 16, 16, 3)))
lrw = np.asarray(jax.random.uniform(kk[2], (4, 3, 3, 16, 16, 3)))
sr, losses = runb(to_global(params, repl), to_global(slr[lo], data),
                  to_global(lrc[lo], data), to_global(lrw[lo], data))
for shard in sr.addressable_shards:
    i0 = shard.index[0].start or 0
    np.save(f"{outdir}/sr_clip{i0}.npy", np.asarray(shard.data)[0])
print("DONE", rank, flush=True)
"""


def test_two_process_distributed_rehearsal(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env.get("PYTHONPATH", "")])
    procs = [
        subprocess.Popen([sys.executable, str(script), str(r), str(port),
                          str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed rehearsal timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    # disjoint index streams
    streams = {}
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("IDX"):
                _, r, csv = line.split(" ", 2)
                streams[int(r)] = set(map(int, csv.split(",")))
    assert streams[0].isdisjoint(streams[1])
    # exactly one rank-0 writer
    joined = "\n".join(o for _, o, _ in outs)
    assert joined.count("RANK0") == 1 and joined.count("RANKN") == 1
    # psum across processes: 1+2+3+4
    assert "PSUM 10.0" in joined
    assert joined.count("DONE") == 2
    _check_product_steps(tmp_path, joined)


def _check_product_steps(tmp_path, joined):
    """Verify the cross-process product steps against the single-process
    path, recomputed here (same PRNG keys -> identical inputs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.flatten_util import ravel_pytree

    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.train.trainer import (
        TrainerConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    # -- stage A: both ranks bit-identical (the multi-host invariant: every
    # device applies the same all-reduced update to the same params).
    p0 = np.load(tmp_path / "params_rank0.npy")
    p1 = np.load(tmp_path / "params_rank1.npy")
    np.testing.assert_array_equal(p0, p1)

    # single-process reference on the same global batch
    model = EDVR(nf=8, nframes=3, groups=2, front_RBs=1, back_RBs=1)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    lqs = jax.random.uniform(ks[0], (4, 3, 16, 16, 3))
    gts = jax.random.uniform(ks[1], (4, 64, 64, 3))
    params = model.init(ks[2], lqs[:1])
    cfg = TrainerConfig(lr=1e-3, scheme="constant")
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(cfg))
    nstate, metrics = make_train_step(model, cfg, donate=False)(
        state, {"LQs": lqs, "GT": gts})
    lpix = [float(ln.split(" ", 1)[1]) for ln in joined.splitlines()
            if ln.startswith("LPIX")]
    assert len(lpix) == 2
    np.testing.assert_allclose(lpix, float(metrics["l_pix"]), rtol=1e-5)
    ref, _ = ravel_pytree(jax.device_get(nstate.params))
    ref = np.asarray(ref)
    # Adam normalizes by sqrt(v): a reduction-order-level gradient
    # difference can flip a near-zero element's update sign, bounded by
    # 2*lr — allow that on a tiny fraction of elements, tight elsewhere.
    diff = np.abs(p0 - ref)
    assert diff.max() <= 2.1e-3, diff.max()  # 2.1 * lr
    assert (diff > 1e-5).mean() < 0.01, (diff > 1e-5).mean()

    # -- stage B: every clip's SR matches the single-process per-clip path
    # (tolerances as in test_adapt_batched_clip_parallel_8dev: vmap/
    # sharding changes fp32 reduction order, k adapt steps amplify it).
    kk = jax.random.split(jax.random.PRNGKey(1), 3)
    slr = jax.random.uniform(kk[0], (4, 2, 3, 4, 4, 3))
    lrc = jax.random.uniform(kk[1], (4, 2, 16, 16, 3))
    lrw = jax.random.uniform(kk[2], (4, 3, 3, 16, 16, 3))
    single = make_adapt_and_infer(model, AdaptConfig(n_steps=2, lr=1e-4))
    for i in range(4):
        got = np.load(tmp_path / f"sr_clip{i}.npy")
        sr_i, _ = single(params, slr[i], lrc[i], lrw[i])
        np.testing.assert_allclose(got, np.asarray(sr_i),
                                   rtol=2e-3, atol=2e-3)
