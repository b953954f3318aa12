"""Two-process jax.distributed rehearsal (CPU) — VERDICT.md round-1 item 6.

The multi-host branch (cli/train.py --launcher jax ->
jax.distributed.initialize) was written in round 1 but never executed.
This test launches TWO real processes that form a distributed JAX cluster
over localhost, then checks the pieces the trainer relies on:
  * process_count/process_index are correct on both ranks,
  * the loader's per-process sharding (DistIterSampler analog) draws
    disjoint, deterministic index streams,
  * rank-0 gating picks exactly one writer,
  * a psum across the processes' devices produces the global sum (the
    gradient all-reduce path; gloo CPU collectives).
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
        subprocess.Popen([sys.executable, str(script), str(r), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
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
