"""Device mesh + sharding helpers (SURVEY.md §2.6).

The reference's only parallelism is data-parallel NCCL all-reduce
(train.py:init_dist + DistributedDataParallel [H]). The TPU-native
equivalent: a 1-D ('data',) Mesh; batches sharded over it with
NamedSharding; params replicated; the gradient psum is emitted by XLA
inside jit — there is no hand-written collective anywhere.

Test-time adaptation is clip-parallel over the same axis (SURVEY.md §2.6):
each device adapts its own clip — a genuine TPU win over the reference's
serial per-GPU loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_mesh", "shard_batch", "replicate", "process_local_slice"]


def data_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch (leading dim = global batch) sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def process_local_slice(n: int, seed: int, epoch: int, ratio: int = 1) -> np.ndarray:
    """Per-process index shard, DistIterSampler-style (data/data_sampler.py
    [H]): deterministic shuffle of `ratio` epoch-inflations of range(n),
    strided by process so every host draws a disjoint stream."""
    rng = np.random.default_rng(seed + epoch)
    idx = np.concatenate([rng.permutation(n) for _ in range(max(1, ratio))])
    return idx[jax.process_index() :: jax.process_count()]
