"""Checkpoint / resume — reference models/base_model.py contract (§5 [H]).

Reference behavior kept 1:1 at the API level:
  save_network   -> <iter>_G          (params pytree; the torch version
                                       stripped the 'module.' DDP prefix —
                                       no analog needed, params are pure)
  save_training_state -> <iter>.state (epoch, iter, optimizer state; the
                                       schedule is a pure function of the
                                       step, so unlike torch nothing else
                                       needs serializing)
  resume_training / load_network with strict-shape checking.

Storage is orbax (StandardCheckpointer) — atomic, async-safe, sharding
aware; a .pth importer for public PyTorch checkpoints lives in
convert/torch_import.py.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "save_network",
    "load_network",
    "save_training_state",
    "resume_training",
    "latest_checkpoint_iter",
]


def _ckptr() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_network(models_dir: str, it: int, params: Any, label: str = "G") -> str:
    """Write params pytree -> <models_dir>/<iter>_<label> (orbax dir)."""
    path = osp.join(osp.abspath(models_dir), f"{it}_{label}")
    c = _ckptr()
    c.save(path, params, force=True)
    c.wait_until_finished()
    return path


def load_network(
    path: str, like: Optional[Any] = None, strict: bool = True
) -> Any:
    """Restore a params pytree. `like` provides the target structure
    (reference load_network(strict) [H]); strict=False keeps only matching
    shapes and leaves the rest at `like`'s values."""
    c = _ckptr()
    if like is None:
        return c.restore(osp.abspath(path))
    target = jax.tree_util.tree_map(np.asarray, like)
    restored = c.restore(osp.abspath(path), target=target)
    if not strict:
        def pick(new, old):
            return new if np.shape(new) == np.shape(old) else old

        return jax.tree_util.tree_map(pick, restored, like)
    return restored


def save_training_state(
    state_dir: str, epoch: int, it: int, opt_state: Any
) -> str:
    """Write {epoch, iter, opt_state} -> <state_dir>/<iter>.state."""
    path = osp.join(osp.abspath(state_dir), f"{it}.state")
    c = _ckptr()
    c.save(
        path,
        {
            "epoch": np.asarray(epoch, np.int64),
            "iter": np.asarray(it, np.int64),
            "opt_state": opt_state,
        },
        force=True,
    )
    c.wait_until_finished()
    return path


def resume_training(path: str, opt_state_like: Any) -> Tuple[int, int, Any]:
    """Restore (epoch, iter, opt_state) from a .state dir."""
    c = _ckptr()
    target = {
        "epoch": np.asarray(0, np.int64),
        "iter": np.asarray(0, np.int64),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state_like),
    }
    out = c.restore(osp.abspath(path), target=target)
    return int(out["epoch"]), int(out["iter"]), out["opt_state"]


def latest_checkpoint_iter(models_dir: str, label: str = "G") -> Optional[int]:
    """Largest <iter> with a saved <iter>_<label> network."""
    if not osp.isdir(models_dir):
        return None
    its = []
    for name in os.listdir(models_dir):
        if name.endswith(f"_{label}"):
            try:
                its.append(int(name[: -len(f"_{label}")]))
            except ValueError:
                continue
    return max(its) if its else None
