"""LR schedules (reference models/lr_scheduler.py [H]) as optax schedules.

CosineAnnealingLR_Restart: concatenated cosine periods with per-restart
weight on the base LR and floor eta_min. EDVR default: 4 x 150k periods,
weights [1, .5, .5, .5], eta_min 1e-7.
MultiStepLR_Restart: gamma decay at milestones, optional restarts that
reset the decay and rescale by restart weight.

Both are pure jnp functions of the step count, so they live inside the
jitted update (no host round-trip per step).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = ["cosine_annealing_restart", "multistep_restart", "with_warmup"]


def cosine_annealing_restart(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = None,
    eta_min: float = 1e-7,
):
    """optax-style schedule fn(count) -> lr."""
    periods = list(periods)
    weights = list(restart_weights or [1.0] * len(periods))
    if len(weights) == len(periods) - 1:
        # Reference CosineAnnealingLR_Restart pairs weights with *restarts*
        # (the first period implicitly runs at weight 1), so ported YAMLs
        # carry len(periods)-1 weights. Accept both conventions.
        weights = [1.0] + weights
    if len(weights) != len(periods):
        raise ValueError("restart_weights must match periods")
    starts = np.cumsum([0] + periods[:-1])
    bounds = jnp.asarray(np.cumsum(periods), dtype=jnp.float32)
    starts_j = jnp.asarray(starts, dtype=jnp.float32)
    periods_j = jnp.asarray(periods, dtype=jnp.float32)
    weights_j = jnp.asarray(weights, dtype=jnp.float32)

    def schedule(count):
        c = jnp.minimum(jnp.asarray(count, jnp.float32), bounds[-1] - 1.0)
        idx = jnp.searchsorted(bounds, c, side="right")
        idx = jnp.clip(idx, 0, len(periods) - 1)
        t = (c - starts_j[idx]) / periods_j[idx]
        max_lr = base_lr * weights_j[idx]
        return eta_min + 0.5 * (max_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))

    return schedule


def multistep_restart(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.5,
    restarts: Sequence[int] = (),
    restart_weights: Sequence[float] = (),
):
    """MultiStepLR with restarts: lr = base * w_restart * gamma^(#milestones
    passed since the last restart)."""
    milestones = sorted(milestones)
    restarts = sorted(restarts)
    weights = list(restart_weights) or [1.0] * len(restarts)
    if restarts and len(weights) != len(restarts):
        raise ValueError("restart_weights must match restarts")

    ms = jnp.asarray(milestones, dtype=jnp.float32) if milestones else None
    rs = jnp.asarray(restarts, dtype=jnp.float32) if restarts else None
    rw = jnp.asarray([1.0] + weights, dtype=jnp.float32)
    # milestones passed *before* each restart boundary (for the reset)
    pre = jnp.asarray(
        [0.0] + [float(sum(1 for m in milestones if m <= r)) for r in restarts],
        dtype=jnp.float32,
    )

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        n_ms = jnp.sum(ms <= c) if ms is not None else jnp.asarray(0.0)
        r_idx = (jnp.sum(rs <= c) if rs is not None else jnp.asarray(0)).astype(jnp.int32)
        decays = jnp.maximum(n_ms - pre[r_idx], 0.0)
        return base_lr * rw[r_idx] * gamma**decays

    return schedule


def with_warmup(schedule, warmup_iter: int):
    """Linear warmup wrapper (reference base_model.update_learning_rate's
    per-group warmup [H])."""
    if warmup_iter <= 0:
        return schedule

    def warmed(count):
        c = jnp.asarray(count, jnp.float32)
        target = schedule(count)
        frac = jnp.clip((c + 1.0) / float(warmup_iter), 0.0, 1.0)
        return jnp.where(c < warmup_iter, target * frac, target)

    return warmed
