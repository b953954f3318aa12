"""Losses (reference models/loss.py [H]): Charbonnier = sqrt(d^2 + eps)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["charbonnier_loss"]


def charbonnier_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-12,
                     reduction: str = "sum") -> jax.Array:
    """Reference CharbonnierLoss: sum(sqrt((x-y)^2 + eps)), eps=1e-12 [H].

    reduction: 'sum' (reference default) or 'mean' (scale-stable; preferred
    for new configs — select via train.pixel_criterion_reduction).
    """
    d = (pred - target).astype(jnp.float32)
    val = jnp.sqrt(d * d + eps)
    if reduction == "sum":
        return jnp.sum(val)
    if reduction == "mean":
        return jnp.mean(val)
    raise ValueError(f"unknown reduction {reduction!r}")
