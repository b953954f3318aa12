"""Losses (reference models/loss.py [H]): Charbonnier = sqrt(d^2 + eps),
plus the l1/l2 pixel criteria selectable via train.pixel_criterion
(reference Video_base_model ctor dispatch [H])."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["charbonnier_loss", "l1_loss", "l2_loss", "make_pixel_criterion"]


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


def _reduce(val: jax.Array, reduction: str) -> jax.Array:
    if reduction == "sum":
        return jnp.sum(val)
    if reduction == "mean":
        return jnp.mean(val)
    raise ValueError(f"unknown reduction {reduction!r}")


def l1_loss(pred, target, reduction: str = "mean") -> jax.Array:
    return _reduce(jnp.abs((pred - target).astype(jnp.float32)), reduction)


def l2_loss(pred, target, reduction: str = "mean") -> jax.Array:
    d = (pred - target).astype(jnp.float32)
    return _reduce(d * d, reduction)


def make_pixel_criterion(name: str = "cb", reduction: str = "mean"):
    """'cb' | 'l1' | 'l2' -> loss(pred, target) (reference pixel_criterion)."""
    if name in ("cb", "charbonnier"):
        return lambda p, t: charbonnier_loss(p, t, reduction=reduction)
    if name == "l1":
        return lambda p, t: l1_loss(p, t, reduction)
    if name == "l2":
        return lambda p, t: l2_loss(p, t, reduction)
    raise ValueError(f"unknown pixel criterion {name!r}")
