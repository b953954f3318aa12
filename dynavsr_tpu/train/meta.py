"""MAML-style meta-training (DynaVSR Algorithm 1) — SURVEY.md §3.3 [H].

Per step:
  inner:  theta' = theta - alpha * grad_theta L(f_theta(SLR window), LR center)
          (k steps, SGD fast weights; gradients flow THROUGH the update)
  outer:  L(f_theta'(LR window), HR center) -> Adam step on theta.

TPU design: the inner loop is a lax.scan over fast weights with
jax.checkpoint (remat) on the inner forward — the reference's two full
autograd graphs become one rematerialized scan, so EDVR-M second-order
meta-steps fit in HBM. `first_order=True` stop-gradients the inner grad
(FOMAML) as the cheap fallback the paper's small k permits.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynavsr_tpu.train.losses import charbonnier_loss
from dynavsr_tpu.train.trainer import TrainState

__all__ = ["MetaConfig", "make_meta_train_step", "adapted_params"]


@dataclasses.dataclass
class MetaConfig:
    inner_lr: float = 1e-5
    inner_steps: int = 1
    first_order: bool = False
    pixel_weight: float = 1.0
    reduction: str = "mean"
    use_remat: bool = True


def adapted_params(model, params, slr: jax.Array, lr_center: jax.Array,
                   cfg: MetaConfig, apply_fn=None):
    """Run k inner SGD steps on the (SLR window -> LR center) pseudo-task.

    slr: (B, N, h/s, w/s, 3); lr_center: (B, h, w, 3). Returns fast weights
    (same pytree as params) plus the last inner loss. apply_fn overrides
    model.apply — e.g. a mod-padded apply (models/padding.py) so pyramid
    nets accept arbitrary SLR sizes (SLR = LR/s is generally not
    pyramid-divisible).
    """
    raw_apply = apply_fn or model.apply
    apply = raw_apply
    if cfg.use_remat:
        apply = jax.checkpoint(lambda p, x: raw_apply(p, x))

    def inner_loss(p):
        pred = apply(p, slr)
        return charbonnier_loss(pred, lr_center, reduction=cfg.reduction)

    def inner_step(p, _):
        loss, g = jax.value_and_grad(inner_loss)(p)
        if cfg.first_order:
            g = jax.lax.stop_gradient(g)
        p = jax.tree_util.tree_map(lambda w, gw: w - cfg.inner_lr * gw, p, g)
        return p, loss

    fast, losses = jax.lax.scan(inner_step, params, None, length=cfg.inner_steps)
    return fast, losses[-1]


def make_meta_train_step(model, cfg: MetaConfig, mesh: Optional[Mesh] = None,
                         donate: bool = True, apply_fn=None):
    """jitted meta step(state, batch) -> (state, metrics).

    batch: {'SLR': (B,N,h/s,w/s,3), 'LR': (B,N,h,w,3),
            'LR_center': (B,h,w,3), 'HR_center': (B,H,W,3)}.
    The (SLR, LR) pair comes from the degradation pipeline (MFDN output or
    synthetic kernel — the meta step is agnostic, like the reference).
    apply_fn overrides model.apply for BOTH the inner and outer forwards
    (e.g. mod-padded apply for pyramid nets).
    """
    outer_apply = apply_fn or model.apply

    def meta_loss(params, batch):
        fast, inner_l = adapted_params(
            model, params, batch["SLR"], batch["LR_center"], cfg, apply_fn=apply_fn)
        pred = outer_apply(fast, batch["LR"])
        outer = cfg.pixel_weight * charbonnier_loss(
            pred, batch["HR_center"], reduction=cfg.reduction)
        return outer, inner_l

    def step(state: TrainState, batch: Mapping[str, jax.Array]):
        (outer, inner_l), grads = jax.value_and_grad(meta_loss, has_aux=True)(
            state.params, batch)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {
            "l_outer": outer,
            "l_inner": inner_l,
            "grad_norm": optax.global_norm(grads),
        }

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data), out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())
