"""Supervised VSR trainer — reference models/Video_base_model.py [H], TPU-style.

The reference's optimize_parameters (zero_grad -> forward -> Charbonnier ->
backward -> step, grads all-reduced by DDP) becomes one jitted, fully
functional `train_step(state, batch) -> (state, metrics)` compiled over a
('data',) mesh: batch sharded, params replicated, gradient psum emitted by
XLA. LR scheduling runs inside the step via optax inject_hyperparams.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Mapping, Optional, Tuple

import flax.core
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynavsr_tpu.train.losses import make_pixel_criterion
from dynavsr_tpu.train.schedules import cosine_annealing_restart, multistep_restart, with_warmup

__all__ = ["TrainState", "make_optimizer", "make_train_step", "make_eval_step", "TrainerConfig"]


class TrainState(train_state.TrainState):
    """Step/params/opt-state triple (flax TrainState; step counts iters)."""


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 4e-4
    beta1: float = 0.9
    beta2: float = 0.99
    weight_decay: float = 0.0
    scheme: str = "CosineAnnealingLR_Restart"
    periods: Tuple[int, ...] = (150000, 150000, 150000, 150000)
    restart_weights: Tuple[float, ...] = (1.0, 0.5, 0.5, 0.5)
    eta_min: float = 1e-7
    milestones: Tuple[int, ...] = ()
    gamma: float = 0.5
    warmup_iter: int = -1
    pixel_weight: float = 1.0
    criterion: str = "cb"  # 'cb' | 'l1' | 'l2' (reference pixel_criterion)
    reduction: str = "mean"
    grad_clip: Optional[float] = None


def make_schedule(cfg: TrainerConfig) -> Callable:
    if cfg.scheme == "CosineAnnealingLR_Restart":
        sched = cosine_annealing_restart(cfg.lr, cfg.periods, cfg.restart_weights, cfg.eta_min)
    elif cfg.scheme == "MultiStepLR_Restart":
        sched = multistep_restart(cfg.lr, cfg.milestones, cfg.gamma)
    elif cfg.scheme == "constant":
        sched = lambda c: cfg.lr  # noqa: E731
    else:
        raise ValueError(f"unknown lr scheme {cfg.scheme!r}")
    return with_warmup(sched, cfg.warmup_iter)


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    chain = []
    if cfg.grad_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain)


def make_train_step(
    model,
    cfg: TrainerConfig,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    has_batch_stats: bool = False,
):
    """Returns jitted step(state, batch) -> (state, metrics).

    batch: {'LQs': (B, N, h, w, 3), 'GT': (B, H, W, 3)} — exactly the
    reference's feed_data contract [H], NHWC. If `mesh` is given the step is
    compiled with batch sharded over ('data',) and state replicated.

    has_batch_stats: set when the net carries BatchNorm running stats
    (TOF/SpyNet, DUF — reference Video_base_model trains any define_G output
    in train() mode [H]). The step then runs the module in train mode with
    mutable batch_stats and folds the updated stats back into state.params.
    BN stats receive exactly-zero gradients in train mode (the output
    depends only on batch statistics), so Adam leaves them untouched and
    the mutable update is the only writer.
    """

    cri_pix = make_pixel_criterion(cfg.criterion, cfg.reduction)
    m = model.clone(train=True) if has_batch_stats else model
    muts = ["intermediates"] + (["batch_stats"] if has_batch_stats else [])

    def loss_fn(params, batch):
        pred, upd = m.apply(params, batch["LQs"], mutable=muts)
        l_pix = cfg.pixel_weight * cri_pix(pred, batch["GT"])
        return l_pix, upd

    def step(state: TrainState, batch: Mapping[str, jax.Array]):
        (l_pix, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads=grads)
        if has_batch_stats:
            new_state = new_state.replace(
                params=flax.core.copy(new_state.params, {"batch_stats": upd["batch_stats"]})
            )
        gnorm = optax.global_norm(grads)
        metrics = {"l_pix": l_pix, "grad_norm": gnorm}
        inter = jax.tree_util.tree_leaves(upd.get("intermediates", {}))
        if inter:  # max |offset| mean across all DCNs (reference DCN_sep guard)
            metrics["dcn_offset_absmean"] = jnp.max(jnp.stack(inter))
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Optional[Mesh] = None):
    """jitted forward: (params, LQs) -> SR frames (reference .test() [H])."""

    def fwd(params, lqs):
        return model.apply(params, lqs)

    if mesh is None:
        return jax.jit(fwd)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(fwd, in_shardings=(repl, data), out_shardings=data)
