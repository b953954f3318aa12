"""Test-time adaptation — the DynaVSR product loop (SURVEY.md §3.4 [H]).

Per clip: fork the meta weights, run k gradient steps on the self-supervised
(SLR = MFDN(LR windows) -> LR center) pseudo-task, then slide the adapted
net over every window of the clip.

TPU design: the whole per-clip loop — k optimizer steps (lax.scan) plus the
full-clip batched inference — is ONE jitted function; clips are
embarrassingly parallel across chips (shard the clip batch over the
('data',) mesh, or vmap small clips). This replaces the reference's serial
per-GPU Python loop and is where the ">= 5x frames/sec/chip with
adaptation" target comes from (BASELINE.json).

BatchNorm nets (TOF/DUF) — two variants, selected by AdaptConfig.bn_mode
(default ``auto`` = ``train_ema`` for BN nets, measured better-or-tie —
RESULTS.md round 3: TOF +2.48 vs +1.30 dB, DUF tie):

* ``grad_stats``: `params` is the full variables dict and the
  adaptation gradient flows into BN scale/bias AND the running statistics
  (eval-mode BN uses them in the forward, so they receive real gradients).
  This is a deliberate TTA variant that deviates mechanically from the
  torch reference: there, adaptation runs the module in train() mode, so
  the forward uses *batch* statistics and the running stats move by EMA —
  different quantities, moved by a different mechanism. The variant is
  validated empirically (tools/blind_adaptation_check.py; RESULTS.md).
* ``train_ema``: reference semantics — the adaptation forward runs in
  train mode (batch statistics), gradients update the trainable params
  (BN stats receive exactly-zero grads in train mode), and the running
  stats move by the module's EMA, folded back into `params` each step so
  the post-adaptation eval-mode inference sees them. Reference:
  test_dynavsr-style adaptation calls the torch module in train() mode
  (SURVEY.md §3.4 [M]).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "AdaptConfig",
    "chunked_apply",
    "make_adapt_and_infer",
    "make_adapt_and_infer_batched",
    "make_adapt_and_infer_vmapped",
    "make_adapt_and_infer_seq",
    "make_adapt_and_infer_seq_batched",
    "make_adapt_fn",
    "make_adapt_step",
    "make_seq_infer",
    "seq_forward",
    "batch_clips",
    "batch_clips_seq",
    "resolve_bn_mode",
]


def chunked_apply(apply, params, windows, chunk: int):
    """Batched forward over (F, ...) windows, lax.map-chunked to `chunk`
    windows per call to bound live activation memory (TOF at Vid4 x4 is
    VMEM-bound in batch — RESULTS.md measured optimum chunk=2). chunk=0 or
    chunk >= F runs one full batch. F is padded up to a chunk multiple by
    zero windows (compute-only waste; the pad rows are sliced off)."""
    if not chunk or chunk >= windows.shape[0]:
        return apply(params, windows)
    f = windows.shape[0]
    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f
    padded = jnp.pad(windows, [(0, pad)] + [(0, 0)] * (windows.ndim - 1))
    chunks = padded.reshape((n_chunks, chunk) + windows.shape[1:])
    sr = jax.lax.map(lambda w: apply(params, w), chunks)
    return sr.reshape((n_chunks * chunk,) + sr.shape[2:])[:f]


@dataclasses.dataclass
class AdaptConfig:
    n_steps: int = 5
    lr: float = 1e-6
    optimizer: str = "adam"  # 'adam' | 'sgd' (reference uses small-lr Adam [M])
    reduction: str = "mean"
    infer_chunk: int = 0  # 0 = all windows in one batch
    # BN nets only — 'auto' resolves to 'train_ema' (reference train()-mode
    # semantics) for modules with a train flag (TOF/DUF) and 'grad_stats'
    # otherwise. Measured (RESULTS.md round 3): train_ema +1.18 dB on TOF,
    # tie on DUF — the reference semantics is the default for a reason.
    bn_mode: str = "auto"


def resolve_bn_mode(bn_mode: str, vsr_model) -> str:
    """'auto' -> 'train_ema' for modules exposing a `train` flag (the BN
    nets TOF/DUF), 'grad_stats' otherwise (EDVR has no BN; the train_ema
    machinery would be dead weight)."""
    if bn_mode != "auto":
        return bn_mode
    import dataclasses as dc

    try:
        has_train = any(f.name == "train" for f in dc.fields(type(vsr_model)))
    except TypeError:
        has_train = False
    return "train_ema" if has_train else "grad_stats"


def _make_tx(cfg: AdaptConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        return optax.adam(cfg.lr)
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.lr)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def make_adapt_step(vsr_model, cfg: AdaptConfig, apply_fn=None,
                    mutable_apply_fn=None):
    """One adaptation gradient step on a batch of (SLR window, LR center).

    apply_fn(params, x) overrides vsr_model.apply — e.g. a mod-padded apply
    (models/padding.py) so pyramid nets accept arbitrary SLR sizes.

    bn_mode='train_ema': mutable_apply_fn(params, x) -> (pred, updates)
    must run the module in train mode with mutable batch_stats (default:
    vsr_model.clone(train=True); models/padding.make_mutable_model_apply
    builds the padded version). The EMA'd stats are folded back into params
    after each optimizer step."""
    from dynavsr_tpu.train.losses import charbonnier_loss

    tx = _make_tx(cfg)
    apply = apply_fn or vsr_model.apply

    bn_mode = resolve_bn_mode(cfg.bn_mode, vsr_model)
    if bn_mode == "train_ema":
        import flax.core

        if mutable_apply_fn is None:
            m = vsr_model.clone(train=True)
            mutable_apply_fn = lambda p, x: m.apply(  # noqa: E731
                p, x, mutable=["batch_stats"])

        def loss_fn(params, slr_windows, lr_centers):
            pred, upd = mutable_apply_fn(params, slr_windows)
            loss = charbonnier_loss(pred, lr_centers, reduction=cfg.reduction)
            return loss, upd

        def step(params, opt_state, slr_windows, lr_centers):
            (loss, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, slr_windows, lr_centers)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            if "batch_stats" in upd:
                params = flax.core.copy(
                    params, {"batch_stats": upd["batch_stats"]})
            return params, opt_state, loss

        return tx, step
    if bn_mode != "grad_stats":
        raise ValueError(f"unknown bn_mode {bn_mode!r}")

    def loss_fn(params, slr_windows, lr_centers):
        pred = apply(params, slr_windows)
        return charbonnier_loss(pred, lr_centers, reduction=cfg.reduction)

    def step(params, opt_state, slr_windows, lr_centers):
        loss, g = jax.value_and_grad(loss_fn)(params, slr_windows, lr_centers)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step


def make_adapt_fn(vsr_model, cfg: AdaptConfig, jit: bool = True,
                  apply_fn=None, mutable_apply_fn=None):
    """Build adapt(params, slr_windows, lr_centers) -> (adapted, losses) —
    the k-step adaptation scan ALONE, no inference. This is the warm-up
    primitive for adapt-then-serve deployments (eval/streaming.py) and the
    shared core of every make_adapt_and_infer* variant."""
    tx, step = make_adapt_step(vsr_model, cfg, apply_fn, mutable_apply_fn)

    def adapt(params, slr_windows, lr_centers):
        opt_state = tx.init(params)

        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o, slr_windows, lr_centers)
            return (p, o), loss

        (adapted, _), losses = jax.lax.scan(
            body, (params, opt_state), None, length=cfg.n_steps)
        return adapted, losses

    return jax.jit(adapt) if jit else adapt


def make_adapt_and_infer(vsr_model, cfg: AdaptConfig, jit: bool = True,
                         apply_fn=None, mutable_apply_fn=None):
    """Build adapt_and_infer(params, slr_windows, lr_centers, lr_windows).

    slr_windows: (K, N, h/s, w/s, 3) adaptation inputs (from MFDN)
    lr_centers:  (K, h, w, 3) their targets
    lr_windows:  (F, N, h, w, 3) every sliding window of the clip
    Returns (sr_frames (F, H, W, 3), losses (n_steps,)).

    The k adaptation steps are a lax.scan over (params, opt_state); the
    inference is one batched apply (optionally lax.map-chunked to bound
    memory for long clips).
    """
    adapt = make_adapt_fn(vsr_model, cfg, jit=False, apply_fn=apply_fn,
                          mutable_apply_fn=mutable_apply_fn)
    apply = apply_fn or vsr_model.apply

    def run(params, slr_windows, lr_centers, lr_windows):
        adapted, losses = adapt(params, slr_windows, lr_centers)
        sr = chunked_apply(apply, adapted, lr_windows, cfg.infer_chunk)
        return sr, losses

    return jax.jit(run) if jit else run


def make_adapt_and_infer_seq(vsr_model, cfg: AdaptConfig, jit: bool = True,
                             apply_fn=None, mutable_apply_fn=None):
    """Sequence-mode adapt+infer: same adaptation scan as
    make_adapt_and_infer, but inference runs EDVR.forward_seq semantics —
    per-frame pyramids extracted ONCE for the clip's T frames and shared
    by every sliding window (exact; interior frames are recomputed ~N
    times by the window-batched path). EDVR-only: the model must expose
    extract_pyramid/fuse_pyramid (models/edvr.py).

    run(params, slr_windows, lr_centers, frames, win_idx):
      frames:  (T, h, w, 3) the raw clip
      win_idx: (F, N) int32 sliding-window indices (data/windows.all_windows)
    Returns (sr (F, H, W, 3), losses (n_steps,)).

    cfg.infer_chunk bounds the PCD+fuse stage (lax.map over win_idx rows);
    the T pyramid extractions always run as one batch (they are the cheap,
    dedup'd part — ~4.3 MB/frame of bf16 pyramid at Vid4 scale).
    """
    adapt = make_adapt_fn(vsr_model, cfg, jit=False, apply_fn=apply_fn,
                          mutable_apply_fn=mutable_apply_fn)

    def run(params, slr_windows, lr_centers, frames, win_idx):
        adapted, losses = adapt(params, slr_windows, lr_centers)
        sr = seq_forward(vsr_model, adapted, frames, win_idx, cfg.infer_chunk)
        return sr, losses

    return jax.jit(run) if jit else run


def seq_forward(vsr_model, params, frames, win_idx, infer_chunk: int = 0):
    """Sequence-mode forward over one clip (EDVR-family: the model must
    expose extract_pyramid/fuse_pyramid — models/edvr.py): per-frame
    pyramids extracted ONCE for the (T, H, W, 3) clip, gathered per
    (F, N) window row for PCD+fuse. Exact vs the window-batched forward
    (tests/test_seq_infer.py). infer_chunk bounds the fuse stage
    (chunked_apply); the T extractions always run as one batch."""
    l1, l2, l3 = vsr_model.apply(params, frames, method="extract_pyramid")
    n = win_idx.shape[1]
    center = getattr(vsr_model, "center", None)
    center = n // 2 if center is None else center

    def fuse(p, idx):
        return vsr_model.apply(
            p, l1[idx], l2[idx], l3[idx], frames[idx[:, center]],
            method="fuse_pyramid")

    return chunked_apply(fuse, params, win_idx, infer_chunk)


def make_seq_infer(vsr_model, infer_chunk: int = 0, jit: bool = True):
    """Inference-only sequence-mode forward: (params, frames (T, H, W, 3),
    win_idx (F, N)) -> SR (F, H*scale, W*scale, 3). The plain-eval analog
    of make_adapt_and_infer_seq (eval.seq in cli/test.py); shapes must be
    pre-padded by the caller (VideoBaseModel.make_seq_infer_fn handles
    mod-4 frame padding and clip-length bucketing)."""
    run = functools.partial(seq_forward, vsr_model, infer_chunk=infer_chunk)
    return jax.jit(run) if jit else run


def _clip_parallel(single, n_args, mesh):
    """Shared builder for the clip-parallel variants: run `single` (the
    whole per-clip adapt+infer) over a leading clips axis with DENSE conv
    weights, sharded over the ('data',) mesh.

    Design note (measured): the obvious composition — jax.vmap(single)
    over clips — batches the conv WEIGHTS (params are per-clip after the
    first adaptation step), which XLA lowers to grouped/looped convs.
    That lowering measured 1.93x slower than per-clip dense execution on
    one chip (23.43 -> 12.15 fps, EDVR Gd=2 C=2 —
    results_r04/clip_parallel_probe_g2.log), the same pathology measured
    at ~1.5x in multi-stream serving (results_r04/stream_groups_*.log).
    So clips are executed by lax.map (a sequential scan whose body runs
    ONE param set -> dense convs) and cross-chip parallelism comes from
    shard_map placing C/D clips per chip — identical parallel speedup to
    the vmapped design, none of the per-chip lowering tax. The vmapped
    composition is kept as make_adapt_and_infer_vmapped for the A/B
    record and as an equality oracle (tests/test_train.py).
    """

    def run_local(params, *clip_args):
        return jax.lax.map(lambda t: single(params, *t), clip_args)

    if mesh is None:
        return jax.jit(run_local)
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = jax.shard_map(
        run_local, mesh=mesh,
        in_specs=(P(),) + (P("data"),) * n_args,
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(repl,) + (data,) * n_args,
        out_shardings=(data, data),
    )


def make_adapt_and_infer_batched(vsr_model, cfg: AdaptConfig, mesh=None,
                                 apply_fn=None, mutable_apply_fn=None):
    """Clip-parallel adaptation (SURVEY.md §2.6): run the whole per-clip
    adapt+infer over a leading clips axis and shard clips over the
    ('data',) mesh — each chip adapts ITS OWN clips concurrently, replacing
    the reference's serial one-clip-per-GPU Python loop. Per-chip clips
    execute sequentially with dense convs (see _clip_parallel for the
    measured rationale vs the vmapped design).

    Inputs (clips padded to common sizes; pad frames cost compute only):
      params (replicated), slr_windows (C, K, N, h/s, w/s, 3),
      lr_centers (C, K, h, w, 3), lr_windows (C, F, N, h, w, 3)
    Returns sr (C, F, H, W, 3), losses (C, n_steps).
    """
    single = make_adapt_and_infer(vsr_model, cfg, jit=False, apply_fn=apply_fn,
                                  mutable_apply_fn=mutable_apply_fn)
    return _clip_parallel(single, 3, mesh)


def make_adapt_and_infer_vmapped(vsr_model, cfg: AdaptConfig, mesh=None,
                                 apply_fn=None, mutable_apply_fn=None):
    """The superseded vmapped composition of the clip-parallel path — kept
    as the A/B record of a measured negative (vmapping model.apply over
    per-clip params lowers every conv to grouped/looped form: 1.93x slower
    than _clip_parallel's dense execution on one chip,
    results_r04/clip_parallel_probe_g2.log) and as an equality oracle for
    the shipped design. Same contract as make_adapt_and_infer_batched."""
    single = make_adapt_and_infer(vsr_model, cfg, jit=False, apply_fn=apply_fn,
                                  mutable_apply_fn=mutable_apply_fn)
    fn = jax.vmap(single, in_axes=(None, 0, 0, 0))
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(repl, data, data, data),
        out_shardings=(data, data),
    )


def make_adapt_and_infer_seq_batched(vsr_model, cfg: AdaptConfig, mesh=None,
                                     apply_fn=None, mutable_apply_fn=None):
    """Clip-parallel sequence-mode adaptation: the seq composition of
    make_adapt_and_infer_batched — each chip adapts ITS OWN clips
    concurrently AND serves them with shared per-frame pyramids
    (EDVR.forward_seq; exact). This is the fastest multi-chip serving
    path: clip-parallelism removes the reference's serial per-clip loop,
    seq mode removes the ~N=5x per-frame feature recomputation. Per-chip
    clips execute sequentially with dense convs (_clip_parallel).

    Inputs (clips padded to common shapes via batch_clips_seq):
      params (replicated), slr_windows (C, K, N, h/s, w/s, 3),
      lr_centers (C, K, h, w, 3), frames (C, T, h, w, 3),
      win_idx (C, F, N) int32
    Returns sr (C, F, H, W, 3), losses (C, n_steps).
    """
    single = make_adapt_and_infer_seq(vsr_model, cfg, jit=False,
                                      apply_fn=apply_fn,
                                      mutable_apply_fn=mutable_apply_fn)
    return _clip_parallel(single, 4, mesh)


def batch_clips_seq(clips, n_frames: int, padding: str, n_adapt: int,
                    center: int):
    """Pad raw clips + their sliding-window index tables to common shapes
    for the batched SEQ adapt path. clips: list of (T_i, h, w, 3) arrays
    (same h, w — the same uniform-resolution constraint as batch_clips).

    Returns (frames (C, Tmax, h, w, 3), win_idx (C, Tmax, N) int32,
    adapt_windows (C, K, N, h, w, 3), lr_centers (C, K, h, w, 3),
    lengths). Tmax is bucketed to a multiple of 8 so nearby clip lengths
    share one compiled program; frame padding repeats the last frame and
    window padding repeats the last row (never scored — callers slice
    sr[i, :lengths[i]]). Adaptation windows are selected exactly like
    batch_clips (evenly spread when the clip is shorter than n_adapt
    windows would need)."""
    import numpy as np

    from dynavsr_tpu.data.windows import all_windows

    _check_uniform_hw([c.shape[1:3] for c in clips], "batch_clips_seq")
    tmax = -(-max(c.shape[0] for c in clips) // 8) * 8
    frames, wins, aw, lc, lens = [], [], [], [], []
    for c in clips:
        t = c.shape[0]
        win = all_windows(t, n_frames, padding)  # (t, N)
        if t < tmax:
            c_pad = np.concatenate(
                [c, np.repeat(c[-1:], tmax - t, axis=0)], axis=0)
            win_pad = np.concatenate(
                [win, np.repeat(win[-1:], tmax - t, axis=0)], axis=0)
        else:
            c_pad, win_pad = c, win
        frames.append(c_pad)
        wins.append(win_pad)
        k = min(n_adapt, t)
        idx = np.linspace(0, t - 1, k).round().astype(int) if k < n_adapt \
            else np.arange(n_adapt)
        if len(idx) < n_adapt:  # short clip: repeat windows
            idx = np.resize(idx, n_adapt)
        w_sel = c[win[idx]]  # (K, N, h, w, 3)
        aw.append(w_sel)
        lc.append(w_sel[:, center])
        lens.append(t)
    return (np.stack(frames), np.stack(wins).astype(np.int32),
            np.stack(aw), np.stack(lc), lens)


def _check_uniform_hw(shapes, fn_name: str) -> None:
    """Clip batching pads T/F only — mixed (h, w) inputs must be bucketed
    by resolution by the caller (cli/test_dynavsr.py does; real test sets
    mix resolutions, e.g. Vid4's 144x176 and 120x180 clips). Fail with
    the fix spelled out instead of np.stack's shape error."""
    if len(set(map(tuple, shapes))) > 1:
        raise ValueError(
            f"{fn_name} requires uniform (h, w) across clips, got "
            f"{sorted(set(map(tuple, shapes)))} — bucket clips by "
            "resolution and batch each bucket separately")


def batch_clips(clip_windows, n_adapt: int, center: int):
    """Pad per-clip window stacks to a common frame count for the batched
    adapt path. clip_windows: list of (F_i, N, h, w, 3) arrays (uniform
    h, w — bucket mixed-resolution clip sets by (h, w) first).

    Returns (lr_windows (C, Fmax, ...), slr_sources (C, K, ...) adaptation
    windows, lr_centers (C, K, h, w, 3), lengths) — padding repeats the
    last window; callers slice sr[i, :lengths[i]].
    """
    import numpy as np

    _check_uniform_hw([w.shape[2:4] for w in clip_windows], "batch_clips")
    fmax = max(w.shape[0] for w in clip_windows)
    lw, aw, lc, lens = [], [], [], []
    for w in clip_windows:
        f = w.shape[0]
        pad = np.concatenate([w, np.repeat(w[-1:], fmax - f, axis=0)], axis=0) \
            if f < fmax else w
        lw.append(pad)
        k = min(n_adapt, f)
        idx = np.linspace(0, f - 1, k).round().astype(int) if k < n_adapt else \
            np.arange(n_adapt)
        if len(idx) < n_adapt:  # short clip: repeat windows
            idx = np.resize(idx, n_adapt)
        aw.append(w[idx])
        lc.append(w[idx][:, center])
        lens.append(f)
    return (np.stack(lw), np.stack(aw), np.stack(lc), lens)
