"""Trainer / schedule / meta / adaptation tests (CPU, 8 fake devices)."""

import pytest

# Compile-heavy on CPU: behind the slow marker (pytest.ini; VERDICT r2 #8).
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dynavsr_tpu.models.edvr import EDVR
from dynavsr_tpu.parallel.mesh import data_mesh, replicate, shard_batch
from dynavsr_tpu.train.losses import charbonnier_loss
from dynavsr_tpu.train.meta import MetaConfig, adapted_params, make_meta_train_step
from dynavsr_tpu.train.schedules import cosine_annealing_restart, multistep_restart, with_warmup
from dynavsr_tpu.train.trainer import TrainerConfig, TrainState, make_optimizer, make_train_step


def tiny_model():
    return EDVR(nf=8, nframes=3, groups=2, front_RBs=1, back_RBs=1)


def tiny_state(model, x, cfg=None):
    params = model.init(jax.random.PRNGKey(0), x)
    tx = make_optimizer(cfg or TrainerConfig(lr=1e-4, scheme="constant"))
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


# ------------------------------------------------------------------ schedules
def test_cosine_restart_schedule():
    s = cosine_annealing_restart(1e-3, [100, 100], [1.0, 0.5], eta_min=1e-7)
    assert float(s(0)) == pytest.approx(1e-3, rel=1e-4)
    assert float(s(50)) == pytest.approx((1e-3 + 1e-7) / 2, rel=1e-2)
    assert float(s(99)) < 1e-5
    assert float(s(100)) == pytest.approx(0.5e-3, rel=1e-4)  # restart, weight .5
    assert float(s(150)) == pytest.approx((0.5e-3 + 1e-7) / 2, rel=1e-2)


def test_multistep_restart_schedule():
    s = multistep_restart(1e-3, milestones=[10, 20], gamma=0.5)
    assert float(s(5)) == pytest.approx(1e-3)
    assert float(s(15)) == pytest.approx(5e-4)
    assert float(s(25)) == pytest.approx(2.5e-4)
    s2 = multistep_restart(1e-3, milestones=[10, 30], gamma=0.5,
                           restarts=[20], restart_weights=[0.8])
    assert float(s2(25)) == pytest.approx(8e-4)  # decay cleared at restart
    assert float(s2(35)) == pytest.approx(4e-4)


def test_warmup():
    s = with_warmup(lambda c: 1e-3, 10)
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(9)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(1e-3)


def test_charbonnier():
    a = jnp.zeros((2, 4))
    b = jnp.ones((2, 4)) * 3.0
    assert float(charbonnier_loss(a, b, reduction="mean")) == pytest.approx(3.0, rel=1e-5)
    assert float(charbonnier_loss(a, b, reduction="sum")) == pytest.approx(24.0, rel=1e-5)


# ------------------------------------------------------------------- training
def test_train_step_reduces_loss():
    model = tiny_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    state = tiny_state(model, x, TrainerConfig(lr=1e-3, scheme="constant"))
    step = make_train_step(model, TrainerConfig(lr=1e-3, scheme="constant"), donate=False)
    batch = {"LQs": x, "GT": gt}
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["l_pix"]))
    assert losses[-1] < losses[0]
    assert state.step == 5


def test_train_step_sharded_8dev():
    assert jax.device_count() >= 8
    mesh = data_mesh(jax.devices()[:8])
    model = tiny_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 8, 8, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (8, 32, 32, 3))
    state = tiny_state(model, x[:1])
    state = replicate(mesh, state)
    batch = shard_batch(mesh, {"LQs": x, "GT": gt})
    step = make_train_step(model, TrainerConfig(lr=1e-4, scheme="constant"), mesh=mesh, donate=False)
    new_state, metrics = step(state, batch)
    assert bool(jnp.isfinite(metrics["l_pix"]))
    # sharded result must equal single-device result (psum == full-batch grad)
    step1 = make_train_step(model, TrainerConfig(lr=1e-4, scheme="constant"), donate=False)
    state1 = tiny_state(model, x[:1])
    ns1, m1 = step1(state1, {"LQs": x, "GT": gt})
    np.testing.assert_allclose(float(metrics["l_pix"]), float(m1["l_pix"]), rtol=1e-4)


# ----------------------------------------------------------------------- meta
def test_adapted_params_changes_weights():
    model = tiny_model()
    slr = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 4, 4, 3))
    lr_c = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), slr)
    cfg = MetaConfig(inner_lr=1e-3, inner_steps=2)
    fast, inner_l = adapted_params(model, params, slr, lr_c, cfg)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), params, fast)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    assert bool(jnp.isfinite(inner_l))


@pytest.mark.parametrize("first_order", [False, True])
def test_meta_step_runs_and_improves(first_order):
    model = tiny_model()
    slr = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 4, 4, 3))
    lr_w = jax.random.uniform(jax.random.PRNGKey(6), (1, 3, 16, 16, 3))
    batch = {
        "SLR": slr,
        "LR": lr_w,
        "LR_center": jax.random.uniform(jax.random.PRNGKey(7), (1, 16, 16, 3)),
        "HR_center": jax.random.uniform(jax.random.PRNGKey(8), (1, 64, 64, 3)),
    }
    params = model.init(jax.random.PRNGKey(0), slr)
    tx = optax.adam(1e-3)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    cfg = MetaConfig(inner_lr=1e-4, inner_steps=1, first_order=first_order)
    step = make_meta_train_step(model, cfg, donate=False)
    l0 = None
    for _ in range(4):
        state, m = step(state, batch)
        if l0 is None:
            l0 = float(m["l_outer"])
    assert float(m["l_outer"]) < l0
    assert float(m["grad_norm"]) > 0


# ----------------------------------------------------------------- adaptation
def test_adapt_and_infer():
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer

    model = tiny_model()
    slr_w = jax.random.uniform(jax.random.PRNGKey(9), (2, 3, 4, 4, 3))
    lr_c = jax.random.uniform(jax.random.PRNGKey(10), (2, 16, 16, 3))
    lr_windows = jax.random.uniform(jax.random.PRNGKey(11), (5, 3, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), slr_w)
    fn = make_adapt_and_infer(model, AdaptConfig(n_steps=2, lr=1e-5))
    sr, losses = fn(params, slr_w, lr_c, lr_windows)
    assert sr.shape == (5, 64, 64, 3)
    assert losses.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(sr)))


def test_adapt_and_infer_chunked_matches():
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer

    model = tiny_model()
    slr_w = jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 4, 4, 3))
    lr_c = jax.random.uniform(jax.random.PRNGKey(10), (1, 16, 16, 3))
    lr_windows = jax.random.uniform(jax.random.PRNGKey(11), (5, 3, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), slr_w)
    full = make_adapt_and_infer(model, AdaptConfig(n_steps=1, lr=1e-5))
    chunked = make_adapt_and_infer(model, AdaptConfig(n_steps=1, lr=1e-5, infer_chunk=2))
    sr_f, _ = full(params, slr_w, lr_c, lr_windows)
    sr_c, _ = chunked(params, slr_w, lr_c, lr_windows)
    np.testing.assert_allclose(np.asarray(sr_f), np.asarray(sr_c), atol=1e-5)


# --------------------------------------------------- clip-parallel adaptation
def test_adapt_batched_clip_parallel_8dev():
    """Sharded vmap adapt+infer over 8 clips on the 8-device mesh matches
    the per-clip path (SURVEY.md §2.6 adaptation-parallelism row)."""
    from dynavsr_tpu.adapt.adaptation import (
        AdaptConfig, batch_clips, make_adapt_and_infer,
        make_adapt_and_infer_batched,
    )

    assert jax.device_count() >= 8
    mesh = data_mesh(jax.devices()[:8])
    model = tiny_model()
    n, h, w, s = 3, 16, 16, 4
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, n, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    rng = np.random.default_rng(0)
    clips = [rng.random((f, n, h, w, 3)).astype(np.float32) for f in
             [4, 3, 5, 2, 4, 5, 3, 4]]
    lr_windows, adapt_w, lr_centers, lens = batch_clips(clips, n_adapt=2, center=n // 2)
    slr = lr_windows[:, :2, :, ::s, ::s, :]  # stand-in for MFDN output

    cfg = AdaptConfig(n_steps=2, lr=1e-4)
    batched = make_adapt_and_infer_batched(model, cfg, mesh=mesh)
    sr, losses = batched(params, jnp.asarray(slr), jnp.asarray(lr_centers),
                         jnp.asarray(lr_windows))
    assert sr.shape == (8, 5, h * 4, w * 4, 3)
    assert losses.shape == (8, 2)

    # parity with the unbatched path on clip 0
    single = make_adapt_and_infer(model, cfg)
    sr0, l0 = single(params, jnp.asarray(slr[0]), jnp.asarray(lr_centers[0]),
                     jnp.asarray(lr_windows[0]))
    # vmap/sharding changes fp32 reduction order; k adaptation steps
    # amplify it — tolerance reflects that, not a logic difference.
    np.testing.assert_allclose(np.asarray(sr[0]), np.asarray(sr0),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(losses[0]), np.asarray(l0),
                               rtol=1e-3, atol=1e-4)
    # padded frames beyond each clip's length are ignored by slicing
    for i, f in enumerate(lens):
        assert np.isfinite(np.asarray(sr[i, :f])).all()


def test_adapt_batched_matches_vmapped_oracle():
    """The shipped clip-parallel design (lax.map dense execution,
    _clip_parallel) equals the superseded vmapped composition on every
    clip — the refactor is an execution-strategy change only (the vmapped
    design measured 1.93x slower on hardware:
    results_r04/clip_parallel_probe_g2.log)."""
    from dynavsr_tpu.adapt.adaptation import (
        AdaptConfig, batch_clips, make_adapt_and_infer_batched,
        make_adapt_and_infer_vmapped,
    )

    model = tiny_model()
    n, h, w, s = 3, 16, 16, 4
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, n, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    rng = np.random.default_rng(3)
    clips = [rng.random((f, n, h, w, 3)).astype(np.float32) for f in [4, 3]]
    lr_windows, adapt_w, lr_centers, lens = batch_clips(
        clips, n_adapt=2, center=n // 2)
    slr = lr_windows[:, :2, :, ::s, ::s, :]
    cfg = AdaptConfig(n_steps=2, lr=1e-4)

    args = (params, jnp.asarray(slr), jnp.asarray(lr_centers),
            jnp.asarray(lr_windows))
    sr_m, l_m = make_adapt_and_infer_batched(model, cfg)(*args)
    sr_v, l_v = make_adapt_and_infer_vmapped(model, cfg)(*args)
    np.testing.assert_allclose(np.asarray(sr_m), np.asarray(sr_v),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_v),
                               rtol=1e-3, atol=1e-4)

    # mesh variant on a non-divisible local count: 2 clips / 1 device
    mesh = data_mesh(jax.devices()[:1])
    sr_1, l_1 = make_adapt_and_infer_batched(model, cfg, mesh=mesh)(*args)
    np.testing.assert_allclose(np.asarray(sr_1), np.asarray(sr_m),
                               rtol=2e-3, atol=2e-3)


def test_adapt_with_mod_padding_odd_slr():
    """Adaptation on SLR inputs that don't divide the EDVR pyramid (the
    DynaVSR Vid4 case: SLR = LR/4 = 9x11) via the padded apply."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.models.padding import mod_pad_apply

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 12, 12, 3)))
    padded = lambda p, x: mod_pad_apply(  # noqa: E731
        lambda xx: model.apply(p, xx), x, mod=4, scale=4)
    cfg = AdaptConfig(n_steps=2, lr=1e-4)
    run = make_adapt_and_infer(model, cfg, apply_fn=padded)
    slr = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 9, 11, 3))
    lrc = jax.random.uniform(jax.random.PRNGKey(2), (2, 36, 44, 3))
    lrw = jax.random.uniform(jax.random.PRNGKey(3), (4, 3, 36, 44, 3))
    sr, losses = run(params, slr, lrc, lrw)
    assert sr.shape == (4, 144, 176, 3)
    assert losses.shape == (2,)
    assert bool(jnp.isfinite(sr).all()) and bool(jnp.isfinite(losses).all())


# -------------------------------------------------- BN nets train (round 2)
def test_cosine_restart_accepts_reference_weight_convention():
    # Reference CosineAnnealingLR_Restart pairs weights with restarts:
    # len(weights) == len(periods) - 1 (first period implicitly weight 1).
    s = cosine_annealing_restart(1e-3, [100, 100, 100], [0.5, 0.25], eta_min=0.0)
    assert float(s(0)) == pytest.approx(1e-3, rel=1e-4)
    assert float(s(100)) == pytest.approx(0.5e-3, rel=1e-4)
    assert float(s(200)) == pytest.approx(0.25e-3, rel=1e-4)
    with pytest.raises(ValueError):
        cosine_annealing_restart(1e-3, [100, 100, 100], [1.0])


def test_tof_train_step_updates_bn():
    """TOF/SpyNet BatchNorm nets must be trainable: the step runs in train
    mode with mutable batch_stats folded back into the state (reference
    Video_base_model trains any define_G output [H])."""
    from dynavsr_tpu.models.tof import TOFlow

    model = TOFlow()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 16, 16, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    cfg = TrainerConfig(lr=1e-3, scheme="constant")
    state = TrainState.create(apply_fn=model.apply, params=variables,
                              tx=make_optimizer(cfg))
    step = make_train_step(model, cfg, donate=False, has_batch_stats=True)
    losses = []
    for _ in range(3):
        state, m = step(state, {"LQs": x, "GT": gt})
        losses.append(float(m["l_pix"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # running stats moved off their init values (mean 0 / var 1)
    bn0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    bn1 = jax.tree_util.tree_leaves(state.params["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(bn0, bn1))


def test_duf_train_step_updates_bn():
    from dynavsr_tpu.models.duf import DUF

    model = DUF(scale=4, dense1_layers=1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 7, 8, 8, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    cfg = TrainerConfig(lr=1e-3, scheme="constant")
    state = TrainState.create(apply_fn=model.apply, params=variables,
                              tx=make_optimizer(cfg))
    step = make_train_step(model, cfg, donate=False, has_batch_stats=True)
    state, m = step(state, {"LQs": x, "GT": gt})
    assert np.isfinite(float(m["l_pix"]))
    bn0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    bn1 = jax.tree_util.tree_leaves(state.params["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(bn0, bn1))


def test_adapt_train_ema_bn_mode():
    """bn_mode='train_ema' (reference train()-mode adaptation semantics):
    the adapt scan runs BN in train mode — running stats move by EMA (not
    by gradient) and trainable params move by gradient; the post-adapt
    inference uses the EMA'd stats."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.models.tof import TOFlow

    model = TOFlow()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    slr = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 16, 16, 3))
    lrc = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3))
    lrw = jax.random.uniform(jax.random.PRNGKey(4), (3, 3, 16, 16, 3))

    cfg = AdaptConfig(n_steps=2, lr=1e-4, bn_mode="train_ema")
    run = make_adapt_and_infer(model, cfg)
    sr, losses = run(variables, slr, lrc, lrw)
    assert sr.shape == (3, 16, 16, 3)
    assert bool(jnp.isfinite(sr).all()) and bool(jnp.isfinite(losses).all())

    # The EMA path must actually move the running stats: adapt with n_steps=1
    # and compare stats trajectories between the two modes.
    from dynavsr_tpu.adapt.adaptation import make_adapt_step

    tx, step = make_adapt_step(model, cfg)
    opt = tx.init(variables)
    p1, _, _ = step(variables, opt, slr, lrc)
    bn0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    bn1 = jax.tree_util.tree_leaves(p1["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(bn0, bn1))
    # trainable params moved too (gradient step)
    w0 = jax.tree_util.tree_leaves(variables["params"])
    w1 = jax.tree_util.tree_leaves(p1["params"])
    assert any(not np.allclose(a, b) for a, b in zip(w0, w1))


def test_resolve_bn_mode_auto():
    """'auto' routes BN nets (train flag) to train_ema, EDVR to grad_stats."""
    from dynavsr_tpu.adapt.adaptation import resolve_bn_mode
    from dynavsr_tpu.models.tof import TOFlow

    assert resolve_bn_mode("auto", TOFlow()) == "train_ema"
    assert resolve_bn_mode("auto", tiny_model()) == "grad_stats"
    assert resolve_bn_mode("grad_stats", TOFlow()) == "grad_stats"
    assert resolve_bn_mode("train_ema", tiny_model()) == "train_ema"


def test_eval_step_mesh_matches_single():
    """Mesh-sharded validation forward == unmeshed forward, including a
    ragged batch padded to the mesh size (round-2 VERDICT weak-spot 4)."""
    from dynavsr_tpu.train.trainer import make_eval_step

    assert jax.device_count() >= 8
    mesh = data_mesh(jax.devices()[:8])
    model = tiny_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, 8, 8, 3))  # ragged
    params = model.init(jax.random.PRNGKey(0), x[:1])

    single = make_eval_step(model, mesh=None)
    ref = np.asarray(single(params, x))

    meshed = make_eval_step(model, mesh=mesh)
    pad = (-x.shape[0]) % 8
    xp = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
    out = np.asarray(meshed(params, xp))[: x.shape[0]]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_edvr_train_step_reports_dcn_offset_metric():
    """The reference DCN_sep warns on offset.abs().mean() > 100; our analog
    surfaces the max offset magnitude as a train metric."""
    model = tiny_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    state = tiny_state(model, x)
    step = make_train_step(model, TrainerConfig(lr=1e-4, scheme="constant"), donate=False)
    _, m = step(state, {"LQs": x, "GT": gt})
    assert "dcn_offset_absmean" in m
    assert np.isfinite(float(m["dcn_offset_absmean"]))
    # conv_offset_mask is zero-init -> offsets exactly zero at step 1
    assert float(m["dcn_offset_absmean"]) == pytest.approx(0.0, abs=1e-6)


def test_adapt_batched_tof_packed_8dev():
    """TOF (packed s2d conv path + train_ema BN) clip-parallel over the
    8-device mesh: the new conv schedule must survive vmap+shard_map AND
    keep the per-clip result equal to the serial path."""
    from dynavsr_tpu.adapt.adaptation import (
        AdaptConfig, make_adapt_and_infer, make_adapt_and_infer_batched,
    )
    from dynavsr_tpu.models.padding import (
        make_model_apply, make_mutable_model_apply,
    )
    from dynavsr_tpu.models.tof import TOFlow

    assert jax.device_count() >= 8
    mesh = data_mesh(jax.devices()[:8])
    model = TOFlow(pre_upscale=True, scale=4)
    n, h, w = 3, 8, 16  # raw-LR window size (pyramid-safe after x4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, n, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    pa = make_model_apply(model, "TOF", 4)
    ma = make_mutable_model_apply(model, "TOF", 4)

    c = 8
    lr_w = jax.random.uniform(jax.random.PRNGKey(2), (c, 2, n, h, w, 3))
    slr = jax.random.uniform(jax.random.PRNGKey(3), (c, 2, n, 2, 4, 3))
    lr_c = jax.random.uniform(jax.random.PRNGKey(4), (c, 2, h, w, 3))

    cfg = AdaptConfig(n_steps=2, lr=1e-4)
    batched = make_adapt_and_infer_batched(
        model, cfg, mesh=mesh, apply_fn=pa, mutable_apply_fn=ma)
    sr, losses = batched(params, slr, lr_c, lr_w)
    assert sr.shape == (c, 2, h * 4, w * 4, 3)
    assert bool(jnp.isfinite(sr).all()) and bool(jnp.isfinite(losses).all())

    single = make_adapt_and_infer(model, cfg, apply_fn=pa, mutable_apply_fn=ma)
    sr0, l0 = single(params, slr[0], lr_c[0], lr_w[0])
    np.testing.assert_allclose(np.asarray(sr[0]), np.asarray(sr0),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(losses[0]), np.asarray(l0),
                               rtol=1e-3, atol=1e-4)
