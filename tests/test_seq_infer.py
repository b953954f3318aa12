"""Sequence-mode EDVR inference (models/edvr.py forward_seq) — exactness.

Beyond-reference serving path: per-frame pyramids are computed once per
clip frame and shared across every sliding window containing the frame
(the reference's test loop — and our window-batched __call__ — recompute
them once per window, ~N=5x on interior frames). These tests pin the
dedup'd path to the window-batched forward bit-for-bit-ish (f32 tolerance)
so it can never drift into an approximation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynavsr_tpu.adapt.adaptation import (
    AdaptConfig,
    make_adapt_and_infer,
    make_adapt_and_infer_seq,
)
from dynavsr_tpu.data.windows import all_windows
from dynavsr_tpu.models.edvr import EDVR

TINY = dict(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=1)


def _tiny_edvr(**kw):
    cfg = dict(TINY)
    cfg.update(kw)
    return EDVR(**cfg)


@pytest.mark.parametrize("padding", ["reflection", "replicate", "new_info"])
def test_forward_seq_matches_windowed_call(padding):
    model = _tiny_edvr()
    t, n = 7, 3
    frames = jax.random.uniform(jax.random.PRNGKey(2), (t, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(1), frames[None, :n])
    win = jnp.asarray(all_windows(t, n, padding))
    sr_win = model.apply(params, frames[win])
    sr_seq = model.apply(params, frames, win, method="forward_seq")
    np.testing.assert_allclose(
        np.asarray(sr_seq), np.asarray(sr_win), atol=2e-5)


def test_forward_seq_no_tsa_variant():
    model = _tiny_edvr(w_TSA=False)
    t, n = 5, 3
    frames = jax.random.uniform(jax.random.PRNGKey(3), (t, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(1), frames[None, :n])
    win = jnp.asarray(all_windows(t, n, "reflection"))
    sr_win = model.apply(params, frames[win])
    sr_seq = model.apply(params, frames, win, method="forward_seq")
    np.testing.assert_allclose(
        np.asarray(sr_seq), np.asarray(sr_win), atol=2e-5)


def test_forward_seq_frame_padding_matches_per_window_padding():
    """Non-mod-4 clips: reflection-padding the FRAMES once + cropping the
    SR (the CLI's seq path) must equal mod-padding each WINDOW (the
    windowed path, models/padding.mod_pad_apply) — the pad content is
    identical either way."""
    from dynavsr_tpu.models.padding import mod_pad_apply

    model = _tiny_edvr()
    t, n, scale = 5, 3, 4
    h, w = 9, 11  # Vid4 SLR-like: not pyramid-divisible
    frames = jax.random.uniform(jax.random.PRNGKey(5), (t, h, w, 3))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, n, 12, 12, 3)))
    win = jnp.asarray(all_windows(t, n, "reflection"))

    sr_win = mod_pad_apply(
        lambda x: model.apply(params, x), frames[win], mod=4, scale=scale)

    ph, pw = (-h) % 4, (-w) % 4
    fpad = jnp.pad(frames, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="reflect")
    sr_seq = model.apply(params, fpad, win, method="forward_seq")
    sr_seq = sr_seq[:, : h * scale, : w * scale]
    np.testing.assert_allclose(
        np.asarray(sr_seq), np.asarray(sr_win), atol=2e-5)


@pytest.mark.slow
def test_adapt_and_infer_seq_matches_base():
    """Same adaptation scan, seq inference == window-batched inference —
    including a non-dividing infer_chunk (pad rows sliced off)."""
    model = _tiny_edvr()
    t, n, scale = 5, 3, 4
    h = w = 16  # SLR = h/4 = 4: the smallest pyramid-viable pseudo-task
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    frames = jax.random.uniform(k[0], (t, h, w, 3))
    slr = jax.random.uniform(k[1], (2, n, h // scale, w // scale, 3))
    lrc = jax.random.uniform(k[2], (2, h, w, 3))
    params = model.init(k[3], frames[None, :n])
    win = jnp.asarray(all_windows(t, n, "reflection"))

    cfg = AdaptConfig(n_steps=2, lr=1e-4, infer_chunk=2)
    base = make_adapt_and_infer(model, cfg, jit=False)
    seq = make_adapt_and_infer_seq(model, cfg, jit=False)

    sr_b, loss_b = base(params, slr, lrc, frames[win])
    sr_s, loss_s = seq(params, slr, lrc, frames, win)
    np.testing.assert_allclose(np.asarray(loss_s), np.asarray(loss_b),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sr_s), np.asarray(sr_b), atol=2e-5)


@pytest.mark.slow
def test_batched_seq_matches_serial_seq_8dev():
    """Clip-parallel seq serving (make_adapt_and_infer_seq_batched +
    batch_clips_seq) on the 8-device mesh: every clip's SR and adaptation
    losses must match the serial seq path — sharding and clip padding are
    pure layout. Clip lengths vary to exercise the Tmax bucketing (frame
    and window-row padding; padded rows sliced off by lens)."""
    from dynavsr_tpu.adapt.adaptation import (
        batch_clips_seq,
        make_adapt_and_infer_seq_batched,
    )
    from dynavsr_tpu.parallel.mesh import data_mesh

    assert jax.device_count() >= 8
    mesh = data_mesh(jax.devices()[:8])
    model = _tiny_edvr()
    n, h, w, scale = 3, 16, 16, 4
    rng = np.random.default_rng(0)
    clips = [rng.random((t, h, w, 3)).astype(np.float32)
             for t in [4, 6, 3, 5, 4, 6, 5, 4]]
    frames_b, win_b, adapt_w, lr_c, lens = batch_clips_seq(
        clips, n, "reflection", n_adapt=2, center=n // 2)
    assert frames_b.shape[1] == 8  # Tmax=6 bucketed to 8
    params = model.init(jax.random.PRNGKey(1),
                        jnp.asarray(clips[0][None, :n]))
    # Stand-in for the MFDN output: strided subsample to h/scale.
    slr = adapt_w[:, :, :, ::scale, ::scale, :]

    cfg = AdaptConfig(n_steps=2, lr=1e-4)
    batched = make_adapt_and_infer_seq_batched(model, cfg, mesh=mesh)
    sr_all, losses_all = batched(
        params, jnp.asarray(slr), jnp.asarray(lr_c),
        jnp.asarray(frames_b), jnp.asarray(win_b))
    assert sr_all.shape == (8, 8, h * scale, w * scale, 3)

    serial = make_adapt_and_infer_seq(model, cfg, jit=False)
    for i in (0, 2, 1):  # shortest, a middle, and a full-length clip
        t = lens[i]
        win = jnp.asarray(all_windows(t, n, "reflection"))
        sr_i, loss_i = serial(
            params, jnp.asarray(slr[i]), jnp.asarray(lr_c[i]),
            jnp.asarray(clips[i]), win)
        # vmap/sharding changes fp32 reduction order; k adaptation steps
        # amplify it — tolerance matches the non-seq batched test
        # (test_train.test_adapt_batched_clip_parallel_8dev), not a logic
        # difference (the un-adapted forward is pinned at 2e-5 above).
        np.testing.assert_allclose(
            np.asarray(losses_all[i]), np.asarray(loss_i),
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(sr_all[i, :t]), np.asarray(sr_i),
            rtol=2e-3, atol=2e-3)
