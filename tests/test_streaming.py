"""StreamingSR (eval/streaming.py) — exactness and latency contract.

The streaming server must produce byte-identical SR frames to the offline
window-batched harness path for every padding policy, while emitting each
frame as soon as its window is final (N//2-frame latency for
reflection/replicate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynavsr_tpu.data.windows import all_windows
from dynavsr_tpu.eval.streaming import StreamingSR
from dynavsr_tpu.models.edvr import EDVR

TINY = dict(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=1)


def _setup(t=7, hw=8):
    model = EDVR(**TINY)
    frames = jax.random.uniform(jax.random.PRNGKey(7), (t, hw, hw, 3))
    params = model.init(jax.random.PRNGKey(1), frames[None, :3])
    return model, params, frames


@pytest.mark.parametrize(
    "padding", ["reflection", "replicate", "reflection_circle", "circle",
                "new_info"])
def test_streaming_matches_offline(padding):
    model, params, frames = _setup()
    t, n = frames.shape[0], 3

    win = jnp.asarray(all_windows(t, n, padding))
    sr_offline = np.asarray(model.apply(params, frames[win]))

    stream = StreamingSR(model, params, n_frames=n, padding=padding)
    got = []
    for f in frames:
        got.extend(stream.push(f))
    got.extend(stream.flush())

    assert [i for i, _ in got] == list(range(t))
    sr_stream = np.stack([np.asarray(sr) for _, sr in got])
    np.testing.assert_allclose(sr_stream, sr_offline, atol=2e-5)


def test_streaming_latency_reflection():
    """reflection: frame i emits as soon as frame i + N//2 arrives."""
    model, params, frames = _setup(t=6)
    stream = StreamingSR(model, params, n_frames=3, padding="reflection")
    emitted_at = {}
    for step, f in enumerate(frames):
        for i, _ in stream.push(f):
            emitted_at[i] = step
    tail = [i for i, _ in stream.flush()]
    # center i needs arrival of frame i+1 (= push step i+1); frame 0's
    # window [1,0,1] completes at step 1 together with nothing else.
    assert emitted_at == {0: 1, 1: 2, 2: 3, 3: 4, 4: 5}
    assert tail == [5]


def test_streaming_buffer_stays_bounded():
    """The on-device ring is allocated ONCE at 2N arrival slots and never
    grows — O(1) memory per stream regardless of clip length."""
    model, params, frames = _setup(t=7)
    n = 3
    stream = StreamingSR(model, params, n_frames=n)
    for f in frames:
        stream.push(f)
        leaves = jax.tree_util.tree_leaves(stream._rings)
        assert leaves and all(leaf.shape[0] == 2 * n for leaf in leaves)
    stream.flush()
    assert stream._t == 0 and stream._rings is None  # reset after flush


# ---------------------------------------------------- adapt-then-serve
def _estimator(hw=16):
    from dynavsr_tpu.models.networks import define_G

    est = define_G({"scale": 4, "network_G": {"which_model_G": "MFDN",
                                              "nf": 8}})
    ep = est.init(jax.random.PRNGKey(9),
                  jnp.zeros((1, 3, hw, hw, 3)))
    return est, ep


@pytest.mark.slow
def test_streaming_with_adaptation_matches_offline():
    """StreamingSR(adapter=..., adapt_windows=K) must equal the offline
    adapted path: make_adapt_and_infer on the same estimator pseudo-task
    over the first K windows, then serving every window adapted."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.eval.streaming import make_streaming_adapter

    model, params, frames = _setup(t=7, hw=16)
    t, n, k = frames.shape[0], 3, 2
    est, ep = _estimator()
    cfg = AdaptConfig(n_steps=2, lr=1e-4)

    win = all_windows(t, n, "reflection")
    windows = frames[jnp.asarray(win)]
    slr = est.apply(ep, windows[:k])
    offline = make_adapt_and_infer(model, cfg)
    sr_off, losses_off = offline(params, slr, windows[:k, n // 2], windows)

    adapter = make_streaming_adapter(model, cfg, est.apply, ep)
    stream = StreamingSR(model, params, n_frames=n, adapter=adapter,
                         adapt_windows=k)
    got = []
    for f in frames:
        got.extend(stream.push(f))
    got.extend(stream.flush())
    assert [i for i, _ in got] == list(range(t))
    sr_stream = np.stack([np.asarray(sr) for _, sr in got])
    np.testing.assert_allclose(sr_stream, np.asarray(sr_off),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stream.adapt_losses),
                               np.asarray(losses_off), rtol=1e-5, atol=1e-6)
    # reset restores the un-adapted state for the next clip
    assert stream._t == 0 and not stream._adapted


@pytest.mark.slow
@pytest.mark.parametrize(
    "padding", ["reflection_circle", "new_info", "circle", "replicate"])
def test_streaming_adaptation_matches_offline_all_paddings(padding):
    """Warm-up gating must wait for every frame the first K windows
    REFERENCE — reflection_circle/new_info/circle start windows borrow up
    to 2*(N//2) frames ahead of their center, past the old fixed
    K + N//2 trigger (whose silent out-of-range gather clamp adapted on
    wrong window contents — round-4 advisor finding). K=1 with N=3 makes
    window 0 reach frame 2 while the old trigger fired at 2 buffered
    frames."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.eval.streaming import make_streaming_adapter

    model, params, frames = _setup(t=7, hw=16)
    t, n, k = frames.shape[0], 3, 1
    est, ep = _estimator()
    cfg = AdaptConfig(n_steps=2, lr=1e-4)

    win = all_windows(t, n, padding)
    windows = frames[jnp.asarray(win)]
    slr = est.apply(ep, windows[:k])
    sr_off, losses_off = make_adapt_and_infer(model, cfg)(
        params, slr, windows[:k, n // 2], windows)

    adapter = make_streaming_adapter(model, cfg, est.apply, ep)
    stream = StreamingSR(model, params, n_frames=n, padding=padding,
                         adapter=adapter, adapt_windows=k)
    got = []
    for f in frames:
        got.extend(stream.push(f))
    got.extend(stream.flush())
    assert [i for i, _ in got] == list(range(t))
    sr_stream = np.stack([np.asarray(sr) for _, sr in got])
    np.testing.assert_allclose(sr_stream, np.asarray(sr_off),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stream.adapt_losses),
                               np.asarray(losses_off), rtol=1e-5, atol=1e-6)


def test_stacked_params_with_adapter_rejected():
    """params_stacked + adapter is a contradiction (warm-up starts every
    group from ONE initial pytree); must fail at construction, not with a
    shape error deep inside warm-up."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig
    from dynavsr_tpu.eval.streaming import MultiStreamSR, make_streaming_adapter

    model, params, _ = _setup()
    est, ep = _estimator(hw=8)
    stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), params)
    adapter = make_streaming_adapter(
        model, AdaptConfig(n_steps=1, lr=1e-4), est.apply, ep, batched=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        MultiStreamSR(model, stacked, n_streams=2, n_frames=3,
                      params_stacked=True, adapter=adapter, adapt_windows=1)


@pytest.mark.slow
def test_streaming_adaptation_short_clip_clamps():
    """A stream shorter than the warm-up adapts on min(K, T) windows with
    true-length border windows at flush — the offline n_adapt clamp."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.eval.streaming import make_streaming_adapter

    model, params, frames = _setup(t=3, hw=16)
    t, n, k = frames.shape[0], 3, 8  # warm-up needs 9 frames; clip has 3
    est, ep = _estimator()
    cfg = AdaptConfig(n_steps=2, lr=1e-4)

    win = all_windows(t, n, "reflection")
    windows = frames[jnp.asarray(win)]
    kk = min(k, t)
    slr = est.apply(ep, windows[:kk])
    sr_off, _ = make_adapt_and_infer(model, cfg)(
        params, slr, windows[:kk, n // 2], windows)

    adapter = make_streaming_adapter(model, cfg, est.apply, ep)
    stream = StreamingSR(model, params, n_frames=n, adapter=adapter,
                         adapt_windows=k)
    got = []
    for f in frames:
        got.extend(stream.push(f))
    assert got == []  # nothing emitted mid-warm-up
    got = stream.flush()
    sr_stream = np.stack([np.asarray(sr) for _, sr in got])
    np.testing.assert_allclose(sr_stream, np.asarray(sr_off),
                               rtol=1e-4, atol=1e-4)


# -------------------------------------------------- generic window streamer
@pytest.mark.slow
def test_window_stream_tof_matches_offline():
    """WindowStreamSR (no pyramid split): TOF served online must equal the
    offline window-batched forward — round-4 verdict item 5 (online
    serving was EDVR-only)."""
    from dynavsr_tpu.eval.streaming import WindowStreamSR
    from dynavsr_tpu.models.tof import TOFlow

    model = TOFlow()
    t, n, hw = 6, 3, 16
    frames = jax.random.uniform(jax.random.PRNGKey(21), (t, hw, hw, 3))
    params = model.init(jax.random.PRNGKey(1), frames[None, :n])

    win = jnp.asarray(all_windows(t, n, "reflection"))
    sr_off = np.asarray(model.apply(params, frames[win]))

    stream = WindowStreamSR(model, params, n_frames=n, padding="reflection")
    got = []
    for f in frames:
        got.extend(stream.push(f))
    got.extend(stream.flush())
    assert [i for i, _ in got] == list(range(t))
    sr_stream = np.stack([np.asarray(sr) for _, sr in got])
    np.testing.assert_allclose(sr_stream, sr_off, atol=2e-5)


@pytest.mark.slow
def test_window_stream_duf_matches_offline():
    from dynavsr_tpu.eval.streaming import WindowStreamSR
    from dynavsr_tpu.models.duf import DUF

    model = DUF(scale=4, dense1_layers=1)
    t, n, hw = 9, 7, 8
    frames = jax.random.uniform(jax.random.PRNGKey(22), (t, hw, hw, 3))
    params = model.init(jax.random.PRNGKey(1), frames[None, :n])

    win = jnp.asarray(all_windows(t, n, "replicate"))
    sr_off = np.asarray(model.apply(params, frames[win]))

    stream = WindowStreamSR(model, params, n_frames=n, padding="replicate")
    got = []
    for f in frames:
        got.extend(stream.push(f))
    got.extend(stream.flush())
    assert [i for i, _ in got] == list(range(t))
    sr_stream = np.stack([np.asarray(sr) for _, sr in got])
    np.testing.assert_allclose(sr_stream, sr_off, atol=2e-5)


@pytest.mark.slow
def test_window_stream_adaptation_matches_offline():
    """Adapt-then-serve through the generic window streamer (DUF, BN
    train_ema semantics): must equal the offline adapted path — the same
    make_streaming_adapter contract as the EDVR streamer."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.eval.streaming import WindowStreamSR, make_streaming_adapter
    from dynavsr_tpu.models.duf import DUF
    from dynavsr_tpu.models.networks import define_G

    model = DUF(scale=4, dense1_layers=1)
    t, n, k, hw = 9, 7, 2, 16
    frames = jax.random.uniform(jax.random.PRNGKey(23), (t, hw, hw, 3))
    params = model.init(jax.random.PRNGKey(1), frames[None, :n])
    est = define_G({"scale": 4, "network_G": {"which_model_G": "MFDN",
                                              "nf": 8}})
    ep = est.init(jax.random.PRNGKey(9), jnp.zeros((1, n, hw, hw, 3)))
    cfg = AdaptConfig(n_steps=2, lr=1e-4)

    win = all_windows(t, n, "replicate")
    windows = frames[jnp.asarray(win)]
    slr = est.apply(ep, windows[:k])
    sr_off, losses_off = make_adapt_and_infer(model, cfg)(
        params, slr, windows[:k, n // 2], windows)

    adapter = make_streaming_adapter(model, cfg, est.apply, ep)
    stream = WindowStreamSR(model, params, n_frames=n, padding="replicate",
                            adapter=adapter, adapt_windows=k)
    got = []
    for f in frames:
        got.extend(stream.push(f))
    got.extend(stream.flush())
    assert [i for i, _ in got] == list(range(t))
    sr_stream = np.stack([np.asarray(sr) for _, sr in got])
    np.testing.assert_allclose(sr_stream, np.asarray(sr_off),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stream.adapt_losses),
                               np.asarray(losses_off), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------- multi-stream
@pytest.mark.slow
def test_multi_stream_lockstep_matches_single():
    """MultiStreamSR with shared params == B independent StreamingSRs."""
    from dynavsr_tpu.eval.streaming import MultiStreamSR

    model, params, _ = _setup()
    b, t, hw, n = 3, 6, 8, 3
    clips = jax.random.uniform(jax.random.PRNGKey(11), (b, t, hw, hw, 3))

    ms = MultiStreamSR(model, params, n_streams=b, n_frames=n)
    got = []
    for i in range(t):
        got.extend(ms.push(clips[:, i]))
    got.extend(ms.flush())
    assert [i for i, _ in got] == list(range(t))
    sr_multi = np.stack([np.asarray(sr) for _, sr in got], axis=1)  # (B,T,..)

    for s in range(b):
        single = StreamingSR(model, params, n_frames=n)
        ref = []
        for f in clips[s]:
            ref.extend(single.push(f))
        ref.extend(single.flush())
        sr_ref = np.stack([np.asarray(sr) for _, sr in ref])
        np.testing.assert_allclose(sr_multi[s], sr_ref, atol=2e-5)


@pytest.mark.slow
def test_multi_stream_per_stream_params():
    """Stacked per-stream params: each stream must be served by ITS OWN
    net (the adapt-then-serve deployment mode)."""
    from dynavsr_tpu.eval.streaming import MultiStreamSR

    model, params, _ = _setup()
    b, t, hw, n = 2, 5, 8, 3
    clips = jax.random.uniform(jax.random.PRNGKey(12), (b, t, hw, hw, 3))
    # two genuinely different nets
    p2 = model.init(jax.random.PRNGKey(99), clips[:1, :3, :, :, :][0][None])
    stacked = jax.tree_util.tree_map(
        lambda a, c: jnp.stack([a, c]), params, p2)

    ms = MultiStreamSR(model, stacked, n_streams=b, n_frames=n,
                       params_stacked=True)
    got = []
    for i in range(t):
        got.extend(ms.push(clips[:, i]))
    got.extend(ms.flush())
    sr_multi = np.stack([np.asarray(sr) for _, sr in got], axis=1)

    for s, p in enumerate([params, p2]):
        single = StreamingSR(model, p, n_frames=n)
        ref = []
        for f in clips[s]:
            ref.extend(single.push(f))
        ref.extend(single.flush())
        sr_ref = np.stack([np.asarray(sr) for _, sr in ref])
        np.testing.assert_allclose(sr_multi[s], sr_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_multi_stream_adaptation_per_stream():
    """Batched adapter: every stream adapts on its own windows; output
    equals B independent adapted single streams."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig
    from dynavsr_tpu.eval.streaming import MultiStreamSR, make_streaming_adapter

    model, params, _ = _setup(hw=16)
    b, t, hw, n, k = 2, 6, 16, 3, 2
    clips = jax.random.uniform(jax.random.PRNGKey(13), (b, t, hw, hw, 3))
    est, ep = _estimator()
    cfg = AdaptConfig(n_steps=2, lr=1e-4)

    ms = MultiStreamSR(model, params, n_streams=b, n_frames=n,
                       adapter=make_streaming_adapter(model, cfg, est.apply,
                                                      ep, batched=True),
                       adapt_windows=k)
    got = []
    for i in range(t):
        got.extend(ms.push(clips[:, i]))
    got.extend(ms.flush())
    assert [i for i, _ in got] == list(range(t))
    sr_multi = np.stack([np.asarray(sr) for _, sr in got], axis=1)

    adapter1 = make_streaming_adapter(model, cfg, est.apply, ep)
    for s in range(b):
        single = StreamingSR(model, params, n_frames=n, adapter=adapter1,
                             adapt_windows=k)
        ref = []
        for f in clips[s]:
            ref.extend(single.push(f))
        ref.extend(single.flush())
        sr_ref = np.stack([np.asarray(sr) for _, sr in ref])
        np.testing.assert_allclose(sr_multi[s], sr_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_multi_stream_grouped_adaptation():
    """n_groups=G: consecutive blocks of B/G streams share ONE param set
    adapted on the POOLED first-K windows of the block's streams. Pinned
    against the explicit construction: concatenate the block's window
    stacks, run the unbatched adapter once per group, serve every stream
    of the block with the group's params."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig
    from dynavsr_tpu.data.windows import index_generation
    from dynavsr_tpu.eval.streaming import MultiStreamSR, make_streaming_adapter

    model, params, _ = _setup(hw=16)
    b, g, t, hw, n, k = 4, 2, 6, 16, 3, 2
    clips = jax.random.uniform(jax.random.PRNGKey(14), (b, t, hw, hw, 3))
    est, ep = _estimator()
    cfg = AdaptConfig(n_steps=2, lr=1e-4)

    ms = MultiStreamSR(model, params, n_streams=b, n_frames=n,
                       adapter=make_streaming_adapter(model, cfg, est.apply,
                                                      ep, batched=True),
                       adapt_windows=k, n_groups=g)
    got = []
    for i in range(t):
        got.extend(ms.push(clips[:, i]))
    got.extend(ms.flush())
    assert [i for i, _ in got] == list(range(t))
    assert jax.tree_util.tree_leaves(ms.adapt_losses)[0].shape[0] == g
    sr_multi = np.stack([np.asarray(sr) for _, sr in got], axis=1)

    adapter1 = make_streaming_adapter(model, cfg, est.apply, ep)
    idx = [index_generation(j, 1 << 30, n, "reflection") for j in range(k)]
    for gi in range(g):
        streams = range(gi * (b // g), (gi + 1) * (b // g))
        pooled = jnp.concatenate(
            [jnp.stack([clips[s][np.array(ix)] for ix in idx])  # (K, N, h, w, 3)
             for s in streams])
        p_g, _ = adapter1(params, pooled)
        for s in streams:
            single = StreamingSR(model, p_g, n_frames=n)
            ref = []
            for f in clips[s]:
                ref.extend(single.push(f))
            ref.extend(single.flush())
            sr_ref = np.stack([np.asarray(sr) for _, sr in ref])
            np.testing.assert_allclose(sr_multi[s], sr_ref,
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_multi_stream_grouped_stacked_params():
    """params_stacked + n_groups=G without an adapter: a (G,)-stacked
    pytree serves blocks of B/G streams — each block must be served by
    ITS group's net."""
    from dynavsr_tpu.eval.streaming import MultiStreamSR

    model, params, _ = _setup()
    b, g, t, hw, n = 4, 2, 5, 8, 3
    clips = jax.random.uniform(jax.random.PRNGKey(15), (b, t, hw, hw, 3))
    p2 = model.init(jax.random.PRNGKey(98), clips[0, :3][None])
    stacked = jax.tree_util.tree_map(
        lambda a, c: jnp.stack([a, c]), params, p2)

    ms = MultiStreamSR(model, stacked, n_streams=b, n_frames=n,
                       params_stacked=True, n_groups=g)
    got = []
    for i in range(t):
        got.extend(ms.push(clips[:, i]))
    got.extend(ms.flush())
    sr_multi = np.stack([np.asarray(sr) for _, sr in got], axis=1)

    for s, p in zip(range(b), [params, params, p2, p2]):
        single = StreamingSR(model, p, n_frames=n)
        ref = []
        for f in clips[s]:
            ref.extend(single.push(f))
        ref.extend(single.flush())
        sr_ref = np.stack([np.asarray(sr) for _, sr in ref])
        np.testing.assert_allclose(sr_multi[s], sr_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_multi_stream_single_group_takes_plain_path():
    """n_groups=1 (with or without adapter) is normalized to the g=0
    no-vmap serving path — a size-1 vmapped-params axis lowers convs to
    grouped/looped form and measured 72.4 vs ~51 ms/frame/stream
    (results_r04/stream_groups_g1.log). Output must equal serving every
    stream with the squeezed pytree on the plain path."""
    from dynavsr_tpu.adapt.adaptation import AdaptConfig
    from dynavsr_tpu.eval.streaming import MultiStreamSR, make_streaming_adapter

    model, params, _ = _setup(hw=16)
    b, t, hw, n, k = 2, 5, 16, 3, 2
    clips = jax.random.uniform(jax.random.PRNGKey(16), (b, t, hw, hw, 3))

    # Stacked (1,)-params without an adapter: squeezed at construction.
    stacked = jax.tree_util.tree_map(lambda a: a[None], params)
    ms = MultiStreamSR(model, stacked, n_streams=b, n_frames=n,
                       params_stacked=True, n_groups=1)
    assert ms._g == 0
    got = []
    for i in range(t):
        got.extend(ms.push(clips[:, i]))
    got.extend(ms.flush())
    sr_multi = np.stack([np.asarray(sr) for _, sr in got], axis=1)

    shared = MultiStreamSR(model, params, n_streams=b, n_frames=n)
    ref = []
    for i in range(t):
        ref.extend(shared.push(clips[:, i]))
    ref.extend(shared.flush())
    sr_ref = np.stack([np.asarray(sr) for _, sr in ref], axis=1)
    np.testing.assert_array_equal(sr_multi, sr_ref)

    # With an adapter: post-warm-up params squeeze back to the plain path.
    est, ep = _estimator()
    cfg = AdaptConfig(n_steps=1, lr=1e-4)
    ms_a = MultiStreamSR(model, params, n_streams=b, n_frames=n,
                         adapter=make_streaming_adapter(model, cfg, est.apply,
                                                        ep, batched=True),
                         adapt_windows=k, n_groups=1)
    for i in range(t):
        ms_a.push(clips[:, i])
    ms_a.flush()
    assert ms_a._g == 0
    assert not any(
        a.ndim and a.shape[0] == 1 and a.shape != p.shape
        for a, p in zip(jax.tree_util.tree_leaves(ms_a.params),
                        jax.tree_util.tree_leaves(params)))


def test_multi_stream_groups_must_divide():
    from dynavsr_tpu.eval.streaming import MultiStreamSR

    model, params, _ = _setup()
    with pytest.raises(ValueError, match="divide"):
        MultiStreamSR(model, params, n_streams=4, n_frames=3,
                      params_stacked=True, n_groups=3)
