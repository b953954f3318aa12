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
    model, params, frames = _setup(t=7)
    stream = StreamingSR(model, params, n_frames=3)
    for f in frames:
        stream.push(f)
        assert len(stream._buf) <= 2 * 3 + 3
    stream.flush()
    assert stream._t == 0  # reset after flush
