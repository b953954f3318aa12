"""Streaming (online) SR serving — beyond-reference capability.

The reference only evaluates offline (whole clip on disk, one pass —
test_Vid4_REDS4_with_GT.py's per-frame loop, SURVEY.md §2.5). Production
serving often receives frames as a stream; EDVR's pyramid-split forward
(models/edvr.py extract_pyramid / fuse_pyramid) makes an O(1)-per-frame
streaming server natural: each arriving frame is feature-extracted ONCE,
its pyramid rides a short ring buffer, and each emitted SR frame costs
exactly one window fuse (PCD+TSA+reconstruction).

Exactness contract: outputs are bit-identical to the offline harness
(eval/harness.evaluate_clip over data/windows.all_windows with the same
padding policy) — tests/test_streaming.py pins it. The price of exactness
is latency: frame i's window can reference frames up to i + 2*(N//2)
ahead (padding-dependent), so emission lags arrival by N//2 frames
(reflection/replicate) or up to 2*(N//2) (reflection_circle/new_info),
and the last windows drain in flush() when the clip length is known.

Typical use (optionally with test-time-adapted params):

    stream = StreamingSR(model, adapted_params, n_frames=5)
    for frame in source:                 # (H, W, 3) float32 [0,1]
        for i, sr in stream.push(frame): # zero or more ready SR frames
            sink(i, sr)
    for i, sr in stream.flush():
        sink(i, sr)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from dynavsr_tpu.data.windows import index_generation

__all__ = ["StreamingSR"]

# "No end-border in sight" sentinel clip length: windows computed with this
# max_n equal the true-T windows whenever center + N//2 <= T-1, which the
# emission rule guarantees (see _ready_through).
_OPEN = 1 << 30


class StreamingSR:
    """Online sliding-window SR over a frame stream (EDVR-family models
    exposing extract_pyramid/fuse_pyramid).

    Per-frame cost: one pyramid extraction (B=1) + one window fuse per
    emitted frame — no recomputation of shared neighbors. The pyramid
    buffer holds O(N) frames (old entries evicted once no future window
    can reference them).
    """

    def __init__(self, model, params, n_frames: int = 5,
                 padding: str = "reflection"):
        self.model = model
        self.params = params
        self.n = int(n_frames)
        self.pad = padding
        self._extract = jax.jit(
            lambda p, f: model.apply(p, f, method="extract_pyramid"))
        self._fuse = jax.jit(
            lambda p, l1, l2, l3, xc: model.apply(
                p, l1, l2, l3, xc, method="fuse_pyramid"))
        self.reset()

    def reset(self) -> None:
        self._t = 0          # frames pushed so far
        self._next = 0       # next center index to emit
        self._buf: Dict[int, Any] = {}  # idx -> ((l1, l2, l3), frame)

    # ------------------------------------------------------------- internal
    def _needs(self, i: int) -> int:
        """Largest frame index window i references, assuming no end border
        (valid exactly when that index has arrived)."""
        return max(index_generation(i, _OPEN, self.n, self.pad))

    def _emit(self, i: int, max_n: int):
        idx = index_generation(i, max_n, self.n, self.pad)
        l1 = jnp.stack([self._buf[j][0][0][0] for j in idx])[None]
        l2 = jnp.stack([self._buf[j][0][1][0] for j in idx])[None]
        l3 = jnp.stack([self._buf[j][0][2][0] for j in idx])[None]
        xc = self._buf[idx[self.n // 2]][1][None]
        return self._fuse(self.params, l1, l2, l3, xc)[0]

    def _evict(self) -> None:
        # No padding strategy references an index more than 2*n below a
        # future center (circle's end case reaches center - n + n//2);
        # keep a conservative 2*n trailing margin.
        floor = self._next - 2 * self.n
        for j in [j for j in self._buf if j < floor]:
            del self._buf[j]

    # --------------------------------------------------------------- public
    def push(self, frame) -> List[Tuple[int, Any]]:
        """Feed one (H, W, 3) frame; returns the SR frames whose windows
        became complete, as (frame_index, (H*scale, W*scale, 3)) pairs."""
        frame = jnp.asarray(frame)
        pyr = self._extract(self.params, frame[None])
        self._buf[self._t] = (pyr, frame)
        self._t += 1
        out = []
        # A window computed with the open-ended border rule is final only
        # if it cannot be an END window of the true clip: that needs the
        # full right reach (center + n//2) to have ARRIVED, not merely its
        # mirror — hence strictly `needs < t` AND `center + n//2 < t`.
        while self._next + self.n // 2 < self._t \
                and self._needs(self._next) < self._t:
            out.append((self._next, self._emit(self._next, _OPEN)))
            self._next += 1
            self._evict()
        return out

    def flush(self) -> List[Tuple[int, Any]]:
        """End of stream: emit the remaining tail windows using the true
        clip length (end-border padding), then reset."""
        out = []
        t = self._t
        for i in range(self._next, t):
            out.append((i, self._emit(i, t)))
        self.reset()
        return out
