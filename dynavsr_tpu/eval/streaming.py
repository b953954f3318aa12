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

Adapt-then-serve (the DynaVSR product, online): pass `adapter` +
`adapt_windows=K`. The server buffers the stream until the first K
sliding windows are complete (K + N//2 frames for the start-border
paddings — their window tables are provably identical to the offline
protocol's first K rows, since data/windows.index_generation's start
branches don't depend on clip length), runs the k-step adaptation once,
then streams with the adapted params. Streams shorter than the warm-up
adapt on min(K, T) windows at flush() — exactly the offline n_adapt
clamp. Build the adapter with make_streaming_adapter (MFDN pseudo-task
+ adapt scan, one jitted call).

Throughput mode: MultiStreamSR serves B streams in LOCKSTEP (push takes
a (B, H, W, 3) stack, one batched extract per arrival step, one batched
fuse per emission) — amortizing the B=1 fuse that costs the single
stream ~1.9x vs batched serving (results_r03/stream_bench_*). Streams
may share params, carry per-stream (adapted) params stacked on a
leading axis, or — the middle of that frontier — be partitioned into
`n_groups` GROUPS that each share one adapted param set (e.g. streams
from the same camera). Grouped/per-stream serving runs one PLAIN
dispatch per group rather than vmapping model.apply over params: the
vmap lowers convs to grouped/looped form (measured 108.3 ms/frame/
stream fully per-stream at B=4, and halving the distinct param sets
recovered only ~8% — results_r04/stream_adapt_multi.log,
stream_groups_g2.log), while per-group dense dispatches reuse the one
plain executable. With an adapter, each group adapts ONCE on the
pooled first-K windows of all its streams.

Typical use (optionally with test-time-adapted params):

    stream = StreamingSR(model, params, n_frames=5)
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

__all__ = ["StreamingSR", "MultiStreamSR", "make_streaming_adapter"]

# "No end-border in sight" sentinel clip length: windows computed with this
# max_n equal the true-T windows whenever center + N//2 <= T-1, which the
# emission rule guarantees (see _ready_through).
_OPEN = 1 << 30


def make_streaming_adapter(vsr_model, cfg, est_apply, est_params,
                           apply_fn=None, mutable_apply_fn=None,
                           batched: bool = False):
    """Build the warm-up `adapter(params, windows) -> (adapted, losses)`
    for StreamingSR/MultiStreamSR: the MFDN/SFDN pseudo-task (SLR =
    estimator(windows) -> LR center) followed by the k-step adaptation
    scan (adapt/adaptation.make_adapt_fn), all ONE jitted call.

    windows: (K, N, h, w, 3) — or (B, K, N, h, w, 3) with batched=True
    (per-stream/per-group adaptation for MultiStreamSR; params come out
    stacked with a leading B axis). The batched variant runs the B
    adaptations via lax.map, NOT vmap: vmapping the adapt scan batches
    the conv WEIGHTS after step 1, lowering every conv (and its VJP) to
    grouped form — measured 1.93x slower on the offline analog
    (results_r04/clip_parallel_probe_g2.log)."""
    from dynavsr_tpu.adapt.adaptation import make_adapt_fn

    adapt = make_adapt_fn(vsr_model, cfg, jit=False, apply_fn=apply_fn,
                          mutable_apply_fn=mutable_apply_fn)

    def one(params, windows):
        n = windows.shape[1]
        slr = est_apply(est_params, windows)
        return adapt(params, slr, windows[:, n // 2])

    if batched:
        def many(params, windows):
            return jax.lax.map(lambda w: one(params, w), windows)

        return jax.jit(many)
    return jax.jit(one)


class _StreamCore:
    """Shared engine: B lockstep streams over one window/ring-buffer state.

    Pyramids are buffered per arrival index with a leading (B,) axis; an
    emission stacks N buffered pyramids into the (B, N, ...) fuse input.
    Param sharing is a GROUP count g: g=0 means one shared pytree and
    one full-batch dispatch per extract/fuse; g>0 means params carry a
    leading (g,) axis and each extract/fuse is ONE dispatch of a grouped
    executable that lax.map's the plain batch-B/g body over the g groups
    (consecutive streams) — g=B is the fully per-stream mode, 0<g<B the
    grouped middle.

    Why lax.map and not vmap: vmapping model.apply over PARAMS lowers
    every conv to a grouped/looped conv (weights gain a batch axis),
    which measured 108.3 ms/frame/stream fully per-stream at B=4 and
    recovered only ~8% when halving the distinct param sets
    (results_r04/stream_adapt_multi.log, stream_groups_g2.log) — the
    lowering, not weight traffic, dominates. lax.map's body runs ONE
    param set per iteration, so every conv stays dense. (Design
    history: round 4c shipped g SEQUENTIAL host dispatches of the plain
    executable — same dense-conv insight, but paying g-1 dispatch
    latencies of ~10-25 ms plus per-leaf concatenates per step; the
    in-graph lax.map supersedes it.) g == 1 is still NORMALIZED to g=0
    (params squeezed, zero slicing)."""

    def __init__(self, model, params, n_streams: int, n_frames: int,
                 padding: str, adapter=None, adapt_windows: int = 0,
                 params_stacked: bool = False, n_groups: int | None = None):
        self.model = model
        self.b = int(n_streams)
        self.n = int(n_frames)
        self.pad = padding
        self.adapter = adapter
        self.k_adapt = int(adapt_windows)
        self._params0 = params
        # Group count now (for the params passed in) and after warm-up
        # (for the params the adapter produces).
        self._g0 = (n_groups or self.b) if params_stacked else 0
        self._g_adapt = (n_groups or self.b) if adapter is not None else 0
        for g in {self._g0, self._g_adapt} - {0}:
            if self.b % g:
                raise ValueError(
                    f"n_groups={g} must divide n_streams={self.b}")
        if self._g0 == 1:  # one group == shared params: take the fast path
            self._params0 = jax.tree_util.tree_map(
                lambda a: a[0], self._params0)
            self._g0 = 0
        self.adapt_losses = None

        def ex(p, f):  # f: (batch, h, w, 3) -> pyramids each (batch, ...)
            return model.apply(p, f, method="extract_pyramid")

        def fu(p, l1, l2, l3, xc):  # (batch, N, ...) -> (batch, H, W, 3)
            return model.apply(p, l1, l2, l3, xc, method="fuse_pyramid")

        def _regroup(a, g):  # (B, ...) -> (g, B/g, ...), consecutive blocks
            return a.reshape((g, a.shape[0] // g) + a.shape[1:])

        def ex_g(p, f):  # p leaves (g, ...); f (B, h, w, 3)
            g = jax.tree_util.tree_leaves(p)[0].shape[0]
            outs = jax.lax.map(lambda t: ex(t[0], t[1]), (p, _regroup(f, g)))
            return jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), outs)

        def fu_g(p, l1, l2, l3, xc):
            g = jax.tree_util.tree_leaves(p)[0].shape[0]
            sr = jax.lax.map(
                lambda t: fu(*t),
                (p, _regroup(l1, g), _regroup(l2, g), _regroup(l3, g),
                 _regroup(xc, g)))
            return sr.reshape((-1,) + sr.shape[2:])

        # Shape-polymorphic via jit retrace: one plain executable when
        # g=0, one grouped (lax.map) executable per (g, B/g) otherwise.
        self._ex, self._fu = jax.jit(ex), jax.jit(fu)
        self._ex_g, self._fu_g = jax.jit(ex_g), jax.jit(fu_g)
        self.reset()

    def _extract(self, frames):
        if self._g == 0:
            return self._ex(self.params, frames)
        return self._ex_g(self.params, frames)

    def _fuse(self, l1, l2, l3, xc):
        if self._g == 0:
            return self._fu(self.params, l1, l2, l3, xc)
        return self._fu_g(self.params, l1, l2, l3, xc)

    def reset(self) -> None:
        self.params = self._params0
        self._g = self._g0
        self._t = 0          # frames pushed so far
        self._next = 0       # next center index to emit
        self._buf: Dict[int, Any] = {}  # idx -> ((l1, l2, l3), frames)
        self._adapted = self.adapter is None or self.k_adapt <= 0
        self._raw: List[Any] = []  # warm-up frame buffer (B, h, w, 3) each

    # ------------------------------------------------------------- internal
    def _needs(self, i: int) -> int:
        """Largest frame index window i references, assuming no end border
        (valid exactly when that index has arrived)."""
        return max(index_generation(i, _OPEN, self.n, self.pad))

    def _emit(self, i: int, max_n: int):
        idx = index_generation(i, max_n, self.n, self.pad)
        l1 = jnp.stack([self._buf[j][0][0] for j in idx], axis=1)
        l2 = jnp.stack([self._buf[j][0][1] for j in idx], axis=1)
        l3 = jnp.stack([self._buf[j][0][2] for j in idx], axis=1)
        xc = self._buf[idx[self.n // 2]][1]
        return self._fuse(l1, l2, l3, xc)

    def _evict(self) -> None:
        # No padding strategy references an index more than 2*n below a
        # future center (circle's end case reaches center - n + n//2);
        # keep a conservative 2*n trailing margin.
        floor = self._next - 2 * self.n
        for j in [j for j in self._buf if j < floor]:
            del self._buf[j]

    def _ingest(self, frames) -> None:
        pyr = self._extract(frames)
        self._buf[self._t] = (pyr, frames)
        self._t += 1

    def _drain(self) -> List[Tuple[int, Any]]:
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

    def _warmup(self, k: int, max_n: int) -> None:
        """Run the adapter on the first k complete windows of the buffered
        frames, then ingest the buffer with the ADAPTED params (pyramids
        must come from the net that serves them)."""
        frames = jnp.stack(self._raw)  # (t, B, h, w, 3)
        idx = jnp.asarray(
            [index_generation(i, max_n, self.n, self.pad) for i in range(k)])
        windows = frames[idx]  # (K, N, B, h, w, 3)
        windows = jnp.moveaxis(windows, 2, 0)  # (B, K, N, h, w, 3)
        if isinstance(self, StreamingSR):
            self.params, self.adapt_losses = self.adapter(
                self.params, windows[0])
        else:
            g = self._g_adapt
            if g < self.b:
                # Grouped adaptation: pool each group's streams' first-K
                # windows into one (B/g * K)-window adaptation task. The
                # reshape is group-major-contiguous (streams [i*B/g,
                # (i+1)*B/g) pool in stream order), so group i's task is
                # bit-identical to concatenating its streams' window
                # stacks — tests/test_streaming.py pins equality against
                # that explicit construction.
                windows = windows.reshape(
                    (g, self.b // g * windows.shape[1]) + windows.shape[2:])
            self.params, self.adapt_losses = self.adapter(
                self.params, windows)
            if g == 1:  # squeeze the size-1 group axis: plain-path serving
                self.params = jax.tree_util.tree_map(
                    lambda a: a[0], self.params)
                g = 0
            self._g = g
        self._adapted = True
        for f in self._raw:
            self._ingest(f)
        self._raw = []

    # --------------------------------------------------------------- public
    def _push(self, frames) -> List[Tuple[int, Any]]:
        if not self._adapted:
            self._raw.append(frames)
            if len(self._raw) >= self.k_adapt + self.n // 2:
                # The first k_adapt open-rule windows are final AND equal
                # the offline protocol's rows (start branches of
                # index_generation are length-independent).
                self._warmup(self.k_adapt, _OPEN)
                return self._drain()
            return []
        self._ingest(frames)
        return self._drain()

    def _flush(self) -> List[Tuple[int, Any]]:
        if not self._adapted:
            # Stream ended inside the warm-up: adapt on min(K, T) windows
            # computed with the TRUE length (the offline n_adapt clamp).
            t = len(self._raw)
            if t == 0:
                self.reset()
                return []
            self._warmup(min(self.k_adapt, t), t)
        out = []
        t = self._t
        for i in range(self._next, t):
            out.append((i, self._emit(i, t)))
        self.reset()
        return out


class StreamingSR(_StreamCore):
    """Online sliding-window SR over a frame stream (EDVR-family models
    exposing extract_pyramid/fuse_pyramid).

    Per-frame cost: one pyramid extraction (B=1) + one window fuse per
    emitted frame — no recomputation of shared neighbors. The pyramid
    buffer holds O(N) frames (old entries evicted once no future window
    can reference them).

    With `adapter` (make_streaming_adapter) + `adapt_windows=K`: frames
    buffer until the first K windows are complete, the k-step adaptation
    runs once, and the whole stream is then served with the adapted
    params (module docstring; exactness vs the offline adapted path is
    pinned by tests/test_streaming.py)."""

    def __init__(self, model, params, n_frames: int = 5,
                 padding: str = "reflection", adapter=None,
                 adapt_windows: int = 0):
        super().__init__(model, params, 1, n_frames, padding,
                         adapter=adapter, adapt_windows=adapt_windows)

    def push(self, frame) -> List[Tuple[int, Any]]:
        """Feed one (H, W, 3) frame; returns the SR frames whose windows
        became complete, as (frame_index, (H*scale, W*scale, 3)) pairs."""
        out = self._push(jnp.asarray(frame)[None])
        return [(i, sr[0]) for i, sr in out]

    def flush(self) -> List[Tuple[int, Any]]:
        """End of stream: emit the remaining tail windows using the true
        clip length (end-border padding), then reset."""
        return [(i, sr[0]) for i, sr in self._flush()]


class MultiStreamSR(_StreamCore):
    """B independent streams served in LOCKSTEP: push takes a (B, H, W, 3)
    stack (frame t of every stream), emissions are (index, (B, H', W', 3))
    pairs. One batched extract per arrival and one batched fuse per
    emission amortize the B=1 dispatch/fuse cost that bounds the single
    stream (results_r03/stream_bench_*: 74.7 ms/frame at B=1 vs ~40
    ms/window batched).

    params: one shared pytree, or params stacked on a leading group axis
    with `params_stacked=True` — (B,) per-stream by default, or (G,) with
    `n_groups=G` where consecutive blocks of B/G streams share a param
    set. With `adapter` built via make_streaming_adapter(batched=True),
    each group (default: each stream) adapts on the pooled first-K
    windows of its streams concurrently and serving continues
    group-adapted (params become stacked at warm-up).

    Why groups: distinct per-stream params cost real throughput (the
    round-4a vmapped design measured ~2.1x shared params; the current
    in-graph lax.map design still pays batch fragmentation — the fuse
    runs at inner batch B/g). When streams cluster by degradation
    (e.g. per-camera), `n_groups` serves each cluster at its full inner
    batch while still adapting clusters independently — and G=1 is
    exactly the shared fast path."""

    def __init__(self, model, params, n_streams: int, n_frames: int = 5,
                 padding: str = "reflection", params_stacked: bool = False,
                 adapter=None, adapt_windows: int = 0,
                 n_groups: int | None = None):
        super().__init__(model, params, n_streams, n_frames, padding,
                         adapter=adapter, adapt_windows=adapt_windows,
                         params_stacked=params_stacked, n_groups=n_groups)

    def push(self, frames) -> List[Tuple[int, Any]]:
        """Feed frame t of all B streams as one (B, H, W, 3) stack."""
        frames = jnp.asarray(frames)
        assert frames.shape[0] == self.b, (frames.shape, self.b)
        return self._push(frames)

    def flush(self) -> List[Tuple[int, Any]]:
        return self._flush()
