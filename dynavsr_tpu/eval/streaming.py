"""Streaming (online) SR serving — beyond-reference capability.

The reference only evaluates offline (whole clip on disk, one pass —
test_Vid4_REDS4_with_GT.py's per-frame loop, SURVEY.md §2.5). Production
serving often receives frames as a stream; EDVR's pyramid-split forward
(models/edvr.py extract_pyramid / fuse_pyramid) makes an O(1)-per-frame
streaming server natural: each arriving frame is feature-extracted ONCE,
its pyramid rides a short on-device ring buffer, and each emitted SR
frame costs exactly one window fuse (PCD+TSA+reconstruction).

Dispatch model (round-5 redesign): the steady-state push is ONE jitted
call — extract + ring write + window gather + fuse, fused into a single
executable with the ring state donated through it. The previous design
paid >=2 host dispatches per frame (extract; three jnp.stacks over
buffered pyramids; fuse), and on a tunnel with 10-25 ms per-dispatch
latency that was a plausible 25-50 of its 74.7 ms/frame B=1 steady
state (results_r03/stream_bench_*; round-4 verdict weak item 3). The
ring holds the last 2N arrival slots — a proof-tight bound: no padding
policy references an index more than 2N below the newest frame at its
emission time (circle's end case is the extremal one).

Measurement record (round 5): the fused step first LOOKED like a
regression — 94.4 ms/frame vs the old path's 74.7 — but those two
numbers came from different sessions, and single-stream streaming
latencies are NOT comparable across sessions on this tunnel (same
lesson as the DUF packed-trunk reversal, CLAUDE.md gotchas). The valid
in-session A/B (results_r05/stream_b1_r5_{olddesign_ab,prefix_ab,
fix_run*}.log, all legs minutes apart on one host): multi-dispatch
round-4 design 69.5-70.8 ms/frame, fused design 59.3-63.9 — the fused
push wins ~1.13x. Additionally staging the per-push `slot`/window-index
constants as cached device handles (_dev_const; steady state cycles
through only R patterns) and adding the batch axis host-side (_batch1)
measured NEUTRAL in-session (62.7/63.4 vs 59.5 pre-staging — within
pass variance), i.e. small host->device transfers do not cost a full
round-trip on this tunnel; both are kept anyway because they strictly
remove 2-3 per-push transfers at bounded cost, which matters on
higher-latency links.

Exactness contract: outputs are bit-identical to the offline harness
(eval/harness.evaluate_clip over data/windows.all_windows with the same
padding policy) — tests/test_streaming.py pins it. The price of exactness
is latency: frame i's window can reference frames up to i + 2*(N//2)
ahead (padding-dependent), so emission lags arrival by N//2 frames
(reflection/replicate) or up to 2*(N//2) (reflection_circle/new_info),
and the last windows drain in flush() when the clip length is known.

Adapt-then-serve (the DynaVSR product, online): pass `adapter` +
`adapt_windows=K`. The server buffers the stream until every frame the
first K sliding windows reference has arrived (K + N//2 frames for
reflection/replicate; up to 2*(N//2) past the K-th center for
reflection_circle/new_info/circle, whose start windows borrow ahead) —
those window tables are provably identical to the offline protocol's
first K rows, since data/windows.index_generation's start branches don't
depend on clip length. It then runs the k-step adaptation once and
streams with the adapted params. Streams shorter than the warm-up
adapt on min(K, T) windows at flush() — exactly the offline n_adapt
clamp. Build the adapter with make_streaming_adapter (MFDN pseudo-task
+ adapt scan, one jitted call). Warm-up frames buffer on the HOST (zero
device dispatches until adaptation), then replay through the fused step.

Throughput mode: MultiStreamSR serves B streams in LOCKSTEP (push takes
a (B, H, W, 3) stack, one fused step per arrival) — amortizing the B=1
fuse that costs the single stream ~1.9x vs batched serving
(results_r03/stream_bench_*). Streams may share params, carry per-stream
(adapted) params stacked on a leading axis, or — the middle of that
frontier — be partitioned into `n_groups` GROUPS that each share one
adapted param set (e.g. streams from the same camera). Grouped /
per-stream serving lax.map's the plain dense body over the g groups
rather than vmapping model.apply over params: the vmap lowers convs to
grouped/looped form (measured 108.3 ms/frame/stream fully per-stream at
B=4, and halving the distinct param sets recovered only ~8% —
results_r04/stream_adapt_multi.log, stream_groups_g2.log). With an
adapter, each group adapts ONCE on the pooled first-K windows of all
its streams.

Backbones without a pyramid split (TOF, DUF — SURVEY §2.1): use
WindowStreamSR, the generic window-buffer streamer built on the same
fused core. It rings the raw frames only and runs one full forward per
emission (no per-frame feature reuse exists to exploit for these nets);
the warm-up adaptation contract is identical (same make_streaming_adapter
with the arch's padded apply_fns from models/padding).

Typical use (optionally with test-time-adapted params):

    stream = StreamingSR(model, params, n_frames=5)
    for frame in source:                 # (H, W, 3) float32 [0,1]
        for i, sr in stream.push(frame): # zero or more ready SR frames
            sink(i, sr)
    for i, sr in stream.flush():
        sink(i, sr)
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynavsr_tpu.data.windows import index_generation

__all__ = ["StreamingSR", "MultiStreamSR", "WindowStreamSR",
           "make_streaming_adapter"]

# "No end-border in sight" sentinel clip length: windows computed with this
# max_n equal the true-T windows whenever center + N//2 <= T-1, which the
# emission rule guarantees (see _due).
_OPEN = 1 << 30


def _batch1(frame):
    """(H, W, 3) -> (1, H, W, 3) without extra RPCs: host frames get the
    batch axis BEFORE upload (`jnp.asarray(frame)[None]` would upload and
    then dispatch a device reshape); frames already on device keep the
    device-side reshape (fetching them back to host would be worse).
    Measured neutral in-session (module docstring) — kept as strict
    transfer-count hygiene."""
    if isinstance(frame, jax.Array):
        return frame[None]
    return jnp.asarray(np.asarray(frame)[None])


def make_streaming_adapter(vsr_model, cfg, est_apply, est_params,
                           apply_fn=None, mutable_apply_fn=None,
                           batched: bool = False):
    """Build the warm-up `adapter(params, windows) -> (adapted, losses)`
    for StreamingSR/MultiStreamSR/WindowStreamSR: the MFDN/SFDN
    pseudo-task (SLR = estimator(windows) -> LR center) followed by the
    k-step adaptation scan (adapt/adaptation.make_adapt_fn), all ONE
    jitted call.

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
    """Shared fused engine: B lockstep streams over one on-device ring.

    State is a pytree of rings — per-frame feature leaves of shape
    (R, B, ...) plus the raw-frame ring (R, B, h, w, 3), R = 2N arrival
    slots (slot = frame_index % R). The steady-state push is ONE jitted
    dispatch: extract the arriving frame's features, dynamic-update them
    into slot t % R, gather the due window's N slots, fuse — with the
    ring donated through the call so XLA updates it in place. Pushes
    that emit nothing (start-up) or several frames (catch-up right after
    an adaptation warm-up, and flush) decompose into one ingest dispatch
    plus one dispatch per extra emission — still one dispatch per unit
    of work, never per buffered tensor.

    Two feature modes, fixed at construction:
      * pyramid (window_apply=None): features = EDVR's 3-level per-frame
        pyramid; fuse = fuse_pyramid over the gathered (B, N, ...) window
        plus the raw center frame. O(1) extraction per frame.
      * window (window_apply given): no feature rings — only raw frames
        ring; "fuse" = window_apply(params, (B, N, h, w, 3)), one full
        forward per emission (TOF/DUF have no pyramid split to reuse).

    Param sharing is a GROUP count g: g=0 means one shared pytree and
    one full-batch body; g>0 means params carry a leading (g,) axis and
    each body lax.map's the plain batch-B/g computation over the g
    groups (consecutive streams) — g=B is the fully per-stream mode,
    0<g<B the grouped middle. Why lax.map and not vmap: vmapping
    model.apply over PARAMS lowers every conv to a grouped/looped conv
    (weights gain a batch axis), which measured 108.3 ms/frame/stream
    fully per-stream at B=4 and recovered only ~8% when halving the
    distinct param sets (results_r04/stream_adapt_multi.log,
    stream_groups_g2.log) — the lowering, not weight traffic, dominates.
    g == 1 is still NORMALIZED to g=0 (params squeezed, zero slicing)."""

    def __init__(self, model, params, n_streams: int, n_frames: int,
                 padding: str, adapter=None, adapt_windows: int = 0,
                 params_stacked: bool = False, n_groups: int | None = None,
                 window_apply: Optional[Callable] = None,
                 batched_adapter: bool = False):
        self.model = model
        self.b = int(n_streams)
        self.n = int(n_frames)
        self.pad = padding
        self.adapter = adapter
        self.k_adapt = int(adapt_windows)
        self._batched_adapter = batched_adapter
        if params_stacked and adapter is not None:
            # The batched adapter's body expects ONE param pytree; handing
            # it (G,)-stacked initials would fail deep inside model.apply
            # at warm-up time, and the stack would never be used per-group
            # anyway (warm-up replaces params wholesale). Fail loudly here.
            raise ValueError(
                "params_stacked and adapter are mutually exclusive: "
                "adaptation warm-up starts every group from the SAME "
                "initial params (pass the unstacked pytree)")
        self._params0 = params
        self._window_apply = window_apply
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
        # Ring depth: 2N arrival slots. Tight bound — a window emitted at
        # arrival count t references indices >= t - 2N for every padding
        # policy (the extremal case is circle's END branch at flush,
        # last + 1 - N, with emission lag <= 2*(N//2); equality holds
        # exactly at N odd). Slot j is overwritten by frame j + 2N, which
        # arrives only after every window referencing frame j emitted.
        self._R = 2 * self.n
        nn = self.n

        def _regroup(a, g):  # (B, ...) -> (g, B/g, ...), consecutive blocks
            return a.reshape((g, a.shape[0] // g) + a.shape[1:])

        def _flat(a):  # (g, B/g, ...) -> (B, ...)
            return a.reshape((-1,) + a.shape[2:])

        # ---- per-frame feature extraction (plain / grouped) -------------
        if window_apply is None:
            def ex(p, f):  # (B, h, w, 3) -> per-frame pyramid, each (B, ..)
                return model.apply(p, f, method="extract_pyramid")
        else:
            def ex(p, f):  # window mode: no reusable per-frame features
                return ()

        def ex_g(p, f):  # p leaves (g, ...); f (B, h, w, 3)
            g = jax.tree_util.tree_leaves(p)[0].shape[0]
            outs = jax.lax.map(lambda t: ex(t[0], t[1]), (p, _regroup(f, g)))
            return jax.tree_util.tree_map(_flat, outs)

        # ---- window fuse over gathered rings (plain / grouped) ----------
        def fu(p, feats_w, frames_w):
            # feats_w leaves (B, N, ...); frames_w (B, N, h, w, 3)
            if window_apply is not None:
                return window_apply(p, frames_w)
            l1, l2, l3 = feats_w
            return model.apply(p, l1, l2, l3, frames_w[:, nn // 2],
                               method="fuse_pyramid")

        def fu_g(p, feats_w, frames_w):
            g = jax.tree_util.tree_leaves(p)[0].shape[0]
            parts = (p,
                     jax.tree_util.tree_map(lambda a: _regroup(a, g), feats_w),
                     _regroup(frames_w, g))
            sr = jax.lax.map(lambda t: fu(*t), parts)
            return _flat(sr)

        # ---- fused ring bodies ------------------------------------------
        def _write(rings, feat, frame, slot):
            upd = lambda r, v: jax.lax.dynamic_update_index_in_dim(  # noqa: E731
                r, v, slot, 0)
            feats, frames = rings
            return (jax.tree_util.tree_map(upd, feats, feat),
                    upd(frames, frame))

        def _gather(rings, idx):
            feats, frames = rings
            feats_w = jax.tree_util.tree_map(
                lambda r: jnp.moveaxis(r[idx], 0, 1), feats)  # (B, N, ...)
            frames_w = jnp.moveaxis(frames[idx], 0, 1)
            return feats_w, frames_w

        def make_entry_points(ex_fn, fu_fn):
            def ingest(p, rings, frame, slot):
                return _write(rings, ex_fn(p, frame), frame, slot)

            def emit(p, rings, idx):
                return fu_fn(p, *_gather(rings, idx))

            def step(p, rings, frame, slot, idx):
                rings = _write(rings, ex_fn(p, frame), frame, slot)
                return rings, fu_fn(p, *_gather(rings, idx))

            # Donating the ring lets XLA update it in place; CPU (the test
            # backend) warns-and-copies on donation, so gate on backend.
            don = (1,) if jax.default_backend() == "tpu" else ()
            return (jax.jit(ingest, donate_argnums=don), jax.jit(emit),
                    jax.jit(step, donate_argnums=don))

        # Shape-polymorphic via jit retrace: one plain executable set when
        # g=0, one grouped (lax.map) set per (g, B/g) otherwise.
        self._ingest_j, self._emit_j, self._step_j = make_entry_points(ex, fu)
        self._ingest_g, self._emit_g, self._step_g = make_entry_points(
            ex_g, fu_g)
        self._ex, self._ex_g = ex, ex_g  # for ring-shape inference
        # Warm-up trigger: adaptation may start only once every frame the
        # first K windows REFERENCE has arrived. For reflection/replicate
        # that is k + N//2 frames, but reflection_circle/new_info/circle
        # start windows reach up to 2*(N//2) ahead of their center — with
        # the old fixed k + N//2 threshold the _warmup gather silently
        # CLAMPED the out-of-range indices and adapted on wrong window
        # contents (round-4 advisor finding).
        self._warm_need = (
            1 + max(self._needs(i) for i in range(self.k_adapt))
            if self.k_adapt > 0 else 0)
        # Device-staged push constants: slot scalars and window-index
        # vectors repeat with period R in steady state, so each is
        # uploaded once and its committed handle re-passed (measured
        # NEUTRAL on this tunnel — module docstring "Measurement
        # record" — kept as strict transfer-count hygiene). Keyed by
        # value, bounded; survives reset().
        self._dev_const: dict = {}
        self.reset()

    def _dev_slot(self, s: int):
        key = ("slot", int(s))
        v = self._dev_const.get(key)
        if v is None:
            if len(self._dev_const) > 1024:
                self._dev_const.clear()
            v = self._dev_const[key] = jax.device_put(np.int32(s))
        return v

    def _dev_idx(self, idx: np.ndarray):
        key = ("idx", idx.tobytes())
        v = self._dev_const.get(key)
        if v is None:
            if len(self._dev_const) > 1024:
                self._dev_const.clear()
            v = self._dev_const[key] = jax.device_put(idx)
        return v

    def reset(self) -> None:
        self.params = self._params0
        self._g = self._g0
        self._t = 0          # frames pushed so far
        self._next = 0       # next center index to emit
        self._rings = None   # lazy: shapes known at first arrival
        self._adapted = self.adapter is None or self.k_adapt <= 0
        self._raw: List[Any] = []  # warm-up frame buffer (B, h, w, 3) each

    # ------------------------------------------------------------- internal
    def _needs(self, i: int) -> int:
        """Largest frame index window i references, assuming no end border
        (valid exactly when that index has arrived)."""
        return max(index_generation(i, _OPEN, self.n, self.pad))

    def _ensure_rings(self, frame) -> None:
        if self._rings is not None:
            return
        ex = self._ex_g if self._g else self._ex
        feat_sd = jax.eval_shape(ex, self.params, frame)
        zero = lambda sd: jnp.zeros((self._R,) + sd.shape, sd.dtype)  # noqa: E731
        self._rings = (
            jax.tree_util.tree_map(zero, feat_sd),
            jnp.zeros((self._R,) + tuple(frame.shape), frame.dtype))

    def _ring_idx(self, center: int, max_n: int) -> np.ndarray:
        return np.asarray(
            [j % self._R
             for j in index_generation(center, max_n, self.n, self.pad)],
            dtype=np.int32)

    def _due(self, t: int) -> List[int]:
        """Centers whose open-rule windows become final once t frames have
        arrived. A window is final only if it cannot be an END window of
        the true clip: that needs the full right reach (center + n//2) to
        have ARRIVED, not merely its mirror — hence both conditions."""
        out = []
        c = self._next
        while c + self.n // 2 < t and self._needs(c) < t:
            out.append(c)
            c += 1
        return out

    def _ingest_emit(self, frames) -> List[Tuple[int, Any]]:
        """Process one arrival. Steady state (exactly one due emission) is
        the single fused dispatch; 0 or >1 due emissions decompose into
        ingest + per-emission fuse dispatches."""
        self._ensure_rings(frames)
        t_new = self._t + 1
        due = self._due(t_new)
        slot = self._dev_slot(self._t % self._R)
        step, ingest, emit = ((self._step_g, self._ingest_g, self._emit_g)
                              if self._g else
                              (self._step_j, self._ingest_j, self._emit_j))
        out = []
        if len(due) == 1:
            self._rings, sr = step(self.params, self._rings, frames, slot,
                                   self._dev_idx(self._ring_idx(due[0], _OPEN)))
            out.append((due[0], sr))
        else:
            self._rings = ingest(self.params, self._rings, frames, slot)
            for c in due:
                out.append((c, emit(self.params, self._rings,
                                    self._dev_idx(self._ring_idx(c, _OPEN)))))
        self._t = t_new
        self._next += len(due)
        return out

    def _warmup(self, k: int, max_n: int) -> List[Tuple[int, Any]]:
        """Run the adapter on the first k complete windows of the buffered
        frames, then replay the buffer through the fused step with the
        ADAPTED params (features must come from the net that serves
        them). Returns the emissions the replay produced."""
        frames = jnp.stack(self._raw)  # (t, B, h, w, 3)
        idx = jnp.asarray(
            [index_generation(i, max_n, self.n, self.pad) for i in range(k)])
        windows = frames[idx]  # (K, N, B, h, w, 3)
        windows = jnp.moveaxis(windows, 2, 0)  # (B, K, N, h, w, 3)
        if not self._batched_adapter:
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
        raw, self._raw = self._raw, []
        out = []
        for f in raw:
            out.extend(self._ingest_emit(f))
        return out

    # --------------------------------------------------------------- public
    def _push(self, frames) -> List[Tuple[int, Any]]:
        if not self._adapted:
            self._raw.append(frames)
            if len(self._raw) >= self._warm_need:
                # Every frame the first k_adapt open-rule windows reference
                # has arrived, so the windows are final AND equal the
                # offline protocol's rows (start branches of
                # index_generation are length-independent).
                return self._warmup(self.k_adapt, _OPEN)
            return []
        return self._ingest_emit(frames)

    def _flush(self) -> List[Tuple[int, Any]]:
        out = []
        if not self._adapted:
            # Stream ended inside the warm-up: adapt on min(K, T) windows
            # computed with the TRUE length (the offline n_adapt clamp).
            t = len(self._raw)
            if t == 0:
                self.reset()
                return []
            out.extend(self._warmup(min(self.k_adapt, t), t))
        t = self._t
        emit = self._emit_g if self._g else self._emit_j
        for i in range(self._next, t):
            out.append((i, emit(self.params, self._rings,
                                self._dev_idx(self._ring_idx(i, t)))))
        self.reset()
        return out


class StreamingSR(_StreamCore):
    """Online sliding-window SR over a frame stream (EDVR-family models
    exposing extract_pyramid/fuse_pyramid).

    Per-frame cost: ONE fused dispatch (pyramid extraction + ring write +
    window gather + fuse) in steady state — no recomputation of shared
    neighbors, no per-tensor host stacks. The on-device ring holds 2N
    arrival slots.

    With `adapter` (make_streaming_adapter) + `adapt_windows=K`: frames
    buffer on the host until the first K windows are complete, the k-step
    adaptation runs once, and the whole stream is then served with the
    adapted params (module docstring; exactness vs the offline adapted
    path is pinned by tests/test_streaming.py)."""

    def __init__(self, model, params, n_frames: int = 5,
                 padding: str = "reflection", adapter=None,
                 adapt_windows: int = 0):
        super().__init__(model, params, 1, n_frames, padding,
                         adapter=adapter, adapt_windows=adapt_windows)

    def push(self, frame) -> List[Tuple[int, Any]]:
        """Feed one (H, W, 3) frame; returns the SR frames whose windows
        became complete, as (frame_index, (H*scale, W*scale, 3)) pairs."""
        out = self._push(_batch1(frame))
        return [(i, sr[0]) for i, sr in out]

    def flush(self) -> List[Tuple[int, Any]]:
        """End of stream: emit the remaining tail windows using the true
        clip length (end-border padding), then reset."""
        return [(i, sr[0]) for i, sr in self._flush()]


class WindowStreamSR(_StreamCore):
    """Generic online streamer for backbones WITHOUT a pyramid split —
    TOF and DUF (SURVEY §2.1 rows; round-4 verdict item 5). Buffers the
    last 2N raw frames in an on-device ring; each emission is ONE fused
    dispatch running the full window forward (there is no per-frame
    feature reuse to exploit in these nets — TOF re-estimates flow per
    window, DUF's 3D convs consume the whole stack).

    apply_fn: (params, (B, N, h, w, 3)) -> (B, H', W', 3); defaults to
    model.apply. Pass models/padding.make_model_apply(model, which,
    scale) to get the arch's input conventions (TOF bicubic pre-upscale,
    pyramid mod-padding) inside the fused executable.

    The adapt-then-serve contract is identical to StreamingSR: build the
    adapter with make_streaming_adapter(..., apply_fn=...,
    mutable_apply_fn=...) so the warm-up adaptation uses the same padded
    forwards (and train-mode BN semantics for these BN nets)."""

    def __init__(self, model, params, n_frames: int = 7,
                 padding: str = "replicate", apply_fn=None, adapter=None,
                 adapt_windows: int = 0):
        super().__init__(
            model, params, 1, n_frames, padding, adapter=adapter,
            adapt_windows=adapt_windows,
            window_apply=apply_fn or (lambda p, x: model.apply(p, x)))

    def push(self, frame) -> List[Tuple[int, Any]]:
        out = self._push(_batch1(frame))
        return [(i, sr[0]) for i, sr in out]

    def flush(self) -> List[Tuple[int, Any]]:
        return [(i, sr[0]) for i, sr in self._flush()]


class MultiStreamSR(_StreamCore):
    """B independent streams served in LOCKSTEP: push takes a (B, H, W, 3)
    stack (frame t of every stream), emissions are (index, (B, H', W', 3))
    pairs. One fused batched step per arrival amortizes the B=1
    dispatch/fuse cost that bounds the single stream
    (results_r03/stream_bench_*: 74.7 ms/frame at B=1 vs ~40 ms/window
    batched, before the round-5 single-dispatch redesign).

    params: one shared pytree, or params stacked on a leading group axis
    with `params_stacked=True` — (B,) per-stream by default, or (G,) with
    `n_groups=G` where consecutive blocks of B/G streams share a param
    set. With `adapter` built via make_streaming_adapter(batched=True),
    each group (default: each stream) adapts on the pooled first-K
    windows of its streams concurrently and serving continues
    group-adapted (params become stacked at warm-up).

    Why groups: distinct per-stream params cost real throughput (the
    round-4a vmapped design measured ~2.1x shared params; the in-graph
    lax.map design still pays batch fragmentation — the fuse runs at
    inner batch B/g). When streams cluster by degradation
    (e.g. per-camera), `n_groups` serves each cluster at its full inner
    batch while still adapting clusters independently — and G=1 is
    exactly the shared fast path."""

    def __init__(self, model, params, n_streams: int, n_frames: int = 5,
                 padding: str = "reflection", params_stacked: bool = False,
                 adapter=None, adapt_windows: int = 0,
                 n_groups: int | None = None):
        super().__init__(model, params, n_streams, n_frames, padding,
                         adapter=adapter, adapt_windows=adapt_windows,
                         params_stacked=params_stacked, n_groups=n_groups,
                         batched_adapter=adapter is not None)

    def push(self, frames) -> List[Tuple[int, Any]]:
        """Feed frame t of all B streams as one (B, H, W, 3) stack."""
        frames = jnp.asarray(frames)
        assert frames.shape[0] == self.b, (frames.shape, self.b)
        return self._push(frames)

    def flush(self) -> List[Tuple[int, Any]]:
        return self._flush()
