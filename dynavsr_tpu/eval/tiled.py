"""Tiled (chopped) inference — fixed-HBM serving for arbitrarily large
frames, beyond-reference capability (the reference evaluates Vid4/REDS4
whole-frame; SURVEY.md §2.5 lists no chop path).

Frames are cut into overlapping spatial tiles, every tile runs through the
SAME batched forward, and the outputs are reassembled from each tile's
"safe core" (pixels >= `overlap` from any interior tile edge). With
overlap >= the network's receptive-field radius the result is bit-exact vs
the whole-frame forward (tested); the win is memory: activation footprint
scales with tile size, not frame size — 4K x4 VSR fits a 16 GB chip, and
the tile batch rides the SAME ('data',) mesh sharding as any other window
batch (the wrapped apply pads/shards it — models/video_base_model.py
make_infer_fn), so tiles ARE the spatial-parallelism axis.

TPU notes: tile starts/core bounds are static Python ints (one compiled
executable per frame shape, like every other path here); extraction is
static slices + one stack; reassembly is static-slice concatenation —
no gathers, no dynamic shapes.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

__all__ = ["tile_plan", "make_tiled_apply"]


def tile_plan(d: int, t: int, ov: int) -> Tuple[Sequence[int], Sequence[Tuple[int, int]]]:
    """1-D chop plan: tile starts + per-tile core bounds (tile coords).

    Tiles of size `t` step by t - 2*ov (the last start clamps to d - t so
    the frame is always covered). The core of tile k spans
    [b_k, b_{k+1}) in frame coords with b_k = start_k + ov (b_0 = 0,
    b_n = d): cores are contiguous and disjoint by construction, and every
    core pixel sits >= ov from any interior tile edge."""
    if t >= d:
        return [0], [(0, d)]
    if ov < 0 or 2 * ov >= t:
        raise ValueError(f"need 0 <= 2*overlap < tile, got tile={t} overlap={ov}")
    step = t - 2 * ov
    starts = list(range(0, d - t + 1, step))
    if starts[-1] != d - t:
        starts.append(d - t)
    bounds = [0] + [s + ov for s in starts[1:]] + [d]
    cores = [(bounds[k] - s, bounds[k + 1] - s) for k, s in enumerate(starts)]
    return starts, cores


def make_tiled_apply(
    apply: Callable,
    tile: Tuple[int, int],
    overlap: int,
    scale: int,
) -> Callable:
    """Wrap apply(params, windows (F, N, h, w, 3) -> (F, h*scale, w*scale, 3))
    so frames larger than `tile` run as overlapping tiles.

    Transparent when h <= tile_h and w <= tile_w (single-tile passthrough —
    the adaptation pseudo-task's small SLR windows take this path when the
    wrapper is installed on a shared apply). All tiles run in ONE batched
    call of shape (n_tiles * F, N, th, tw, 3) — chunk via the surrounding
    machinery (adapt.infer_chunk / harness chunk) if that spills."""
    th_cfg, tw_cfg = int(tile[0]), int(tile[1])
    ov = int(overlap)

    def tiled(params, x):
        f, h, w = x.shape[0], x.shape[-3], x.shape[-2]
        th, tw = min(th_cfg, h), min(tw_cfg, w)
        hs, hcores = tile_plan(h, th, ov)
        ws, wcores = tile_plan(w, tw, ov)
        if len(hs) == 1 and len(ws) == 1:
            return apply(params, x)
        tiles = jnp.stack(
            [x[..., i : i + th, j : j + tw, :] for i in hs for j in ws], 0)
        flat = tiles.reshape((len(hs) * len(ws) * f,) + tiles.shape[2:])
        sr = apply(params, flat)  # (nt*F, th*s, tw*s, 3)
        sr = sr.reshape((len(hs), len(ws), f) + sr.shape[1:])
        rows = []
        for i, (ha, hb) in enumerate(hcores):
            row = [
                sr[i, j, :, ha * scale : hb * scale, wa * scale : wb * scale, :]
                for j, (wa, wb) in enumerate(wcores)
            ]
            rows.append(row[0] if len(row) == 1 else jnp.concatenate(row, axis=-2))
        return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=-3)

    return tiled
