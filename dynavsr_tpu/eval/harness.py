"""Vid4/REDS4 evaluation harness — reference test scripts' core loop
(test_Vid4_REDS4_with_GT.py, SURVEY.md §2.5 [H]), batched TPU-style.

The reference slid a window per frame in Python, one forward per frame.
Here every frame's window is stacked with data/windows.all_windows and the
whole clip runs in chunked batched forwards — then uint8 rounding,
optional Y-channel conversion and border cropping reproduce the
reference's PSNR/SSIM definitions bit-for-bit (eval/metrics.py).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Callable, Dict, List, Optional

import numpy as np

from dynavsr_tpu.data.windows import all_windows
from dynavsr_tpu.eval.convert_img import save_img, tensor2img
from dynavsr_tpu.eval.metrics import calculate_psnr, calculate_ssim
from dynavsr_tpu.data.color import rgb2ycbcr

__all__ = ["evaluate_clip", "evaluate_dataset", "score_frames", "ClipResult"]


class ClipResult(dict):
    pass


def _metric_img(img_u8: np.ndarray, ycbcr: bool, crop: int) -> np.ndarray:
    out = img_u8.astype(np.float64)
    if ycbcr:
        out = rgb2ycbcr(out / 255.0, only_y=True) * 255.0
    if crop:
        out = out[crop:-crop, crop:-crop]
    return out


def evaluate_clip(
    infer_fn: Callable[[np.ndarray], np.ndarray],
    lq_frames: np.ndarray,
    gt_frames: Optional[np.ndarray],
    n_frames: int = 5,
    padding: str = "reflection",
    chunk: int = 8,
    ycbcr: bool = False,
    crop_border: int = 0,
    save_dir: Optional[str] = None,
    seq_fn: Optional[Callable] = None,
) -> ClipResult:
    """Run SR over one clip. infer_fn: (F, N, h, w, 3) -> (F, H, W, 3).

    seq_fn (optional): (frames (T, h, w, 3), win (F, N)) -> (F, H, W, 3)
    sequence-mode forward (per-frame pyramids shared across windows —
    VideoBaseModel.make_seq_infer_fn); when given, it replaces the window
    materialization + chunked infer_fn loop (exact, same outputs)."""
    t = lq_frames.shape[0]
    win = all_windows(t, n_frames, padding)
    if seq_fn is not None:
        sr = np.asarray(seq_fn(lq_frames, win))
    else:
        windows = lq_frames[win]  # (T, N, h, w, 3)
        outs: List[np.ndarray] = []
        for s in range(0, t, chunk):
            outs.append(np.asarray(infer_fn(windows[s : s + chunk])))
        sr = np.concatenate(outs, axis=0)
    return score_frames(sr, gt_frames, ycbcr, crop_border, save_dir)


def score_frames(
    sr: np.ndarray,
    gt_frames: Optional[np.ndarray],
    ycbcr: bool = False,
    crop_border: int = 0,
    save_dir: Optional[str] = None,
) -> ClipResult:
    """Score (and optionally save) precomputed SR frames against GT."""
    t = sr.shape[0]
    res = ClipResult(psnr=[], ssim=[], frames=t)
    for i in range(t):
        sr_u8 = tensor2img(sr[i])
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            save_img(sr_u8, osp.join(save_dir, f"{i:08d}.png"))
        if gt_frames is not None:
            gt_u8 = tensor2img(gt_frames[i])
            a = _metric_img(sr_u8, ycbcr, crop_border)
            b = _metric_img(gt_u8, ycbcr, crop_border)
            res["psnr"].append(calculate_psnr(a, b))
            res["ssim"].append(calculate_ssim(a, b))
    if gt_frames is not None:
        res["psnr_avg"] = float(np.mean(res["psnr"]))
        res["ssim_avg"] = float(np.mean(res["ssim"]))
    return res


def evaluate_dataset(
    infer_fn,
    test_set,
    n_frames: int = 5,
    padding: str = "reflection",
    chunk: int = 8,
    ycbcr: bool = False,
    crop_border: int = 0,
    save_root: Optional[str] = None,
    logger=None,
    seq_fn: Optional[Callable] = None,
) -> Dict[str, ClipResult]:
    """Per-clip eval over a VideoTestDataset; returns {clip: ClipResult}
    plus an '_avg' entry (reference per-clip + average logging [H]).
    seq_fn: optional sequence-mode clip forward (see evaluate_clip) —
    ignored on the center-only (Vimeo90K-T) protocol, where each sequence
    contributes exactly one window and there is nothing to share."""
    results: Dict[str, ClipResult] = {}
    if getattr(test_set, "center_only", False):
        # Vimeo90K-T protocol: one center window per sequence, batched.
        items = [test_set[i] for i in range(len(test_set))]
        windows = np.stack([it["LQs"] for it in items])
        srs = []
        for s in range(0, len(items), chunk):
            srs.append(np.asarray(infer_fn(windows[s : s + chunk])))
        sr = np.concatenate(srs, axis=0)
        for it, sr_i in zip(items, sr):
            gt_i = it.get("GT")
            res = score_frames(
                sr_i[None], None if gt_i is None else gt_i[None],
                ycbcr, crop_border,
                save_dir=osp.join(save_root, it["folder"]) if save_root else None,
            )
            results[it["folder"]] = res
            if logger and "psnr_avg" in res:
                logger.info("Seq %s: PSNR %.4f SSIM %.4f", it["folder"],
                            res["psnr_avg"], res["ssim_avg"])
        if any("psnr_avg" in r for r in results.values()):
            results["_avg"] = ClipResult(
                psnr_avg=float(np.mean([r["psnr_avg"] for r in results.values()])),
                ssim_avg=float(np.mean([r["ssim_avg"] for r in results.values()])),
            )
            if logger:
                logger.info("Average: PSNR %.4f dB SSIM %.4f",
                            results["_avg"]["psnr_avg"], results["_avg"]["ssim_avg"])
        return results
    for clip in test_set.names:
        lq = test_set.clip_frames(clip)
        gt = test_set.clip_frames(clip, gt=True) if test_set.gt_index else None
        res = evaluate_clip(
            infer_fn, lq, gt, n_frames, padding, chunk, ycbcr, crop_border,
            save_dir=osp.join(save_root, clip) if save_root else None,
            seq_fn=seq_fn,
        )
        results[clip] = res
        if logger and "psnr_avg" in res:
            logger.info(
                "Clip %s: PSNR %.4f dB SSIM %.4f (%d frames)",
                clip, res["psnr_avg"], res["ssim_avg"], res["frames"],
            )
    if any("psnr_avg" in r for r in results.values()):
        results["_avg"] = ClipResult(
            psnr_avg=float(np.mean([r["psnr_avg"] for r in results.values()])),
            ssim_avg=float(np.mean([r["ssim_avg"] for r in results.values()])),
        )
        if logger:
            logger.info(
                "Average: PSNR %.4f dB SSIM %.4f",
                results["_avg"]["psnr_avg"], results["_avg"]["ssim_avg"],
            )
    return results
