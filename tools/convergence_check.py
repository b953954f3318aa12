"""Training-convergence proof: train a small EDVR on synthetic data and
verify (a) the loss descends and (b) val PSNR beats bicubic upsampling.

Not a unit test (runs minutes on TPU): `python tools/convergence_check.py
[--iters 300]`. Exercises the REAL stack — datasets -> loader -> sharded
train step -> eval harness — the closest thing to the reference's
"validation catches divergence" oracle (SURVEY.md §4) without REDS data.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_data(root: str, n_clips: int = 6, frames: int = 12, gh: int = 96, gw: int = 96):
    import cv2

    rng = np.random.default_rng(0)
    for c in range(n_clips):
        os.makedirs(f"{root}/GT/{c:03d}", exist_ok=True)
        os.makedirs(f"{root}/LQ/{c:03d}", exist_ok=True)
        base = rng.random((gh // 8, gw // 8, 3)).astype(np.float32)
        for i in range(frames):
            shifted = np.roll(base, i, axis=1)
            gt = cv2.resize(shifted, (gw, gh), interpolation=cv2.INTER_CUBIC)
            gt = np.clip(gt, 0, 1)
            lr = cv2.resize(gt, (gw // 4, gh // 4), interpolation=cv2.INTER_AREA)
            cv2.imwrite(f"{root}/GT/{c:03d}/{i:08d}.png",
                        (gt * 255).round().astype(np.uint8))
            cv2.imwrite(f"{root}/LQ/{c:03d}/{i:08d}.png",
                        (lr * 255).round().astype(np.uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--nf", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.data.loader import create_dataloader, create_dataset
    from dynavsr_tpu.data.resize import imresize_batched
    from dynavsr_tpu.eval.harness import evaluate_dataset
    from dynavsr_tpu.models.video_base_model import VideoBaseModel

    root = tempfile.mkdtemp(prefix="conv_check_")
    make_data(root)

    opt = {
        "is_train": True, "scale": 4, "n_devices": 1, "model": "video_base",
        "datasets": {
            "train": {
                "phase": "train", "mode": "REDS", "scale": 4,
                "dataroot_GT": f"{root}/GT", "dataroot_LQ": f"{root}/LQ",
                "N_frames": 5, "LQ_size": 16, "batch_size": 8, "n_workers": 2,
            },
            "val": {
                "phase": "val", "mode": "video_test", "scale": 4,
                "dataroot_GT": f"{root}/GT", "dataroot_LQ": f"{root}/LQ",
                "N_frames": 5, "padding": "reflection",
            },
        },
        "network_G": {
            "which_model_G": "EDVR", "nf": args.nf, "nframes": 5, "groups": 8,
            "front_RBs": 2, "back_RBs": 3, "dtype": "bf16",
        },
        "path": {},
        "train": {"lr_G": 2e-4, "lr_scheme": "constant", "manual_seed": 0},
    }
    model = VideoBaseModel(opt)
    train_set = create_dataset(opt["datasets"]["train"])
    loader = create_dataloader(train_set, opt["datasets"]["train"], opt)
    val_set = create_dataset(opt["datasets"]["val"])

    # bicubic reference PSNR
    def bicubic_infer(w):
        c = w[:, w.shape[1] // 2]
        return imresize_batched(jnp.asarray(c), 4.0)

    bic = evaluate_dataset(bicubic_infer, val_set, n_frames=5)["_avg"]["psnr_avg"]
    print(f"bicubic val PSNR: {bic:.3f} dB", flush=True)

    losses = []
    step = 0
    import time
    t0 = time.time()
    while step < args.iters:
        loader.set_epoch(step)
        for batch in loader:
            if step >= args.iters:
                break
            model.feed_data(batch)
            model.optimize_parameters(step)
            step += 1
            if step % 50 == 0 or step == 1:
                losses.append(model.get_current_log()["l_pix"])
                print(f"iter {step}: l_pix {losses[-1]:.5f} "
                      f"({(time.time()-t0)/step*1000:.0f} ms/it avg)", flush=True)

    res = evaluate_dataset(model.make_infer_fn(), val_set, n_frames=5)
    psnr = res["_avg"]["psnr_avg"]
    print(f"trained val PSNR: {psnr:.3f} dB (bicubic {bic:.3f})", flush=True)
    ok_loss = losses[-1] < losses[0] * 0.7
    ok_psnr = psnr > bic
    print(f"loss descended: {ok_loss} ({losses[0]:.4f} -> {losses[-1]:.4f}); "
          f"beats bicubic: {ok_psnr}", flush=True)
    sys.exit(0 if (ok_loss and ok_psnr) else 1)


if __name__ == "__main__":
    main()
