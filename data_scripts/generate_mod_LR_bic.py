"""Generate mod-cropped GT + MATLAB-bicubic LR frames — reference
data_scripts/generate_mod_LR_bic.py (SURVEY.md §2.4 [M]).

    python data_scripts/generate_mod_LR_bic.py --input <GT tree> \
        --output <out root> --scale 4

Writes <out>/GT (mod-cropped) and <out>/LRx<scale> (our imresize_np is
golden-tested against the MATLAB kernel — data/resize.py).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dynavsr_tpu.data.io import glob_clip_folders  # noqa: E402
from dynavsr_tpu.data.resize import imresize_np  # noqa: E402
from dynavsr_tpu.utils import ProgressBar  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--mode", choices=["bicubic", "duf"], default="bicubic",
                    help="'duf': 13-tap Gaussian blur + stride subsample "
                         "(data/util.py:duf_downsample parity) for DUF eval")
    args = ap.parse_args(argv)

    s = args.scale
    if args.mode == "duf":
        import jax.numpy as jnp

        from dynavsr_tpu.data.degradations import duf_downsample
    clips = glob_clip_folders(args.input)
    total = sum(len(v) for v in clips.values())
    bar = ProgressBar(total)
    for clip, frames in clips.items():
        gt_dir = osp.join(args.output, "GT", clip)
        lr_dir = osp.join(args.output, f"LRx{s}", clip)
        os.makedirs(gt_dir, exist_ok=True)
        os.makedirs(lr_dir, exist_ok=True)
        for path in frames:
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0
            h, w = img.shape[:2]
            img = img[: h - h % s, : w - w % s]  # mod-crop
            if args.mode == "duf":
                lr = np.asarray(duf_downsample(jnp.asarray(img)[None], s)[0])
            else:
                lr = imresize_np(img, 1.0 / s)
            name = osp.basename(path)
            cv2.imwrite(osp.join(gt_dir, name),
                        (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8))
            cv2.imwrite(osp.join(lr_dir, name),
                        (np.clip(lr, 0, 1) * 255.0).round().astype(np.uint8))
            bar.update(f"{clip}/{name}")
    print("\ndone.")


if __name__ == "__main__":
    main()
