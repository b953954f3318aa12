"""Build an LMDB from a clip-folder tree — reference data_scripts/create_lmdb*
(SURVEY.md §2.4 [M]), backed by the native C++ writer (native/lmdbr).

    python data_scripts/create_lmdb.py --input ~/datasets/REDS/train_sharp \
        --output ~/datasets/REDS/train_sharp_wval.lmdb

Keys follow the reference convention '<clip>_<frame:08d>'; values are the
original encoded bytes (PNG/JPG passthrough — no re-encode).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dynavsr_tpu.data.io import glob_clip_folders  # noqa: E402
from dynavsr_tpu.data.lmdb_native import LmdbWriter  # noqa: E402
from dynavsr_tpu.utils import ProgressBar  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="clip-folder tree root")
    ap.add_argument("--output", required=True, help="output .lmdb path")
    args = ap.parse_args(argv)

    clips = glob_clip_folders(args.input)
    total = sum(len(v) for v in clips.values())
    print(f"{len(clips)} clips, {total} frames -> {args.output}")
    bar = ProgressBar(total)
    with LmdbWriter(args.output) as w:
        for clip, frames in clips.items():
            for i, path in enumerate(frames):
                with open(path, "rb") as f:
                    w.put(f"{clip}_{i:08d}".encode(), f.read())
                bar.update(f"{clip}/{i}")
    print("\ndone.")


if __name__ == "__main__":
    main()
