"""Frame IO — reference data/util.py read paths (SURVEY.md §2.4 [H]).

Reference contract: `get_image_paths` enumerates an image folder or an LMDB
(data_type 'img' | 'lmdb'); `read_img` returns float32 RGB in [0, 1]
(the reference used cv2 BGR — we standardize on RGB in memory and convert
at the metric/PNG boundary, see eval/convert_img.py). The LMDB path is
served by the native C++ reader (native/lmdbr) since the `lmdb` python
package is not available in this environment.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List

import cv2
import numpy as np

__all__ = [
    "read_img",
    "read_img_seq",
    "get_image_paths",
    "glob_clip_folders",
]

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif")


def read_img(path: str) -> np.ndarray:
    """Read one image -> float32 RGB HWC in [0, 1] (reference read_img [H],
    but RGB not BGR — see module docstring)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def read_img_seq(paths: List[str]) -> np.ndarray:
    """Stack a clip's frames -> (T, H, W, 3) float32 RGB."""
    return np.stack([read_img(p) for p in paths], axis=0)


def get_image_paths(data_type: str, dataroot: str) -> List[str]:
    """Sorted frame paths under a folder tree ('img') or LMDB keys ('lmdb')."""
    if data_type == "img":
        paths = []
        for root, _dirs, files in os.walk(dataroot):
            for f in files:
                if f.lower().endswith(_IMG_EXTS):
                    paths.append(osp.join(root, f))
        return sorted(paths)
    if data_type == "lmdb":
        from dynavsr_tpu.data.lmdb_native import LmdbReader

        with LmdbReader(dataroot) as r:
            return sorted(k.decode() for k in r.keys() if not k.endswith(b".meta"))
    raise ValueError(f"unknown data_type {data_type!r}")


def glob_clip_folders(dataroot: str) -> Dict[str, List[str]]:
    """Map clip name -> sorted frame paths; a clip is ANY directory under
    dataroot that directly contains image files. Handles both the flat
    Vid4/REDS4 layout (clip = immediate subdirectory) and the nested
    Vimeo90K septuplet tree (sequences/00001/0266/im{1..7}.png — reference
    data/Vimeo90K_dataset.py [H]); nested clips are keyed by their
    dataroot-relative path with '_' separators ('00001_0266', matching the
    reference's LMDB key convention)."""
    clips: Dict[str, List[str]] = {}
    root_frames: List[str] = []
    for root, dirs, files in os.walk(dataroot):
        dirs.sort()
        frames = sorted(
            osp.join(root, f) for f in files if f.lower().endswith(_IMG_EXTS)
        )
        if not frames:
            continue
        rel = osp.relpath(root, dataroot)
        if rel == ".":
            root_frames = frames
            continue
        clips[rel.replace(os.sep, "_")] = frames
    if root_frames and not clips:
        # A dataroot that directly contains frames (and no clip subdirs) is
        # ONE clip. Its key must be root-independent ('clip', not the
        # dataroot basename) so paired GT/LQ roots with different basenames
        # index the same clip name; when subdirectory clips exist, they win
        # (mixed layouts are ambiguous and the root frames are ignored).
        clips["clip"] = root_frames
    return dict(sorted(clips.items()))
