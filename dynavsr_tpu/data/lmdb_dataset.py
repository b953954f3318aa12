"""LMDB-backed clip index for training datasets (reference
data/REDS_dataset.py LMDB mode + data/util.py:_read_img_lmdb [H]).

Reference LMDB layout: key '<clip>_<frame:08d>' -> encoded (or raw) image
bytes; a '<key>.meta' entry (ours) or meta_info.pkl (reference) records
resolutions. Our create_lmdb script stores PNG-encoded frames, decoded
with cv2 on read — same as the reference's cv2.imdecode path.
"""

from __future__ import annotations

from typing import Dict, List

import cv2
import numpy as np

from dynavsr_tpu.data.lmdb_native import LmdbReader

__all__ = ["LmdbClipIndex"]


class LmdbClipIndex:
    """Maps clip -> frame keys; read_frame decodes to float32 RGB [0,1]."""

    def __init__(self, path: str):
        self.reader = LmdbReader(path)
        self.clips: Dict[str, List[bytes]] = {}
        for key in self.reader.keys():
            name = key.decode()
            if name.endswith(".meta"):
                continue
            clip, _, _frame = name.rpartition("_")
            self.clips.setdefault(clip, []).append(key)
        for frames in self.clips.values():
            frames.sort()
        self.names = sorted(self.clips)

    def read_frame(self, key: bytes) -> np.ndarray:
        buf = self.reader.get(key)
        if buf is None:
            raise KeyError(key)
        img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
        if img is None:  # raw bytes fallback: '<h>x<w>x<c>' in the meta entry
            meta = self.reader.get(key + b".meta")
            if meta is None:
                raise ValueError(f"undecodable entry {key!r} without .meta")
            h, w, c = (int(x) for x in meta.decode().split("x"))
            img = np.frombuffer(buf, np.uint8).reshape(h, w, c)
        if img.ndim == 2:
            img = img[:, :, None].repeat(3, axis=2)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img.astype(np.float32) / 255.0
