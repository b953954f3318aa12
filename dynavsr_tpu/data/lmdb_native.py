"""ctypes binding for the native LMDB reader/writer (native/lmdbr).

Replaces the `lmdb` python package (absent in this environment) for the
reference's LMDB-backed datasets (data/util.py:_read_img_lmdb [H]). The
shared library is built on first use with `make` (g++, ~1 s) and cached
next to the source.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Iterator, List, Optional, Tuple

__all__ = ["LmdbReader", "LmdbWriter", "build_native"]

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                       "native", "lmdbr")
_LIB: Optional[ctypes.CDLL] = None


def build_native() -> str:
    so = osp.join(_NATIVE_DIR, "liblmdbr.so")
    src = osp.join(_NATIVE_DIR, "lmdbr.cpp")
    if not osp.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return so


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_native())
        lib.lmdbr_open.restype = ctypes.c_void_p
        lib.lmdbr_open.argtypes = [ctypes.c_char_p]
        lib.lmdbr_close.argtypes = [ctypes.c_void_p]
        lib.lmdbr_entries.restype = ctypes.c_uint64
        lib.lmdbr_entries.argtypes = [ctypes.c_void_p]
        lib.lmdbr_get.restype = ctypes.c_int
        lib.lmdbr_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.lmdbr_cursor_open.restype = ctypes.c_void_p
        lib.lmdbr_cursor_open.argtypes = [ctypes.c_void_p]
        lib.lmdbr_cursor_next.restype = ctypes.c_int
        lib.lmdbr_cursor_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.lmdbr_cursor_close.argtypes = [ctypes.c_void_p]
        lib.lmdbw_open.restype = ctypes.c_void_p
        lib.lmdbw_open.argtypes = [ctypes.c_char_p]
        lib.lmdbw_put.restype = ctypes.c_int
        lib.lmdbw_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.lmdbw_close.restype = ctypes.c_int
        lib.lmdbw_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def _datafile(path: str) -> str:
    return osp.join(path, "data.mdb") if osp.isdir(path) else path


class LmdbReader:
    """Read-only view of an LMDB file; get() copies out of the mapping."""

    def __init__(self, path: str):
        self._h = _lib().lmdbr_open(_datafile(path).encode())
        if not self._h:
            raise FileNotFoundError(f"cannot open LMDB at {path}")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self) -> None:
        if self._h:
            _lib().lmdbr_close(self._h)
            self._h = None

    def __len__(self) -> int:
        return int(_lib().lmdbr_entries(self._h))

    def get(self, key: bytes) -> Optional[bytes]:
        val = ctypes.c_void_p()
        vlen = ctypes.c_size_t()
        rc = _lib().lmdbr_get(self._h, key, len(key),
                              ctypes.byref(val), ctypes.byref(vlen))
        if rc != 0:
            return None
        return ctypes.string_at(val.value, vlen.value)

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        lib = _lib()
        cur = lib.lmdbr_cursor_open(self._h)
        try:
            k = ctypes.c_void_p(); kl = ctypes.c_size_t()
            v = ctypes.c_void_p(); vl = ctypes.c_size_t()
            while lib.lmdbr_cursor_next(cur, ctypes.byref(k), ctypes.byref(kl),
                                        ctypes.byref(v), ctypes.byref(vl)) == 0:
                yield (ctypes.string_at(k.value, kl.value),
                       ctypes.string_at(v.value, vl.value))
        finally:
            lib.lmdbr_cursor_close(cur)

    def keys(self) -> List[bytes]:
        return [k for k, _ in self.items()]


class LmdbWriter:
    """Bulk writer: collect puts, build the B+tree on close."""

    def __init__(self, path: str):
        if osp.isdir(path) or path.endswith(".lmdb"):
            os.makedirs(path, exist_ok=True)
            path = osp.join(path, "data.mdb")
        self._h = _lib().lmdbw_open(path.encode())

    def put(self, key: bytes, value: bytes) -> None:
        rc = _lib().lmdbw_put(self._h, key, len(key), value, len(value))
        if rc != 0:
            raise ValueError(
                f"LMDB key too large for one leaf node ({len(key)} bytes)"
            )

    def close(self) -> None:
        if self._h:
            rc = _lib().lmdbw_close(self._h)
            self._h = None
            if rc != 0:
                raise IOError("lmdb write failed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
