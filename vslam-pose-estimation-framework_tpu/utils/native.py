"""ctypes bindings for the native runtime library (native/src/vslam_native.cpp).

Builds lazily via make on first use; all callers degrade gracefully to pure
Python/cv2 paths when the toolchain or library is unavailable (the compute
path never depends on this — it accelerates host-side IO and bookkeeping).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libvslam_native.so")

_lib = None
_lib_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vn_decode_image.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int64, i32p, i32p, i32p,
    ]
    lib.vn_decode_image.restype = ctypes.c_int
    lib.vn_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vn_prefetcher_create.restype = ctypes.c_void_p
    lib.vn_prefetcher_next.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_int64, i32p, i32p, i32p,
    ]
    lib.vn_prefetcher_next.restype = ctypes.c_int
    lib.vn_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.vn_union_find.argtypes = [i32p, ctypes.c_int, i32p, ctypes.c_int]
    lib.vn_union_find.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


_MAX_IMG_BYTES = 4096 * 4096 * 2


def decode_image(path: str) -> Optional[np.ndarray]:
    """Decode PNG/PGM to (H, W) uint8 or uint16; None if unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(_MAX_IMG_BYTES, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    bpp = ctypes.c_int32()
    rc = lib.vn_decode_image(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.nbytes,
        ctypes.byref(h),
        ctypes.byref(w),
        ctypes.byref(bpp),
    )
    if rc != 0:
        return None
    n = h.value * w.value * bpp.value
    out = buf[:n].copy()
    if bpp.value == 2:
        return out.view(np.uint16).reshape(h.value, w.value)
    return out.reshape(h.value, w.value)


class Prefetcher:
    """In-order threaded decode-ahead over a file list."""

    def __init__(self, paths: list[str], n_threads: int = 2, look_ahead: int = 8):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._encoded = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._encoded))(*self._encoded)
        self._handle = lib.vn_prefetcher_create(arr, len(self._encoded), n_threads, look_ahead)
        self._n = len(paths)
        self._delivered = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._delivered >= self._n:
            raise StopIteration
        buf = np.empty(_MAX_IMG_BYTES, np.uint8)
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        bpp = ctypes.c_int32()
        rc = self._lib.vn_prefetcher_next(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.nbytes,
            ctypes.byref(h),
            ctypes.byref(w),
            ctypes.byref(bpp),
        )
        self._delivered += 1
        if rc == -3:
            raise StopIteration
        if rc != 0:
            raise IOError(f"prefetcher decode failed (rc={rc})")
        n = h.value * w.value * bpp.value
        out = buf[:n].copy()
        if bpp.value == 2:
            return out.view(np.uint16).reshape(h.value, w.value)
        return out.reshape(h.value, w.value)

    def close(self):
        if self._handle:
            self._lib.vn_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def union_find(pairs: np.ndarray) -> dict[int, int]:
    """Native union-find over (N, 2) int32 merge pairs; falls back to the
    Python implementation in mapping.merging when unavailable."""
    lib = get_lib()
    pairs = np.ascontiguousarray(pairs, np.int32)
    if lib is None:
        from vslam_tpu.mapping.merging import UnionFind

        uf = UnionFind()
        for a, b in pairs:
            if a >= 0 and b >= 0 and a != b:
                uf.union(int(a), int(b))
        return {x: uf.find(x) for x in list(uf.parent) if uf.find(x) != x}
    max_out = 2 * len(pairs) + 16
    out = np.empty(2 * max_out, np.int32)
    k = lib.vn_union_find(
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(pairs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_out,
    )
    if k < 0:
        raise RuntimeError("union_find output overflow")
    return {int(out[2 * i]): int(out[2 * i + 1]) for i in range(k)}
