"""ctypes bindings for the native IO runtime (native/dsio.cpp).

Provides PFM/PNG codecs and a multithreaded prefetching frame loader. Falls
back gracefully (raises ImportError from `load_library`) when the shared
library hasn't been built; `ensure_built()` compiles it with make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdsio.so"))

_lib: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> str:
    """Build libdsio.so if missing; returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        ensure_built()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dsio_read_pfm.restype = ctypes.c_int
    lib.dsio_read_pfm.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.dsio_write_pfm.restype = ctypes.c_int
    lib.dsio_write_pfm.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.dsio_read_png.restype = ctypes.c_int
    lib.dsio_read_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.dsio_write_png.restype = ctypes.c_int
    lib.dsio_write_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.dsio_free.argtypes = [ctypes.c_void_p]
    lib.dsio_loader_create.restype = ctypes.c_void_p
    lib.dsio_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.dsio_loader_next.restype = ctypes.c_int
    lib.dsio_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.dsio_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def read_pfm(path: str) -> np.ndarray:
    lib = load_library()
    data = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.dsio_read_pfm(path.encode(), ctypes.byref(data),
                           ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"dsio_read_pfm({path}) failed: {rc}")
    n = w.value * h.value * ch.value
    arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    lib.dsio_free(data)
    shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
    return arr.reshape(shape)


def write_pfm(path: str, img: np.ndarray) -> None:
    lib = load_library()
    img = np.ascontiguousarray(img, dtype=np.float32)
    ch = 1 if img.ndim == 2 else img.shape[2]
    rc = lib.dsio_write_pfm(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[1], img.shape[0], ch,
    )
    if rc != 0:
        raise IOError(f"dsio_write_pfm({path}) failed: {rc}")


def read_png(path: str) -> np.ndarray:
    """Returns uint16 array (H, W) or (H, W, C); 8-bit files widen to u16."""
    lib = load_library()
    data = ctypes.POINTER(ctypes.c_uint16)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.dsio_read_png(path.encode(), ctypes.byref(data), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(ch), ctypes.byref(depth))
    if rc != 0:
        raise IOError(f"dsio_read_png({path}) failed: {rc}")
    n = w.value * h.value * ch.value
    arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    lib.dsio_free(data)
    shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
    return arr.reshape(shape)


def write_png(path: str, img: np.ndarray, bitdepth: Optional[int] = None) -> None:
    lib = load_library()
    if bitdepth is None:
        bitdepth = 16 if img.dtype == np.uint16 else 8
    img = np.ascontiguousarray(img, dtype=np.uint16)
    ch = 1 if img.ndim == 2 else img.shape[2]
    rc = lib.dsio_write_png(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        img.shape[1], img.shape[0], ch, bitdepth,
    )
    if rc != 0:
        raise IOError(f"dsio_write_png({path}) failed: {rc}")


class PrefetchLoader:
    """Background-thread frame prefetcher over a list of image paths.

    Usage:
        with PrefetchLoader(paths, ahead=4) as ld:
            for frame in ld: ...   # frames are float32 np arrays
    """

    def __init__(self, paths: List[str], ahead: int = 4, threads: int = 2):
        self._lib = load_library()
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = self._lib.dsio_loader_create(arr, len(paths), ahead, threads)
        self._n = len(paths)

    def __iter__(self):
        while True:
            frame = self.next()
            if frame is None:
                return
            yield frame

    def next(self) -> Optional[np.ndarray]:
        data = ctypes.POINTER(ctypes.c_float)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ch = ctypes.c_int()
        rc = self._lib.dsio_loader_next(
            self._handle, ctypes.byref(data), ctypes.byref(w),
            ctypes.byref(h), ctypes.byref(ch),
        )
        if rc == 1:
            return None
        if rc != 0:
            raise IOError(f"prefetch decode failed: {rc}")
        n = w.value * h.value * ch.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
        shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
        return arr.reshape(shape)

    def close(self) -> None:
        if self._handle:
            self._lib.dsio_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
