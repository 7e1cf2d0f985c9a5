"""ctypes loader for the native host-side helpers (fasthist.cpp).

Compiled lazily with g++ on first use; every entry point has a pure
numpy/scipy fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fasthist.cpp")
_LIB_PATH = os.path.join(_HERE, "libfasthist.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _LIB_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fast_hist_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64)]
            lib.tile_class_centroids_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.remap_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def fast_hist(pred: np.ndarray, gt: np.ndarray, num_classes: int
              ) -> np.ndarray:
    """Native confusion matrix; numpy fallback."""
    lib = _load()
    pred = np.ascontiguousarray(pred.reshape(-1), np.int32)
    gt = np.ascontiguousarray(gt.reshape(-1), np.int32)
    if lib is None:
        from tpuseg.evaluation.metrics import fast_hist as np_hist

        return np_hist(pred, gt, num_classes)
    out = np.zeros(num_classes * num_classes, np.int64)
    lib.fast_hist_i32(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pred.size, num_classes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out.reshape(num_classes, num_classes)


def tile_class_centroids(mask: np.ndarray, tile: int, num_classes: int):
    """-> dict class_id -> list of (cx, cy) per tile where present.

    Native single pass; scipy fallback matches
    tpuseg.data.uniform.class_centroids_image's inner loop.
    """
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    tiles_y, tiles_x = h // tile, w // tile
    lib = _load()
    if lib is None:
        from scipy.ndimage import center_of_mass

        out: dict = {}
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                patch = mask[ty * tile:(ty + 1) * tile,
                             tx * tile:(tx + 1) * tile]
                for c in np.unique(patch):
                    if c >= num_classes:
                        continue
                    cy, cx = center_of_mass((patch == c).astype(np.int32))
                    out.setdefault(int(c), []).append(
                        (int(cx) + tx * tile, int(cy) + ty * tile))
        return out

    n = tiles_y * tiles_x * num_classes
    counts = np.zeros(n, np.int64)
    sum_y = np.zeros(n, np.int64)
    sum_x = np.zeros(n, np.int64)
    lib.tile_class_centroids_u8(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, tile, num_classes,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sum_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sum_x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    out = {}
    counts = counts.reshape(tiles_y, tiles_x, num_classes)
    sum_y = sum_y.reshape(tiles_y, tiles_x, num_classes)
    sum_x = sum_x.reshape(tiles_y, tiles_x, num_classes)
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            for c in np.nonzero(counts[ty, tx])[0]:
                cnt = counts[ty, tx, c]
                out.setdefault(int(c), []).append(
                    (int(sum_x[ty, tx, c] // cnt),
                     int(sum_y[ty, tx, c] // cnt)))
    return out


def remap(mask: np.ndarray, table: np.ndarray) -> np.ndarray:
    """uint8 LUT remap; numpy fallback."""
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    table = np.ascontiguousarray(table, np.uint8)
    if lib is None:
        return table[mask]
    dst = np.empty_like(mask)
    lib.remap_u8(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.size,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dst
