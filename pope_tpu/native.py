"""ctypes bindings for the native host runtime (native/pope_native.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, so the binding is plain ctypes). Every entry point has a numpy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpope_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libpope_native.so"],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        i64, i32, f32, ptr = ctypes.c_int64, ctypes.c_int32, ctypes.c_float, ctypes.c_void_p
        lib.rle_encode.restype = i64
        lib.rle_encode.argtypes = [ptr, i64, i64, ptr]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [ptr, i64, i64, i64, ptr]
        lib.connected_components.restype = i64
        lib.connected_components.argtypes = [ptr, i64, i64, ctypes.c_uint8, ptr, ptr]
        lib.remove_small_regions.restype = i32
        lib.remove_small_regions.argtypes = [ptr, i64, i64, i64, i32]
        lib.nms_cpu.restype = None
        lib.nms_cpu.argtypes = [ptr, ptr, i64, f32, ptr]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def rle_encode(mask: np.ndarray) -> dict:
    """Binary (H, W) -> reference RLE dict (amg.py format)."""
    lib = _load()
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    if lib is None:
        from pope_tpu.ops.masks import mask_to_rle

        return mask_to_rle(mask)
    counts = np.empty(h * w + 1, np.int64)
    n = lib.rle_encode(
        m.ctypes.data_as(ctypes.c_void_p), h, w, counts.ctypes.data_as(ctypes.c_void_p)
    )
    return {"size": [h, w], "counts": counts[:n].tolist()}


def rle_decode(rle: dict) -> np.ndarray:
    lib = _load()
    if lib is None:
        from pope_tpu.ops.masks import rle_to_mask

        return rle_to_mask(rle)
    h, w = rle["size"]
    counts = np.ascontiguousarray(rle["counts"], np.int64)
    out = np.empty((h, w), np.uint8)
    lib.rle_decode(
        counts.ctypes.data_as(ctypes.c_void_p), len(counts), h, w,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out.astype(bool)


def remove_small_regions(mask: np.ndarray, area_thresh: int, mode: str) -> Tuple[np.ndarray, bool]:
    """Fill small holes (mode='holes') or drop small islands
    (mode='islands'); amg.py:342-372 semantics. Returns (mask, changed)."""
    lib = _load()
    m = np.ascontiguousarray(mask, np.uint8).copy()
    h, w = m.shape
    mode_i = 0 if mode == "holes" else 1
    if lib is None:
        return _remove_small_regions_np(m, area_thresh, mode_i)
    changed = lib.remove_small_regions(
        m.ctypes.data_as(ctypes.c_void_p), h, w, area_thresh, mode_i
    )
    return m.astype(bool), bool(changed)


def _remove_small_regions_np(m: np.ndarray, area_thresh: int, mode_i: int):
    """numpy fallback via scipy-free BFS labelling (slow, correctness only).
    Matches the reference (segment_anything utils/amg.py:342-372): 8-connected
    components; in islands mode keep the largest island when all are small;
    changed=True whenever any small region existed."""
    from collections import deque

    h, w = m.shape
    target = 0 if mode_i == 0 else 1
    seen = np.zeros((h, w), bool)
    comps = []
    neigh = (
        (1, 0), (-1, 0), (0, 1), (0, -1),
        (1, 1), (1, -1), (-1, 1), (-1, -1),  # 8-connectivity (cv2 default)
    )
    for sy in range(h):
        for sx in range(w):
            if seen[sy, sx] or (m[sy, sx] != target):
                continue
            comp = []
            dq = deque([(sy, sx)])
            seen[sy, sx] = True
            while dq:
                y, x = dq.popleft()
                comp.append((y, x))
                for dy, dx in neigh:
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx] and m[ny, nx] == target:
                        seen[ny, nx] = True
                        dq.append((ny, nx))
            comps.append(comp)

    small = [c for c in comps if len(c) < area_thresh]
    if not small:
        return m.astype(bool), False
    keep = None
    if mode_i == 1 and len(small) == len(comps) and comps:
        keep = max(comps, key=len)  # all islands small: keep the largest
    for comp in small:
        if comp is keep:
            continue
        for y, x in comp:
            m[y, x] = 1 - target
    return m.astype(bool), True


def nms_cpu(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    lib = _load()
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    n = len(b)
    if lib is None:
        import jax.numpy as jnp

        from pope_tpu.ops.nms import nms as nms_jax

        return np.asarray(nms_jax(jnp.asarray(b), jnp.asarray(s), iou_threshold))
    keep = np.empty(n, np.uint8)
    lib.nms_cpu(
        b.ctypes.data_as(ctypes.c_void_p), s.ctypes.data_as(ctypes.c_void_p), n,
        ctypes.c_float(iou_threshold), keep.ctypes.data_as(ctypes.c_void_p),
    )
    return keep.astype(bool)
