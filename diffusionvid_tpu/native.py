"""ctypes bindings to the vidkit native library (native/vidkit.cpp).

Builds on first use with g++ (no pybind11 in this environment); every
entry point has a pure-Python fallback in its caller, so the framework
works without a toolchain too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvidkit.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i8 = ctypes.POINTER(ctypes.c_int8)
    c_u8 = ctypes.POINTER(ctypes.c_uint8)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    lib.vid_match_frame.argtypes = [c_d, ctypes.c_int, c_d, c_d,
                                    ctypes.c_int, ctypes.c_double,
                                    ctypes.c_double, c_i8, c_d]
    lib.vid_match_frame.restype = None
    lib.vidkit_max_chain.argtypes = [c_d, c_d, c_u8, c_i32, ctypes.c_int,
                                     ctypes.c_double, c_d, c_i32, c_i32]
    lib.vidkit_max_chain.restype = ctypes.c_int
    _lib = lib
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def match_frame_native(pred_boxes: np.ndarray, gt_boxes: np.ndarray,
                       gt_ignore: np.ndarray, iou_thresh: float,
                       empty_weight: float):
    """Native per-(frame, class) matching; returns (match int8[n],
    pred_ignore float64[n]) or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pb = np.ascontiguousarray(pred_boxes, np.float64)
    gb = np.ascontiguousarray(gt_boxes, np.float64)
    gi = np.ascontiguousarray(gt_ignore, np.float64)
    n, g = len(pb), len(gb)
    match = np.zeros(n, np.int8)
    pig = np.zeros(n, np.float64)
    lib.vid_match_frame(_ptr(pb, ctypes.c_double), n,
                        _ptr(gb, ctypes.c_double),
                        _ptr(gi, ctypes.c_double), g,
                        float(iou_thresh), float(empty_weight),
                        _ptr(match, ctypes.c_int8), _ptr(pig, ctypes.c_double))
    return match, pig


def max_chain_native(boxes: np.ndarray, scores: np.ndarray,
                     dead: np.ndarray, offsets: np.ndarray,
                     link_thresh: float):
    """Native best temporal chain; returns (root, path global ids, total)
    or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(boxes, np.float64)
    s = np.ascontiguousarray(scores, np.float64)
    d = np.ascontiguousarray(dead, np.uint8)
    off = np.ascontiguousarray(offsets, np.int32)
    n_frames = len(off) - 1
    total = ctypes.c_double(0.0)
    root = ctypes.c_int32(0)
    path = np.zeros(n_frames, np.int32)
    n = lib.vidkit_max_chain(_ptr(b, ctypes.c_double),
                             _ptr(s, ctypes.c_double),
                             _ptr(d, ctypes.c_uint8),
                             _ptr(off, ctypes.c_int32), n_frames,
                             float(link_thresh), ctypes.byref(total),
                             ctypes.byref(root), _ptr(path, ctypes.c_int32))
    return int(root.value), path[:n].tolist(), float(total.value)
