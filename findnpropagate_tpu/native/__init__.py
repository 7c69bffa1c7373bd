"""Native (C++) host runtime for the data pipeline and evaluators.

The reference ships C++/CUDA extensions for its host hot loops
(pcdet/ops/iou3d_nms/src/iou3d_cpu.cpp, the numba rotate_iou in
kitti_object_eval_python/rotate_iou.py). Device compute here is XLA/Pallas;
this module is the host-side native equivalent: exact rotated-rectangle
IoU (BEV + 3D), points-in-boxes, and greedy rotated NMS, compiled on first
import with g++ and bound via ctypes (no pybind11 in this environment).

`available()` is False when no compiler is present; callers fall back to
numpy paths (utils/geometry_np.py keeps an exact pure-numpy clip for that
case), so the package never hard-requires the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "geometry.cc")
_LIB = os.path.join(_DIR, "libfnp_geometry.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++14", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("FNP_DISABLE_NATIVE"):
            return None
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except Exception:
            return None
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        ip32 = ctypes.POINTER(ctypes.c_int32)
        ip64 = ctypes.POINTER(ctypes.c_int64)
        lib.rotated_iou_bev.argtypes = [fp, i64, fp, i64, fp]
        lib.iou3d.argtypes = [fp, i64, fp, i64, fp]
        lib.iou_bev7.argtypes = [fp, i64, fp, i64, fp]
        lib.points_in_boxes.argtypes = [fp, i64, fp, i64, ip32]
        lib.nms_bev7.argtypes = [fp, ip64, i64, ctypes.c_float, ip64]
        lib.nms_bev7.restype = i64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32c(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotated_iou_bev(boxes_a, boxes_b):
    """(N, 5) x (M, 5) [cx, cy, dx, dy, yaw] -> exact rotated IoU (N, M)."""
    lib = _load()
    a, b = _f32c(boxes_a), _f32c(boxes_b)
    n, m = len(a), len(b)
    out = np.zeros((n, m), np.float32)
    if n and m:
        lib.rotated_iou_bev(_fp(a), n, _fp(b), m, _fp(out))
    return out


def iou_bev7(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> exact rotated BEV IoU (height-agnostic)."""
    lib = _load()
    a, b = _f32c(boxes_a), _f32c(boxes_b)
    n, m = len(a), len(b)
    out = np.zeros((n, m), np.float32)
    if n and m:
        lib.iou_bev7(_fp(a), n, _fp(b), m, _fp(out))
    return out


def iou3d(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> exact rotated 3D IoU."""
    lib = _load()
    a, b = _f32c(boxes_a), _f32c(boxes_b)
    n, m = len(a), len(b)
    out = np.zeros((n, m), np.float32)
    if n and m:
        lib.iou3d(_fp(a), n, _fp(b), m, _fp(out))
    return out


def points_in_boxes(points, boxes):
    """(P, 3), (N, 7) -> (P,) int32 first-containing-box index (or -1)."""
    lib = _load()
    p = _f32c(points[:, :3])
    b = _f32c(boxes[:, :7])
    out = np.full((len(p),), -1, np.int32)
    if len(p) and len(b):
        lib.points_in_boxes(
            _fp(p), len(p), _fp(b), len(b),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def nms_bev(boxes, scores, thresh):
    """(N, 7), (N,) -> kept indices (descending-score greedy rotated NMS)."""
    lib = _load()
    b = _f32c(boxes[:, :7])
    order = np.argsort(-np.asarray(scores)).astype(np.int64)
    keep = np.zeros((len(b),), np.int64)
    if not len(b):
        return keep[:0]
    kept = lib.nms_bev7(
        _fp(b), order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(b), float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:kept]
