"""Native (C++) kernel loader: builds csrc/ into shared libraries on first
use (cached), binds via ctypes, and degrades to the numpy implementations
when no toolchain is available.

This is the framework's L1 analogue of the reference's
TensorRT/CMakeLists.txt + ctypes.CDLL loading
(det2trt/models/utils/register.py:72-75): host-side native kernels for the
parts of the pipeline that are not XLA programs (rotated NMS, image
preprocessing).
"""
from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess
import sys

import numpy as np

CSRC = pathlib.Path(__file__).resolve().parents[1] / "csrc"
BUILD = CSRC / "build"


def _build(name: str, extra_flags=()) -> pathlib.Path | None:
    src = CSRC / f"{name}.cpp"
    out = BUILD / f"lib{name}.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    BUILD.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(src), *extra_flags]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception as e:  # toolchain missing / compile error -> fallback
        print(f"[native] build of {name} failed ({e}); using numpy fallback", file=sys.stderr)
        return None


@functools.cache
def _nms_lib():
    path = _build("nms_rotated")
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.nms_rotated.restype = ctypes.c_int64
    lib.nms_rotated.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rotated_iou_matrix.restype = None
    lib.rotated_iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.nms_2d.restype = ctypes.c_int64
    lib.nms_2d.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def nms_2d_native(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float):
    """Axis-aligned greedy NMS; returns kept indices (score-desc order).
    Native C++ kernel with the pure-numpy greedy loop as fallback."""
    order = np.argsort(-scores)
    lib = _nms_lib()
    if lib is None:
        from .core.nms2d import nms as nms_np

        return order[: 0] if len(order) == 0 else nms_np(boxes, scores, iou_threshold)
    b = np.ascontiguousarray(boxes[order], np.float32)
    keep = np.empty(len(order), np.int64)
    n = lib.nms_2d(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(order),
        ctypes.c_float(iou_threshold),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return order[keep[:n]]


@functools.cache
def _img_lib():
    path = _build("image_pipeline", extra_flags=("-fopenmp",))
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.normalize_pad_chw.restype = None
    lib.normalize_pad_chw.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    return lib


def nms_rotated_native(boxes5: np.ndarray, scores: np.ndarray, iou_threshold: float):
    """Sorted greedy rotated NMS; returns kept indices (original order).
    Falls back to core.nms.nms_rotated if the native lib is unavailable."""
    lib = _nms_lib()
    if lib is None:
        from .core.nms import nms_rotated

        return nms_rotated(boxes5, scores, iou_threshold)
    order = np.argsort(-np.asarray(scores))
    b = np.ascontiguousarray(np.asarray(boxes5, np.float32)[order])
    keep = np.empty(len(b), np.int64)
    n = lib.nms_rotated(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(b),
        ctypes.c_float(iou_threshold),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return order[keep[:n]]


def rotated_iou_matrix_native(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _nms_lib()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is None:
        from .core.nms import rotated_iou_bev

        return np.array([[rotated_iou_bev(x, y) for y in b] for x in a], np.float32)
    out = np.empty((len(a), len(b)), np.float32)
    lib.rotated_iou_matrix(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def normalize_pad_chw_native(
    images: np.ndarray,  # [n, h, w, 3] uint8 BGR
    out_h: int,
    out_w: int,
    mean,
    std,
    to_rgb: bool,
) -> np.ndarray:
    """Fused normalize+pad+CHW; numpy fallback mirrors data/nuscenes.py."""
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, _ = images.shape
    lib = _img_lib()
    if lib is None:
        from .data.nuscenes import ImgNorm, normalize_image, pad_to_divisor

        norm = ImgNorm(tuple(mean), tuple(std), to_rgb)
        outs = []
        for i in range(n):
            img = normalize_image(images[i], norm)
            padded = np.zeros((out_h, out_w, 3), np.float32)
            padded[: min(h, out_h), : min(w, out_w)] = img[:out_h, :out_w]
            outs.append(padded.transpose(2, 0, 1))
        return np.stack(outs)
    out = np.empty((n, 3, out_h, out_w), np.float32)
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)
    if to_rgb:  # mean/std given in RGB order; kernel indexes dst channels
        pass
    lib.normalize_pad_chw(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, h, w, out_h, out_w,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(to_rgb),
    )
    return out
