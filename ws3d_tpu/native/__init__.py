"""ctypes bindings for the host C++ kernels (csrc/ws3d_host.cpp).

Auto-builds libws3d_host.so on first import if a compiler is present;
callers fall back to the NumPy implementations when unavailable
(ws3d_tpu.eval.rotate_iou_np), so the library never hard-requires the
native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO, "csrc")
_LIB_PATH = os.path.join(_CSRC, "libws3d_host.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ws3d_rotated_inter_area.argtypes = [dp, ctypes.c_int64, dp,
                                            ctypes.c_int64, dp]
    lib.ws3d_rotate_iou_eval.argtypes = [dp, ctypes.c_int64, dp,
                                         ctypes.c_int64, ctypes.c_int, dp]
    lib.ws3d_greedy_nms.argtypes = [dp, ctypes.c_int64, ctypes.c_double,
                                    u8p, u8p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ws3d_compute_statistics.argtypes = [
        dp, dp, ctypes.c_int64, dp, ctypes.c_int64, i64p, i64p, dp,
        ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, dp, dp, i64p]
    lib.ws3d_fused_statistics.argtypes = [
        dp, dp, ctypes.c_int64, dp, ctypes.c_int64, i64p, i64p, dp,
        ctypes.c_int64, ctypes.c_int, ctypes.c_double, dp, ctypes.c_int64,
        ctypes.c_int, dp]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def rotate_iou_eval(boxes: np.ndarray, qboxes: np.ndarray,
                    criterion: int = -1) -> np.ndarray:
    """Native rotate_iou_gpu_eval; same contract as
    ws3d_tpu.eval.rotate_iou_np.rotate_iou_eval."""
    lib = load()
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), np.float64)
    if n and k:
        lib.ws3d_rotate_iou_eval(_dptr(boxes), n, _dptr(qboxes), k,
                                 criterion, _dptr(out))
    return out


def greedy_nms(pair: np.ndarray, thresh: float,
               valid: Optional[np.ndarray] = None) -> np.ndarray:
    """Greedy sweep over a score-sorted pairwise matrix -> keep mask."""
    lib = load()
    pair = np.ascontiguousarray(pair, np.float64)
    n = pair.shape[0]
    if valid is None:
        valid = np.ones(n, np.uint8)
    else:
        valid = np.ascontiguousarray(valid.astype(np.uint8))
    keep = np.zeros(n, np.uint8)
    lib.ws3d_greedy_nms(_dptr(pair), n, thresh,
                        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def compute_statistics(overlaps, gt_data, dt_data, ignored_gt, ignored_det,
                       dc_bboxes, metric, min_overlap, thresh=0.0,
                       compute_fp=False, compute_aos=False):
    """Native twin of ws3d_tpu.eval.kitti_ap.compute_statistics."""
    lib = load()
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    gt_data = np.ascontiguousarray(gt_data, np.float64)
    dt_data = np.ascontiguousarray(dt_data, np.float64)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    dc = np.ascontiguousarray(
        dc_bboxes if len(dc_bboxes) else np.zeros((0, 4)), np.float64)
    gt_size, det_size = gt_data.shape[0], dt_data.shape[0]
    out4 = np.zeros(4, np.float64)
    thr = np.zeros(max(gt_size, 1), np.float64)
    n_thr = np.zeros(1, np.int64)
    lib.ws3d_compute_statistics(
        _dptr(overlaps), _dptr(gt_data), gt_size, _dptr(dt_data), det_size,
        _i64ptr(ignored_gt), _i64ptr(ignored_det), _dptr(dc), dc.shape[0],
        metric, min_overlap, thresh, int(compute_fp), int(compute_aos),
        _dptr(out4), _dptr(thr), _i64ptr(n_thr))
    return (int(out4[0]), int(out4[1]), int(out4[2]), float(out4[3]),
            thr[: int(n_thr[0])])


def fused_statistics(overlaps, gt_data, dt_data, ignored_gt, ignored_det,
                     dc_bboxes, metric, min_overlap, thresholds,
                     compute_aos, pr):
    """Accumulate one frame's tp/fp/fn/sim into pr (n_thresholds, 4)."""
    lib = load()
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    gt_data = np.ascontiguousarray(gt_data, np.float64)
    dt_data = np.ascontiguousarray(dt_data, np.float64)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    dc = np.ascontiguousarray(
        dc_bboxes if len(dc_bboxes) else np.zeros((0, 4)), np.float64)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    assert pr.flags["C_CONTIGUOUS"] and pr.dtype == np.float64
    lib.ws3d_fused_statistics(
        _dptr(overlaps), _dptr(gt_data), gt_data.shape[0], _dptr(dt_data),
        dt_data.shape[0], _i64ptr(ignored_gt), _i64ptr(ignored_det),
        _dptr(dc), dc.shape[0], metric, min_overlap, _dptr(thresholds),
        thresholds.shape[0], int(compute_aos), _dptr(pr))
