"""ctypes binding for the native host NMS library (native/host_nms.cpp),
with transparent build-on-first-use and a numpy fallback.

Replaces the reference's `ext/nms/nms_wrapper.py` surface:
  * soft_nms(dets_xyxy_score, sigma, Nt, threshold, method) -> kept rows
    in selection order with decayed scores (== cpu_soft_nms,
    ext/nms/nms/cpu_nms.pyx:17-120),
  * hard_nms_indices(...) (== cpu_nms / torchvision.ops.nms),
  * per_class_soft_nms_xywh — the operators' `_ext_nms` helper
    (operators/centernet_operator.py:222-236).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "host_nms.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libhost_nms.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC) and
                os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True)
            except Exception as e:
                print(f"[host_nms] native build failed ({e!r}); "
                      "falling back to numpy")
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.soft_nms.restype = ctypes.c_int
        lib.soft_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.hard_nms.restype = ctypes.c_int
        lib.hard_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


_METHODS = {"linear": 1, "gaussian": 2, "hard": 0}


def soft_nms(dets: np.ndarray, sigma: float = 0.5, Nt: float = 0.3,
             threshold: float = 0.001, method="gaussian") -> np.ndarray:
    """dets: (N, >=5) [x1, y1, x2, y2, score, ...]. Returns the kept rows
    (extra columns preserved) in selection order, scores decayed —
    matching the reference wrapper's return (nms_wrapper.py:13-19)."""
    dets = np.asarray(dets, np.float32)
    n = len(dets)
    if n == 0:
        return dets
    method_id = _METHODS[method] if isinstance(method, str) else int(method)
    lib = _load()
    if lib is not None:
        buf = np.ascontiguousarray(dets[:, :5], np.float32).copy()
        order = np.zeros(n, np.int32)
        kept = lib.soft_nms(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(sigma), ctypes.c_float(Nt),
            ctypes.c_float(threshold), method_id,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        idx = order[:kept]
        out = dets[idx].copy()
        out[:, 4] = buf[idx, 4]
        return out
    # numpy fallback (same algorithm)
    return _soft_nms_numpy(dets, sigma, Nt, threshold, method_id)


def _soft_nms_numpy(dets, sigma, Nt, threshold, method_id):
    n = len(dets)
    cur = dets[:, 4].astype(np.float32).copy()
    active = np.ones(n, bool)
    selected = np.zeros(n, bool)
    order = []
    while True:
        cand = np.where(active & ~selected, cur, -np.inf)
        m = int(np.argmax(cand))
        if cand[m] == -np.inf:
            break
        selected[m] = True
        order.append(m)
        bm = dets[m]
        iw = (np.minimum(bm[2], dets[:, 2]) - np.maximum(bm[0], dets[:, 0]) + 1)
        ih = (np.minimum(bm[3], dets[:, 3]) - np.maximum(bm[1], dets[:, 1]) + 1)
        overlap = (iw > 0) & (ih > 0) & active & ~selected
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        area = (dets[:, 2] - dets[:, 0] + 1) * (dets[:, 3] - dets[:, 1] + 1)
        am = (bm[2] - bm[0] + 1) * (bm[3] - bm[1] + 1)
        ov = inter / np.clip(am + area - inter, 1e-12, None)
        if method_id == 1:
            w = np.where(ov > Nt, 1 - ov, 1.0)
        elif method_id == 2:
            w = np.exp(-(ov * ov) / sigma)
        else:
            w = np.where(ov > Nt, 0.0, 1.0)
        cur = np.where(overlap, (cur * w).astype(np.float32), cur)
        active &= ~(overlap & (cur < threshold))
    idx = np.asarray(order, np.int64)
    out = dets[idx].copy()
    out[:, 4] = cur[idx]
    return out


def hard_nms_indices(dets: np.ndarray, thresh: float, plus_one=False,
                     suppress_equal=False) -> np.ndarray:
    dets = np.ascontiguousarray(np.asarray(dets, np.float32)[:, :5])
    n = len(dets)
    if n == 0:
        return np.zeros(0, np.int64)
    lib = _load()
    if lib is not None:
        keep = np.zeros(n, np.int32)
        kept = lib.hard_nms(
            dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(thresh), int(plus_one), int(suppress_equal),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return keep[:kept].astype(np.int64)
    from tests.oracles import np_hard_nms  # pragma: no cover
    return np_hard_nms(dets[:, :4], dets[:, 4], thresh, plus_one,
                       suppress_equal)


def per_class_soft_nms_xywh(pred: np.ndarray, Nt: float = 0.7,
                            threshold: float = 0.1,
                            method: str = "gaussian") -> np.ndarray:
    """The operators' `_ext_nms`: per-class gaussian soft-NMS on
    (N, >=6) [x, y, w, h, score, cls] rows; returns xywh rows."""
    pred = np.asarray(pred, np.float64)
    if len(pred) == 0:
        return pred
    outs = []
    for cls in np.unique(pred[:, 5]):
        rows = pred[pred[:, 5] == cls].copy()
        rows[:, 2] += rows[:, 0]
        rows[:, 3] += rows[:, 1]
        kept = soft_nms(rows, sigma=0.5, Nt=Nt, threshold=threshold,
                        method=method)
        outs.append(kept)
    out = np.concatenate(outs, axis=0)
    out[:, 2] -= out[:, 0]
    out[:, 3] -= out[:, 1]
    return out
