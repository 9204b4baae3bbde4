"""ctypes bindings to the optional C++ host kernels (native/adt_native.cpp).

On first import this module builds the shared library if it is absent
(one ``make -C native``, a single-file g++ compile); if the build or load
fails it raises ``ImportError`` so callers fall back to numpy — the same
behavior as the reference's optional CUDA NMS hook
(/root/reference/ops/sequence_funcs.py:6-9), minus the silent part: the
reference requires a manual out-of-tree build, ours self-builds.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libadt_native.so")


def _load() -> ctypes.CDLL:
    try:
        return ctypes.CDLL(_LIB_PATH)
    except OSError:
        pass
    try:  # one build attempt; stdout/stderr kept for the failure message
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return ctypes.CDLL(_LIB_PATH)
    except Exception as e:  # noqa: BLE001 — map every failure to ImportError
        raise ImportError(
            f"C++ host kernels unavailable ({e!r}); build manually with "
            f"`make -C {_NATIVE_DIR}` or use the numpy fallbacks") from e


_lib = _load()

_lib.adt_temporal_nms.restype = ctypes.c_int64
_lib.adt_temporal_nms.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
    ctypes.c_double, ctypes.POINTER(ctypes.c_int64),
]

_lib.adt_tag_box_search.restype = ctypes.c_int64
_lib.adt_tag_box_search.argtypes = [
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
]


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def nms_indices(starts, ends, scores, thresh: float,
                duration_offset: float = 0.0) -> np.ndarray:
    """Greedy temporal NMS; kept indices in descending-score order."""
    starts = np.ascontiguousarray(starts, dtype=np.float64)
    ends = np.ascontiguousarray(ends, dtype=np.float64)
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    n = len(scores)
    out = np.empty(n, dtype=np.int64)
    n_keep = _lib.adt_temporal_nms(_dptr(starts), _dptr(ends), _dptr(scores),
                                   n, thresh, duration_offset, _iptr(out))
    return out[:n_keep].copy()


def tag_box_search(labels, scores, up, down, tol) -> np.ndarray:
    """TAG flood-fill box search; returns (rows, 3) [start, end, score]."""
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    up = np.ascontiguousarray(up, dtype=np.int64)
    down = np.ascontiguousarray(down, dtype=np.int64)
    tol = np.ascontiguousarray(tol, dtype=np.float64)
    capacity = 2 * len(up) * len(tol)
    out = np.empty((max(capacity, 1), 3), dtype=np.float64)
    rows = _lib.adt_tag_box_search(_iptr(labels), _dptr(scores), len(labels),
                                   _iptr(up), _iptr(down), len(up),
                                   _dptr(tol), len(tol), _dptr(out), capacity)
    return out[:rows].copy()
