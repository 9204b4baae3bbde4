"""1-D (temporal) non-maximal suppression.

Behavioral parity targets: /root/reference/ops/utils.py:56-82 (eval path,
``duration = t2 - t1``) and /root/reference/ops/sequence_funcs.py:71-97 (TAG
path, ``duration = t2 - t1 + 1`` — frame-index convention). The reference's
optional CUDA extension is replaced here by a vectorized O(N^2) numpy
suppression (and an optional C++ kernel in ``native/``, used when built);
typical proposal counts are 10^2–10^3 per video, where this is microseconds.
"""

from __future__ import annotations

import numpy as np

try:  # optional C++ fast path (auto-built from native/ on first import)
    from action_detection_tpu.utils.native import nms_indices as _native_nms
except Exception:  # pragma: no cover - absence of the extension is fine
    _native_nms = None


def temporal_nms_indices(starts: np.ndarray, ends: np.ndarray, scores: np.ndarray,
                         thresh: float, duration_offset: float = 0.0) -> np.ndarray:
    """Greedy temporal NMS; returns kept indices in descending-score order.

    ``duration_offset`` selects the interval-length convention:
      0.0 — continuous spans (eval on relative coordinates),
      1.0 — inclusive frame indices (TAG proposal generation).
    """
    starts = np.asarray(starts, dtype=np.float64)
    ends = np.asarray(ends, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    n = len(scores)
    if n == 0:
        return np.empty((0,), dtype=np.int64)

    if _native_nms is not None:
        return _native_nms(starts, ends, scores, float(thresh), float(duration_offset))

    durations = ends - starts + duration_offset
    # kind="stable": ties visit the larger original index first, identically
    # on the numpy and C++ paths (the reference's plain argsort is introsort,
    # whose tie order is an unspecified implementation detail)
    order = scores.argsort(kind="stable")[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        if rest.size == 0:
            break
        inter = (np.minimum(ends[i], ends[rest]) - np.maximum(starts[i], starts[rest])
                 + duration_offset)
        iou = inter / (durations[i] + durations[rest] - inter)
        order = rest[iou <= thresh]
    return np.asarray(keep, dtype=np.int64)


def temporal_nms(dets: np.ndarray, thresh: float, score_col: int = 2,
                 duration_offset: float = 0.0) -> np.ndarray:
    """NMS over a detection array with rows ``[start, end, ..., score at score_col, ...]``.

    Returns the kept rows (descending score), matching the row-filter behavior
    of the reference eval path.
    """
    dets = np.asarray(dets)
    if len(dets) == 0:
        return dets
    keep = temporal_nms_indices(dets[:, 0], dets[:, 1], dets[:, score_col], thresh,
                                duration_offset=duration_offset)
    return dets[keep, :]


def temporal_nms_tuples(bboxes, thresh: float, score_ind: int = 3):
    """NMS over ``[(start, end, cls, score), ...]`` tuple lists (TAG path).

    Uses the inclusive frame-index duration convention of
    /root/reference/ops/sequence_funcs.py:71-97.
    """
    if len(bboxes) == 0:
        return []
    arr = np.asarray([[b[0], b[1], b[score_ind]] for b in bboxes], dtype=np.float64)
    keep = temporal_nms_indices(arr[:, 0], arr[:, 1], arr[:, 2], thresh,
                                duration_offset=1.0)
    return [bboxes[i] for i in keep]
