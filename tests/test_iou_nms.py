"""Unit tests for temporal IoU / recall / NMS host ops."""

import numpy as np

from action_detection_tpu.ops.iou import (
    temporal_iou, temporal_iou_matrix, overlap_over_b, temporal_recall,
    name_proposal, get_temporal_proposal_recall,
)
from action_detection_tpu.ops.nms import (
    temporal_nms, temporal_nms_indices, temporal_nms_tuples,
)


def ref_iou(a, b):
    """Scalar oracle for interval IoU."""
    inter = max(a[0], b[0]), min(a[1], b[1])
    union = min(a[0], b[0]), max(a[1], b[1])
    if inter[0] >= inter[1]:
        return 0.0
    return (inter[1] - inter[0]) / (union[1] - union[0])


def test_temporal_iou_matches_scalar_oracle():
    rng = np.random.RandomState(0)
    for _ in range(200):
        a = np.sort(rng.rand(2))
        b = np.sort(rng.rand(2))
        assert abs(temporal_iou(a, b) - ref_iou(a, b)) < 1e-12


def test_iou_matrix_matches_pairwise():
    rng = np.random.RandomState(1)
    A = np.sort(rng.rand(13, 2), axis=1)
    B = np.sort(rng.rand(7, 2), axis=1)
    M = temporal_iou_matrix(A, B)
    for i in range(13):
        for j in range(7):
            assert abs(M[i, j] - ref_iou(A[i], B[j])) < 1e-12


def test_overlap_over_b():
    assert overlap_over_b((0, 10), (5, 10)) == 1.0
    assert overlap_over_b((0, 4), (5, 10)) == 0.0
    assert abs(overlap_over_b((0, 7), (5, 10)) - 0.4) < 1e-12


def test_temporal_recall():
    gt = [(0, 1), (2, 3), (10, 12)]
    est = [(0, 1.05), (100, 101)]
    hit, total = temporal_recall(gt, est, thresh=0.5)
    assert (hit, total) == (1, 3)


def test_proposal_recall_aggregate():
    gt_list = [[(0, 1)], [(0, 1), (5, 6)]]
    pr_list = [[(0, 1)], [(0, 1)]]
    pv, pi = get_temporal_proposal_recall(pr_list, gt_list, 0.5)
    assert abs(pv - 0.5) < 1e-12
    assert abs(pi - 2.0 / 3.0) < 1e-12


def oracle_nms(dets, thresh, duration_offset=0.0):
    """Straightforward greedy NMS oracle (quadratic, index-based)."""
    t1, t2, sc = dets[:, 0], dets[:, 1], dets[:, 2]
    dur = t2 - t1 + duration_offset
    order = sc.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        tt1 = np.maximum(t1[i], t1[order[1:]])
        tt2 = np.minimum(t2[i], t2[order[1:]])
        inter = tt2 - tt1 + duration_offset
        iou = inter / (dur[i] + dur[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


def test_nms_matches_oracle_both_conventions():
    rng = np.random.RandomState(2)
    for offset in (0.0, 1.0):
        for _ in range(20):
            n = rng.randint(1, 60)
            starts = rng.rand(n) * 100
            ends = starts + rng.rand(n) * 30 + 0.1
            scores = rng.rand(n)
            dets = np.stack([starts, ends, scores], axis=1)
            keep = temporal_nms_indices(starts, ends, scores, 0.35,
                                        duration_offset=offset)
            assert list(keep) == oracle_nms(dets, 0.35, duration_offset=offset)


def test_nms_row_filter_and_tuples():
    dets = np.array([
        [0.0, 1.0, 0.9, 7.0],
        [0.05, 1.0, 0.8, 8.0],
        [2.0, 3.0, 0.5, 9.0],
    ])
    out = temporal_nms(dets, 0.5)
    assert out.shape == (2, 4)
    assert out[0, 2] == 0.9 and out[1, 2] == 0.5

    boxes = [(0, 10, 1, 0.9), (1, 10, 1, 0.95), (50, 60, 1, 0.1)]
    kept = temporal_nms_tuples(boxes, 0.5)
    assert kept[0] == (1, 10, 1, 0.95)
    assert (50, 60, 1, 0.1) in kept
    assert len(kept) == 2


def test_name_proposal_labels_best_overlap():
    gt = [(3, (10.0, 20.0)), (5, (40.0, 50.0))]
    est = [(11.0, 19.0), (0.0, 5.0), (39.0, 52.0)]
    named = name_proposal(gt, est)
    assert named[0][0] == 4          # label 3 shifted by +1
    assert named[1][0] == 0          # background
    assert named[2][0] == 6
    assert named[0][3:] == (11.0, 19.0)
    assert 0.0 < named[2][1] < 1.0
