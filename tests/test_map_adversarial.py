"""Adversarial fixtures pinning AP greedy-matching to the ActivityNet
toolkit's exact behavior (VERDICT.md round 1, missing item 4).

The toolkit itself (``anet_toolkit.Evaluation.eval_detection.
compute_average_precision_detection``) is an unvendored submodule — an empty
directory in /root/reference — so it cannot be executed as an oracle here.
Expected values below are derived BY HAND from its published algorithm
(greedy per-threshold matching of score-sorted predictions to same-video
unmatched GTs in descending-IoU order; interpolated precision; recall
normalized by GT count), which /root/reference/eval_detection_results.py:219-235
delegates to. Each case documents the derivation.

Known deliberate deviation, documented: on exact IoU ties between candidate
GTs, the toolkit visits ``argsort()[::-1]`` order (reversed stable = later GT
first) while we visit ``argsort(-iou)`` order (earlier GT first). The
tp/fp verdict of the tying prediction is identical; only WHICH tied GT gets
locked differs, which can matter only if a later prediction overlaps exactly
one of the tied GTs — no real detector emits bitwise-equal IoUs there.
"""

import numpy as np
import pytest

from action_detection_tpu.ops.map_eval import (
    compute_average_precision_detection, map_sweep)


def ap(gt, pred, thr):
    return compute_average_precision_detection(gt, pred, [thr])[0]


def test_duplicate_detections_on_one_gt():
    # GT: v1[0,10], v1[20,30]. Preds: two copies of [0,10] then the second GT.
    # Matching @0.5: tp,fp(GT locked),tp -> prec 1, 1/2, 2/3; rec .5, .5, 1.
    # Interpolated: 0.5*1 + 0.5*(2/3) = 5/6.
    gt = [("v1", 0.0, 10.0), ("v1", 20.0, 30.0)]
    pred = [("v1", 0.0, 10.0, 0.9), ("v1", 0.0, 10.0, 0.8),
            ("v1", 20.0, 30.0, 0.7)]
    assert ap(gt, pred, 0.5) == pytest.approx(5.0 / 6.0)


def test_cross_video_collision():
    # A perfect-overlap detection in the WRONG video must be a false positive.
    # tp sequence: fp, tp -> prec 0, 1/2; rec 0, 1. Interpolated AP = 0.5.
    gt = [("v1", 0.0, 10.0)]
    pred = [("v2", 0.0, 10.0, 0.9), ("v1", 0.0, 10.0, 0.8)]
    assert ap(gt, pred, 0.5) == pytest.approx(0.5)


def test_greedy_lock_not_optimal_assignment():
    # Greedy: the higher-scored looser box locks the GT; the later perfect box
    # becomes fp. (An optimal assignment would swap them; the toolkit doesn't.)
    gt = [("v1", 0.0, 10.0)]
    pred = [("v1", 0.0, 12.0, 0.9),   # IoU 10/12 = 0.833 -> tp, locks GT
            ("v1", 0.0, 10.0, 0.8)]   # IoU 1.0 but GT locked -> fp
    assert ap(gt, pred, 0.5) == pytest.approx(1.0)
    # at threshold 0.9 the loose box misses, the tight one hits: fp, tp
    assert ap(gt, pred, 0.9) == pytest.approx(0.5)


def test_best_iou_gt_chosen_first():
    # One pred overlaps two GTs; it must take the higher-IoU one, leaving the
    # other for the following pred -> both tp, AP = 1.
    gt = [("v1", 0.0, 10.0), ("v1", 8.0, 20.0)]
    pred = [("v1", 7.0, 19.0, 0.9),   # IoU: vs gt0 3/19, vs gt1 11/13 -> gt1
            ("v1", 0.0, 10.0, 0.8)]   # takes gt0
    assert ap(gt, pred, 0.15) == pytest.approx(1.0)


def test_iou_exactly_at_threshold_counts():
    # toolkit: `if tiou < thr: fp` -- equality is a match.
    gt = [("v1", 0.0, 10.0)]
    pred = [("v1", 0.0, 5.0, 0.9)]    # IoU exactly 0.5
    assert ap(gt, pred, 0.5) == pytest.approx(1.0)
    assert ap(gt, pred, 0.5 + 1e-9) == pytest.approx(0.0)


def test_score_ties_are_stable_input_order():
    # Our sort is Python's stable sort on -score: equal-score predictions keep
    # input order. Pin that determinism (the toolkit's pandas quicksort is
    # NOT stable -- scores here differ by 0 so we document our convention).
    gt = [("v1", 0.0, 10.0)]
    pred_tp_first = [("v1", 0.0, 10.0, 0.5), ("v1", 50.0, 60.0, 0.5)]
    pred_fp_first = [("v1", 50.0, 60.0, 0.5), ("v1", 0.0, 10.0, 0.5)]
    assert ap(gt, pred_tp_first, 0.5) == pytest.approx(1.0)
    assert ap(gt, pred_fp_first, 0.5) == pytest.approx(0.5)


def test_unmatched_gt_bounds_recall():
    # 3 GTs, only 1 detected: rec caps at 1/3, prec 1 -> AP = 1/3.
    gt = [("v1", 0.0, 10.0), ("v1", 20.0, 30.0), ("v2", 0.0, 10.0)]
    pred = [("v1", 0.0, 10.0, 0.9)]
    assert ap(gt, pred, 0.5) == pytest.approx(1.0 / 3.0)


def test_per_threshold_matching_is_independent():
    # A pred can be tp at a low threshold and fp at a high one; the GT lock is
    # per-threshold. pred1 IoU=0.6, pred2 IoU=1.0 on the same GT.
    gt = [("v1", 0.0, 10.0)]
    pred = [("v1", 0.0, 6.0, 0.9),    # IoU 0.6
            ("v1", 0.0, 10.0, 0.8)]   # IoU 1.0
    aps = compute_average_precision_detection(gt, pred, [0.5, 0.7])
    # @0.5: tp, fp -> AP 1.  @0.7: fp, tp -> prec 0, .5; AP 0.5.
    np.testing.assert_allclose(aps, [1.0, 0.5])


def test_zigzag_interpolation():
    # Non-monotone precision curve exercises the backward-max interpolation.
    # Preds: tp, fp, tp, fp, tp over 3 GTs.
    # prec: 1, 1/2, 2/3, 2/4, 3/5; rec: 1/3, 1/3, 2/3, 2/3, 1.
    # Backward-max precision at recall jumps: 1 (r=1/3), 2/3 (r=2/3), 3/5 (r=1)
    # AP = (1/3)(1) + (1/3)(2/3) + (1/3)(3/5) = 1/3+2/9+1/5 = 34/45.
    gt = [("v1", 0.0, 10.0), ("v1", 20.0, 30.0), ("v1", 40.0, 50.0)]
    pred = [("v1", 0.0, 10.0, 0.9), ("v1", 70.0, 80.0, 0.8),
            ("v1", 20.0, 30.0, 0.7), ("v1", 90.0, 100.0, 0.6),
            ("v1", 40.0, 50.0, 0.5)]
    assert ap(gt, pred, 0.5) == pytest.approx(34.0 / 45.0)


def test_empty_cases():
    assert ap([], [("v1", 0.0, 1.0, 0.5)], 0.5) == 0.0
    assert ap([("v1", 0.0, 1.0)], [], 0.5) == 0.0


def test_map_sweep_matches_per_class_calls():
    rng = np.random.RandomState(0)
    gt_by_cls, det_by_cls = [], []
    for _ in range(4):
        starts = rng.rand(6) * 50
        gt_by_cls.append([(f"v{rng.randint(3)}", float(s), float(s + 5))
                          for s in starts])
        dstarts = rng.rand(15) * 50
        det_by_cls.append([(f"v{rng.randint(3)}", float(s), float(s + 4 + rng.rand() * 3),
                            float(rng.rand())) for s in dstarts])
    iou_range = [0.3, 0.5, 0.7]
    table = map_sweep(gt_by_cls, det_by_cls, iou_range, workers=2)
    for c in range(4):
        np.testing.assert_allclose(
            table[c], compute_average_precision_detection(
                gt_by_cls[c], det_by_cls[c], iou_range))
