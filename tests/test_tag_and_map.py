"""TAG grouping, sliding windows, and detection-mAP tests."""

import numpy as np

from action_detection_tpu.ops.tag import (
    label_frame_by_threshold, build_box_by_search, gen_exponential_sw_proposal,
)
from action_detection_tpu.ops.map_eval import (
    compute_average_precision_detection, map_sweep, interpolated_prec_rec,
)
from action_detection_tpu.config import get_configs, get_actionness_configs


def test_label_frame_by_threshold():
    # frames 3..7 strongly foreground for class 0 (fg column = cls+1)
    T = 12
    scores = np.zeros((T, 3))
    scores[3:8, 1] = 5.0
    out = label_frame_by_threshold(scores, [0], bw=None, thresh=[0.5, 0.9],
                                   multicrop=False)
    assert len(out) == 2
    cls, labels, raw = out[0]
    assert cls == 0
    assert labels[3:8].all() and not labels[:3].any() and not labels[8:].any()
    np.testing.assert_allclose(raw, scores[:, 1])


def test_build_box_by_search_single_run():
    labels = np.zeros(20, dtype=bool)
    labels[5:10] = True
    scores = np.arange(20, dtype=float)
    boxes = build_box_by_search([(0, labels, scores)], np.array([0.1]))
    # single run [5, 10): box ends are down+1 = 11 (reference convention,
    # sequence_funcs.py:122-134 — one frame past the first background frame)
    assert all(b[0] == 5 and b[1] == 11 for b in boxes)
    assert all(b[2] == 0 for b in boxes)
    # forward scan scores sum the box span; the backward fallback includes one
    # extra frame (reference quirk at :134)
    assert {round(b[3], 6) for b in boxes} == {
        round(scores[5:11].sum(), 6), round(scores[0:12].sum(), 6)}


def test_build_box_by_search_merges_runs_under_tolerance():
    labels = np.zeros(30, dtype=bool)
    labels[2:6] = True
    labels[8:12] = True   # gap of 2 bg frames
    labels[25:28] = True  # far-away run
    scores = np.ones(30)
    boxes = build_box_by_search([(1, labels, scores)], np.array([0.0, 1.0]))
    spans = {(int(b[0]), int(b[1])) for b in boxes}
    # tolerance 0: individual runs must appear (ends are down+1)
    assert (2, 7) in spans and (8, 13) in spans and (25, 29) in spans
    # high tolerance: merged boxes spanning the gap must appear
    assert any(s == 2 and e >= 13 for s, e in spans)


def test_gen_exponential_sw_proposal():
    props = gen_exponential_sw_proposal(30.0, time_step=1, max_level=4, overlap=0.5)
    assert all(min(30.0, e) - s >= 1 for s, e in props)
    spans = {e - s for s, e in props}
    assert spans == {1.0, 2.0, 4.0, 8.0}


def test_interpolated_ap_perfect_and_worst():
    # single GT, single matching prediction => AP 1.0
    gt = [("v", 0.0, 1.0)]
    pred = [("v", 0.0, 1.0, 0.9)]
    ap = compute_average_precision_detection(gt, pred, [0.5])
    assert abs(ap[0] - 1.0) < 1e-9
    # no overlap => AP 0
    pred = [("v", 5.0, 6.0, 0.9)]
    ap = compute_average_precision_detection(gt, pred, [0.5])
    assert ap[0] == 0.0


def test_ap_ordering_and_duplicates():
    gt = [("v", 0.0, 1.0), ("v", 2.0, 3.0)]
    pred = [
        ("v", 0.0, 1.0, 0.9),    # TP
        ("v", 0.01, 1.0, 0.8),   # duplicate of matched GT -> FP
        ("v", 2.0, 3.0, 0.7),    # TP
    ]
    ap = compute_average_precision_detection(gt, pred, [0.5])
    # precision at ranks: 1, 1/2, 2/3; recall: .5, .5, 1.0
    # interpolated: 1.0 * 0.5 + (2/3) * 0.5
    assert abs(ap[0] - (0.5 + 0.5 * 2 / 3)) < 1e-9


def test_ap_multiple_thresholds_and_sweep():
    gt = [("v", 0.0, 10.0)]
    pred = [("v", 0.0, 7.0, 0.9)]   # IoU 0.7
    ap = compute_average_precision_detection(gt, pred, [0.5, 0.8])
    assert ap[0] == 1.0 and ap[1] == 0.0

    aps = map_sweep([gt, gt], [pred, []], [0.5, 0.8], workers=2)
    assert aps.shape == (2, 2)
    assert aps[0, 0] == 1.0 and aps[1, 0] == 0.0


def test_config_loading():
    cfg = get_configs("thumos14")
    assert cfg.num_class == 20
    assert cfg.sampling.fg_per_video == 1
    assert cfg.sampling.incomplete_per_video == 6
    assert cfg.sampling.bg_per_video == 1
    assert cfg.evaluation.top_k == 2000
    assert cfg.stpp == (1, 1, 1)
    assert len(cfg.iou_range) == 9

    anet = get_configs("activitynet1.2")
    assert anet.num_class == 100
    assert abs(anet.evaluation.nms_threshold - 0.6) < 1e-9
    assert len(anet.iou_range) == 10

    act = get_actionness_configs("thumos14")
    assert act.num_class == 2


def test_reference_model_url_lookup():
    from action_detection_tpu.config import get_reference_model_url

    url = get_reference_model_url("thumos14", "RGB", "ImageNet", "BNInception")
    assert url.startswith("https://") and url.endswith(".pth.tar")
    url2 = get_reference_model_url("thumos14", "Flow", "Kinetics", "InceptionV3")
    assert "kinetics" in url2
