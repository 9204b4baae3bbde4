"""Meters / timer / aggregation utilities."""

import numpy as np

from action_detection_tpu.utils.meters import AverageMeter, MeterBank, Timer
from action_detection_tpu.ops.aggregation import (
    default_aggregation_func, top_k_aggregation_func, tpp_aggregation_func,
    default_fusion_func,
)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.val == 3.0 and m.avg == 2.0
    assert f"{m:.1f}" == "3.0 (2.0)"


def test_meter_bank():
    b = MeterBank()
    b.update({"loss": 2.0, "acc": 50.0})
    b.update({"loss": 4.0, "acc": 100.0})
    assert b["loss"].avg == 3.0
    assert "loss" in b.line(["loss"])


def test_timer():
    t = Timer()
    with t:
        pass
    assert t.count == 1 and t.total >= 0


def test_aggregation_functions():
    rng = np.random.RandomState(0)
    scores = rng.randn(20, 10, 4)
    agg = default_aggregation_func(scores)
    assert agg.shape == (4,) and abs(agg.sum() - 1.0) < 1e-6
    raw = default_aggregation_func(scores, normalization=False)
    np.testing.assert_allclose(raw, scores.mean(axis=1).mean(axis=0))

    topk = top_k_aggregation_func(scores, 5, normalization=False)
    assert topk.shape == (4,)

    stage_scores = rng.randn(30, 10, 12)  # 3 stages x 4 classes
    tpp = tpp_aggregation_func(stage_scores, 4)
    assert tpp.shape == (4,)

    fused = default_fusion_func(raw, [raw], [1.0], norm=False)
    np.testing.assert_allclose(fused, raw * 2)


def test_classification_metrics():
    from action_detection_tpu.ops.metrics import (
        top_k_accuracy, video_mean_ap, mean_class_accuracy, top_k_acc)

    class Inst:
        def __init__(self, lb):
            self.num_label = lb

    class Vid:
        def __init__(self, vid, labels):
            self.id = vid
            self.instances = [Inst(l) for l in labels]

    videos = [Vid("a", [0]), Vid("b", [1]), Vid("c", [2])]
    scores = {"a": np.array([0.9, 0.05, 0.05]),
              "b": np.array([0.1, 0.8, 0.1]),
              "c": np.array([0.6, 0.3, 0.1])}   # c wrong at top-1
    assert abs(top_k_accuracy(scores, videos, 1) - 2 / 3) < 1e-9
    assert top_k_accuracy(scores, videos, 3) == 1.0
    assert top_k_acc({0, 2}, scores["a"], k=2) == (2, 2)

    ap = video_mean_ap(scores, videos)
    assert 0.0 < ap <= 1.0

    acc = mean_class_accuracy(np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]]),
                              np.array([0, 1, 1]))
    assert abs(acc - 0.75) < 1e-9
