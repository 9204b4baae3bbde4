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
