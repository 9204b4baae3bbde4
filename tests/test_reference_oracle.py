"""Parity tests using the reference implementation itself as the oracle.

These import the torch/numpy modules from /root/reference directly and assert
our TPU-first reimplementations agree numerically (VERDICT.md round 1, item 3:
hand-rewritten loop oracles share a misreading risk with their author; the
reference code does not).

Not coverable this way: the reference's eval_detection_results.py depends on
the unvendored anet_toolkit submodule (empty directory) and terminaltables, so
the full mAP table cannot be produced by the reference in this environment;
``tests/test_map_adversarial.py`` pins our AP implementation on analytically
derived adversarial fixtures instead.

Shims applied to *run* (not alter) the reference on this machine:
  - ``torch.Tensor.cuda`` -> identity (no CUDA here; values are unaffected),
  - a ``torchvision`` stub module (reference transforms imports it at module
    scope; none of its classes are exercised),
  - ``np.int`` -> ``int`` (removed in numpy 2.0; reference predates that).
"""

import sys
import types

import numpy as np
import pytest

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow
import torch

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Namespace of reference modules, importable on CPU torch + numpy 2."""
    if not hasattr(np, "int"):
        np.int = int  # reference ssn_dataset.py:397 uses the removed alias
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.SimpleNamespace(
            CenterCrop=object, Scale=object, Compose=object)
        sys.modules["torchvision"] = tv
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        mods = types.SimpleNamespace(
            ssn_ops=importlib.import_module("ops.ssn_ops"),
            seq=importlib.import_module("ops.sequence_funcs"),
            det=importlib.import_module("ops.detection_metrics"),
            utils=importlib.import_module("ops.utils"),
            io=importlib.import_module("ops.io"),
            ssn_dataset=importlib.import_module("ssn_dataset"),
        )
        yield mods
    finally:
        sys.path.remove(REFERENCE)
        torch.Tensor.cuda = orig_cuda


# ---------------------------------------------------------------------------
# STPP train forward (ops/ssn_ops.py:22-79)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cfg", [(1, 1, 1), (1, (1, 2), 1), ((1, 2), (1, 2, 3), 2)])
@pytest.mark.parametrize("sc", [True, False])
def test_stpp_train_matches_reference(ref, cfg, sc):
    from action_detection_tpu.ops.stpp import StppConfig, stpp_train_pool

    rng = np.random.RandomState(0)
    P, S, D = 6, 9, 13
    seg_split = (2, 7, 9)
    ft = rng.randn(P, S, D).astype(np.float32)
    scaling = rng.rand(P, 2).astype(np.float32)

    ref_mod = ref.ssn_ops.StructuredTemporalPyramidPooling(
        D, standalong_classifier=sc, configs=cfg)
    ref_act, ref_comp = ref_mod(torch.from_numpy(ft.reshape(P * S, D)),
                                torch.from_numpy(scaling), seg_split)

    act, comp = stpp_train_pool(ft, scaling, seg_split, StppConfig.from_raw(cfg),
                                standalone_classifier=sc)
    np.testing.assert_allclose(np.asarray(act), ref_act.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp), ref_comp.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# STPP reorganized test-time pooling (ops/ssn_ops.py:82-170)
# ---------------------------------------------------------------------------

def _test_ticks(rng, n_props, num_sampled):
    """Realistic (start-aug, start, end, end-aug) ticks via the get_test_data
    formula (ssn_dataset.py:412-424) on random relative proposals."""
    ticks, scalings = [], []
    for _ in range(n_props):
        a, b = np.sort(rng.rand(2))
        if b - a < 1e-3:
            b = min(1.0, a + 0.05)
        dur = b - a
        rel_start = a - dur * 0.5
        rel_end = b + dur * 0.5
        real_start, real_end = max(0.0, rel_start), min(1.0, rel_end)
        scalings.append(((a - real_start) / (dur * 0.5),
                         (real_end - b) / (dur * 0.5)))
        ticks.append((int(real_start * num_sampled), int(a * num_sampled),
                      int(b * num_sampled), int(real_end * num_sampled)))
    return (np.asarray(ticks, dtype=np.int64),
            np.asarray(scalings, dtype=np.float32))


@pytest.mark.parametrize("cfg", [
    (1, 1, 1), (1, (1, 2), 1),
    # non-power-of-two part counts: the float64 arange+int() boundary math
    # (ssn_ops.py:144-147) rounds differently from a float32 closed form —
    # these pin the exact-rational trunc arithmetic in ops/stpp._part_bounds
    (2, 3, 2), (1, (3, 5), 1), (1, 7, 1),
])
def test_stpp_reorganized_matches_reference(ref, cfg):
    from action_detection_tpu.ops.stpp import (ReorganizedScoreLayout,
                                               StppConfig,
                                               reorganized_stpp_pool)

    rng = np.random.RandomState(1)
    K = 4
    our_cfg = StppConfig.from_raw(cfg)
    mult = our_cfg.feat_multiplier
    act_len, comp_len, reg_len = K + 1, K, 2 * K
    total = act_len + (comp_len + reg_len) * mult
    T, P = 57, 40
    scores = rng.randn(T, total).astype(np.float32)
    ticks, scalings = _test_ticks(rng, P, T)

    ref_pool = ref.ssn_ops.STPPReorgainzed(
        total, act_len, comp_len, reg_len,
        standalong_classifier=True, with_regression=True, stpp_cfg=cfg)
    ra, rc, rr = ref_pool.forward(torch.from_numpy(scores),
                                  torch.from_numpy(ticks),
                                  torch.from_numpy(scalings))

    layout = ReorganizedScoreLayout(act_len=act_len, comp_len=comp_len,
                                    reg_len=reg_len, feat_multiplier=mult)
    a, c, r = reorganized_stpp_pool(scores, ticks, scalings, layout, our_cfg)
    np.testing.assert_allclose(np.asarray(a), ra.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c), rc.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r), rr.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Losses: OHEM completeness (value AND gradient), class-wise regression
# (ops/ssn_ops.py:173-258)
# ---------------------------------------------------------------------------

def test_completeness_loss_and_grad_match_reference(ref):
    import jax

    from action_detection_tpu.ops.losses import completeness_loss

    rng = np.random.RandomState(2)
    groups, split, gsize, K = 3, 1, 8, 5
    n = groups * gsize
    pred = rng.randn(n, K).astype(np.float32)
    labels = np.concatenate(
        [np.r_[rng.randint(1, K + 1, size=split),
               rng.randint(1, K + 1, size=gsize - split)] for _ in range(groups)]
    ).astype(np.int64)

    tpred = torch.from_numpy(pred).requires_grad_(True)
    ref_loss = ref.ssn_ops.CompletenessLoss(ohem_ratio=0.17)(
        tpred, torch.from_numpy(labels), split, gsize)
    ref_loss.backward()

    ours, grad = jax.value_and_grad(
        lambda p: completeness_loss(p, labels, split, gsize, ohem_ratio=0.17))(pred)
    np.testing.assert_allclose(float(ours), float(ref_loss.detach()), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), tpred.grad.numpy(), atol=1e-6)


def test_classwise_regression_loss_and_grad_match_reference(ref):
    import jax

    from action_detection_tpu.ops.losses import classwise_regression_loss

    rng = np.random.RandomState(3)
    N, K = 12, 5
    pred = rng.randn(N, K, 2).astype(np.float32)
    labels = rng.randint(1, K + 1, size=N).astype(np.int64)
    targets = rng.randn(N, 2).astype(np.float32)

    tpred = torch.from_numpy(pred).requires_grad_(True)
    ref_loss = ref.ssn_ops.ClassWiseRegressionLoss()(
        tpred, torch.from_numpy(labels), torch.from_numpy(targets))
    ref_loss.backward()

    ours, grad = jax.value_and_grad(
        lambda p: classwise_regression_loss(p, labels, targets))(pred)
    np.testing.assert_allclose(float(ours), float(ref_loss.detach()), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), tpred.grad.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# Segment index sampling on fixed seeds (ssn_dataset.py:284-345)
# ---------------------------------------------------------------------------

def _ref_sampler_shell(ref, body_seg=5, aug_seg=2, new_length=1, random_shift=True):
    ds = ref.ssn_dataset.SSNDataSet.__new__(ref.ssn_dataset.SSNDataSet)
    ds.body_seg, ds.aug_seg, ds.new_length = body_seg, aug_seg, new_length
    ds.starting_ratio, ds.ending_ratio = 0.5, 0.5
    ds.random_shift = random_shift
    return ds


def _our_sampler_shell(body_seg=5, aug_seg=2, new_length=1):
    from action_detection_tpu.data.ssn_dataset import SSNDataset

    ds = SSNDataset.__new__(SSNDataset)
    ds.body_seg, ds.aug_seg, ds.new_length = body_seg, aug_seg, new_length
    ds.starting_ratio, ds.ending_ratio = 0.5, 0.5
    return ds


@pytest.mark.parametrize("seed", [0, 7, 1234])
@pytest.mark.parametrize("span", [(30, 220, 400), (3, 11, 50), (0, 399, 400),
                                  (100, 112, 115)])
def test_sampled_segment_indices_match_reference(ref, seed, span):
    from action_detection_tpu.data.ssn_dataset import SSNInstance

    start, end, frame_cnt = span
    ref_ds = _ref_sampler_shell(ref)
    our_ds = _our_sampler_shell()
    ref_prop = ref.ssn_dataset.SSNInstance(start, end, frame_cnt, best_iou=0.9)
    our_prop = SSNInstance(start, end, frame_cnt, best_iou=0.9)

    # reference draws from the global numpy RNG; RandomState(seed) replays the
    # same stream for ours
    np.random.seed(seed)
    r_off, r_ss, r_es, r_split = ref_ds._sample_ssn_indices(ref_prop, frame_cnt)
    o_off, o_ss, o_es, o_split = our_ds.sample_ssn_indices(
        our_prop, frame_cnt, rng=np.random.RandomState(seed))
    np.testing.assert_array_equal(o_off, r_off.astype(np.int64))
    assert o_ss == pytest.approx(r_ss) and o_es == pytest.approx(r_es)
    assert tuple(o_split) == tuple(r_split)

    # validation mode (deterministic center ticks)
    ref_ds.random_shift = False
    r_off, r_ss, r_es, _ = ref_ds._sample_ssn_indices(ref_prop, frame_cnt)
    o_off, o_ss, o_es, _ = our_ds.sample_ssn_indices(our_prop, frame_cnt, rng=None)
    np.testing.assert_array_equal(o_off, r_off.astype(np.int64))
    assert o_ss == pytest.approx(r_ss) and o_es == pytest.approx(r_es)


# ---------------------------------------------------------------------------
# Dataset record semantics: pools, regression targets, test tick math
# (ssn_dataset.py:60-131, 393-453)
# ---------------------------------------------------------------------------

def test_video_record_pools_and_reg_targets_match_reference(ref, tmp_path):
    from tests.test_datasets import write_proposal_list

    from action_detection_tpu.data.proposal_io import load_proposal_file
    from action_detection_tpu.data.ssn_dataset import SSNVideoRecord

    prop_file = tmp_path / "props.txt"
    write_proposal_list(prop_file, n_videos=4, seed=11)

    ref_records = [ref.ssn_dataset.SSNVideoRecord(p)
                   for p in ref.io.load_proposal_file(str(prop_file))]
    our_records = [SSNVideoRecord(p) for p in load_proposal_file(str(prop_file))]
    assert len(ref_records) == len(our_records)

    for rv, ov in zip(ref_records, our_records):
        assert ov.id == rv.id and ov.num_frames == rv.num_frames
        r_fg, o_fg = rv.get_fg(0.7, True), ov.get_fg(0.7, True)
        assert [(p.start_frame, p.end_frame) for p in o_fg] == \
               [(p.start_frame, p.end_frame) for p in r_fg]
        for rp, op in zip(r_fg, o_fg):
            assert op.regression_targets == pytest.approx(rp.regression_targets)
        r_inc, r_bg = rv.get_negatives(0.3, 0.01, 0.02, 0.7)
        o_inc, o_bg = ov.get_negatives(0.3, 0.01, 0.02, 0.7)
        assert [(p.start_frame, p.end_frame) for p in o_inc] == \
               [(p.start_frame, p.end_frame) for p in r_inc]
        assert [(p.start_frame, p.end_frame) for p in o_bg] == \
               [(p.start_frame, p.end_frame) for p in r_bg]


def test_test_tick_math_matches_reference(ref, tmp_path):
    from tests.test_datasets import write_proposal_list

    from action_detection_tpu.data.ssn_dataset import SSNDataset

    prop_file = tmp_path / "props.txt"
    write_proposal_list(prop_file, n_videos=3, seed=5)

    ours = SSNDataset(str(prop_file), test_interval=6, verbose=False)

    for i, our_video in enumerate(ours.video_list):
        ref_video = ref.ssn_dataset.SSNVideoRecord(
            ref.io.load_proposal_file(str(prop_file))[i])
        ref_ds = _ref_sampler_shell(ref)
        ref_ds.transform = None  # frame generator is never consumed
        ref_ds._load_image = None
        _, r_cnt, r_rel, r_ticks, r_scaling = ref_ds.get_test_data(
            ref_video, test_interval=6)

        sample = ours.get_test_sample(i)
        assert len(sample.frame_ticks) == r_cnt
        np.testing.assert_allclose(sample.rel_props, r_rel.numpy(), atol=1e-12)
        np.testing.assert_array_equal(sample.prop_ticks, r_ticks.numpy())
        np.testing.assert_allclose(sample.prop_scaling,
                                   r_scaling.numpy().astype(np.float32),
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# NMS, TAG grouping, detection metrics (ops/sequence_funcs.py, ops/utils.py,
# ops/detection_metrics.py)
# ---------------------------------------------------------------------------

def test_temporal_nms_matches_reference_eval_convention(ref):
    from action_detection_tpu.ops.nms import temporal_nms

    rng = np.random.RandomState(4)
    dets = np.stack([rng.rand(60), rng.rand(60), rng.rand(60)], axis=1)
    dets[:, 1] = dets[:, 0] + 0.05 + 0.4 * rng.rand(60)

    kept_ref = ref.utils.temporal_nms(dets.copy(), 0.4)
    kept_ours = temporal_nms(dets, 0.4, score_col=2, duration_offset=0.0)
    np.testing.assert_allclose(kept_ours, kept_ref, atol=0)


def test_temporal_nms_matches_reference_tag_convention(ref):
    from action_detection_tpu.ops.nms import temporal_nms_tuples

    rng = np.random.RandomState(5)
    boxes = [(int(s), int(s) + int(d) + 1, 0, float(sc))
             for s, d, sc in zip(rng.randint(0, 500, 80),
                                 rng.randint(1, 120, 80), rng.rand(80))]
    kept_ref = ref.seq.temporal_nms_fallback(boxes, 0.6)
    kept_ours = temporal_nms_tuples(boxes, 0.6)
    assert kept_ours == kept_ref


def test_tag_grouping_matches_reference(ref):
    from action_detection_tpu.ops.tag import (build_box_by_search,
                                              label_frame_by_threshold)

    rng = np.random.RandomState(6)
    T, crops, C = 150, 4, 3
    scores = rng.randn(T, crops, C).astype(np.float64) * 3
    cls_lst = [0, 1]
    thresh = list(np.arange(0.095, 1.0, 0.075))

    ref_labels = ref.seq.label_frame_by_threshold(scores, cls_lst, bw=3,
                                                  thresh=thresh)
    our_labels = label_frame_by_threshold(scores, cls_lst, bw=3, thresh=thresh)
    assert len(ref_labels) == len(our_labels)
    for (rc_, rl, rs), (oc, ol, os_) in zip(ref_labels, our_labels):
        assert oc == rc_
        np.testing.assert_array_equal(ol, rl)
        np.testing.assert_allclose(os_, rs, atol=1e-12)

    tol = np.array([0.05, 0.1, 0.2, 0.3])
    ref_boxes = sorted((int(b[0]), int(b[1]), b[2], float(b[3]))
                       for b in ref.seq.build_box_by_search(ref_labels, tol))
    our_boxes = sorted(build_box_by_search(our_labels, tol))
    assert len(our_boxes) == len(ref_boxes)
    for ob, rb in zip(our_boxes, ref_boxes):
        assert ob[:3] == rb[:3]
        # score: builtin sum vs np.sum differ at ~1e-14 (summation order)
        assert ob[3] == pytest.approx(rb[3], abs=1e-9)


def test_detection_metrics_match_reference(ref):
    from action_detection_tpu.ops.iou import (get_temporal_proposal_recall,
                                              name_proposal,
                                              temporal_iou_matrix)

    rng = np.random.RandomState(7)
    gts = [(int(l), (float(s), float(s + d)))
           for l, s, d in zip(rng.randint(0, 5, 10), rng.rand(10) * 50,
                              rng.rand(10) * 20 + 1)]
    ests = [(float(s), float(s + d))
            for s, d in zip(rng.rand(25) * 60, rng.rand(25) * 25 + 0.5)]

    ref_named = ref.det.name_proposal(gts, ests)
    our_named = name_proposal(gts, ests)
    assert len(ref_named) == len(our_named)
    for rn, on in zip(ref_named, our_named):
        assert on[0] == rn[0]
        assert on[1] == pytest.approx(rn[1])
        assert on[2] == pytest.approx(rn[2])

    # pairwise IoU against the reference scalar function
    for g in gts[:4]:
        for e in ests[:4]:
            np.testing.assert_allclose(
                temporal_iou_matrix(np.array([g[1]]), np.array([e]))[0, 0],
                ref.det.temporal_iou(g[1], e), atol=1e-12)

    gt_spans = [[g[1] for g in gts[:5]], [g[1] for g in gts[5:]]]
    pr_spans = [ests[:12], ests[12:]]
    ref_recall = ref.det.get_temporal_proposal_recall(pr_spans, gt_spans, 0.3)
    our_recall = get_temporal_proposal_recall(pr_spans, gt_spans, 0.3)
    assert our_recall == pytest.approx(tuple(map(float, ref_recall)))
