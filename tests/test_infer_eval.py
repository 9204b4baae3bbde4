"""Inference scorer + detection evaluation tests (synthetic end-to-end)."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from action_detection_tpu.config import SamplingConfig
from action_detection_tpu.data.pipeline import SyntheticFrameProvider
from action_detection_tpu.data.ssn_dataset import SSNDataset
from action_detection_tpu.evaluation import (
    merge_score_dicts, generate_detections, apply_classwise_nms,
    perform_regression, evaluate_detections, format_map_table,
)
from action_detection_tpu.evaluation.detection import apply_regression
from action_detection_tpu.infer.scorer import (
    ProposalScorer, score_videos, dump_scores_pickle,
)
from action_detection_tpu.models import SSN
from action_detection_tpu.models.backbones import get_backbone
from tests.test_datasets import write_proposal_list

K = 3


@pytest.fixture(scope="module")
def scorer_setup(tmp_path_factory):
    prop_file = write_proposal_list(tmp_path_factory.mktemp("d") / "p.txt")
    ds = SSNDataset(prop_file, SamplingConfig(), test_interval=25)
    provider = SyntheticFrameProvider(width=48, height=40)
    model = SSN(num_class=K, base_model="TinyConv", dropout=0.8)
    _, _, spec = get_backbone("TinyConv", "RGB")
    frames = jnp.zeros((1, 9, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, frames,
                           jnp.ones((1, 2)), train=False)
    reg_stats = np.array([[0.05, -0.1], [0.2, 0.4]])
    return ds, provider, model, spec, variables, reg_stats


def make_scorer(setup, device=None, crops=10, keep=False):
    ds, provider, model, spec, variables, reg_stats = setup
    return ProposalScorer(model, variables["params"],
                          variables.get("batch_stats"), spec,
                          reg_stats=reg_stats, test_crops=crops,
                          chunk_frames=8, device=device)


def test_scorer_requires_reg_stats_for_regression(scorer_setup):
    """A checkpoint without reg_stats must be rejected up front (the
    reference crashes on checkpoint['reg_stats'], ssn_test.py:129) rather
    than silently emitting normalized regression scores."""
    ds, provider, model, spec, variables, reg_stats = scorer_setup
    with pytest.raises(ValueError, match="reg_stats"):
        ProposalScorer(model, variables["params"],
                       variables.get("batch_stats"), spec, reg_stats=None)
    # explicit opt-out stays available
    ProposalScorer(model, variables["params"], variables.get("batch_stats"),
                   spec, reg_stats=None, with_regression=False).close()


def test_score_video_shapes_and_padding_invariance(scorer_setup):
    ds, provider, model, spec, variables, reg_stats = scorer_setup
    scorer = make_scorer(scorer_setup)
    sample = ds.get_test_sample(0)
    out = scorer.score_video(sample, provider, keep_raw=True)
    P = sample.prop_ticks.shape[0]
    T = len(sample.frame_ticks)
    assert out.act_scores.shape == (P, K + 1)
    assert out.comp_scores.shape == (P, K)
    assert out.reg_scores.shape == (P, K, 2)
    assert out.raw_scores.shape == (T, scorer.layout.total_cols)
    assert np.isfinite(out.act_scores).all()

    # changing the chunk size (different padding) must not change results
    scorer2 = ProposalScorer(model, variables["params"],
                             variables.get("batch_stats"), spec,
                             reg_stats=reg_stats, test_crops=10,
                             chunk_frames=5)
    out2 = scorer2.score_video(sample, provider)
    np.testing.assert_allclose(out.act_scores, out2.act_scores, atol=1e-4)
    np.testing.assert_allclose(out.reg_scores, out2.reg_scores, atol=1e-4)


def test_score_video_pack_matches_per_video(scorer_setup):
    """Cross-video packed chunks must reproduce per-video scoring exactly:
    every device-program row is independent, so sharing chunks across video
    boundaries changes only the padding compute, not any score."""
    ds, provider, model, spec, variables, reg_stats = scorer_setup
    scorer = make_scorer(scorer_setup)
    samples = [ds.get_test_sample(i) for i in range(3)]
    singles = [scorer.score_video(s, provider, keep_raw=True) for s in samples]
    packed = scorer.score_video_pack(samples, provider, keep_raw=True)
    assert [o.video_id for o in packed] == [o.video_id for o in singles]
    for a, b in zip(packed, singles):
        np.testing.assert_allclose(a.act_scores, b.act_scores, atol=1e-5)
        np.testing.assert_allclose(a.comp_scores, b.comp_scores, atol=1e-5)
        np.testing.assert_allclose(a.reg_scores, b.reg_scores, atol=1e-5)
        np.testing.assert_allclose(a.raw_scores, b.raw_scores, atol=1e-5)
    # fewer chunks than per-video scoring (that's the point of packing)
    total_ticks = sum(len(s.frame_ticks) for s in samples)
    packed_chunks = -(-total_ticks // scorer.chunk_frames)
    single_chunks = sum(-(-len(s.frame_ticks) // scorer.chunk_frames)
                        for s in samples)
    assert packed_chunks <= single_chunks


def test_score_videos_pack_fanout(scorer_setup):
    ds, provider, model, spec, variables, reg_stats = scorer_setup
    res_pack = score_videos(lambda dev: make_scorer(scorer_setup, device=dev),
                            ds, provider, indices=range(3),
                            devices=jax.devices()[:2], pack=True)
    res_single = score_videos(lambda dev: make_scorer(scorer_setup, device=dev),
                              ds, provider, indices=range(3),
                              devices=jax.devices()[:2])
    assert set(res_pack) == set(res_single)
    for vid in res_pack:
        np.testing.assert_allclose(res_pack[vid].act_scores,
                                   res_single[vid].act_scores, atol=1e-5)


def test_score_video_matches_oracle_pooling(scorer_setup):
    """Device pooling of frame scores == numpy oracle on the raw score dump."""
    from tests.test_stpp import oracle_reorg_pool

    ds, provider, model, spec, variables, reg_stats = scorer_setup
    scorer = make_scorer(scorer_setup)
    sample = ds.get_test_sample(1)
    out = scorer.score_video(sample, provider, keep_raw=True)

    o_act, o_comp, o_reg = oracle_reorg_pool(
        out.raw_scores.astype(np.float64), np.asarray(sample.prop_ticks),
        np.asarray(sample.prop_scaling, np.float64), scorer.layout,
        scorer.stpp.stage_parts)
    np.testing.assert_allclose(out.act_scores, o_act, atol=1e-3)
    np.testing.assert_allclose(out.comp_scores, o_comp, atol=1e-3)
    o_reg = o_reg.reshape(-1, K, 2) * reg_stats[1] + reg_stats[0]
    np.testing.assert_allclose(out.reg_scores, o_reg, atol=1e-3)


def test_score_videos_multidevice_and_pickle(tmp_path, scorer_setup):
    ds, provider, model, spec, variables, reg_stats = scorer_setup
    results = score_videos(lambda dev: make_scorer(scorer_setup, device=dev),
                           ds, provider, devices=jax.devices()[:4])
    assert len(results) == len(ds.video_list)
    path = str(tmp_path / "scores.pkl")
    dump_scores_pickle(results, path)
    with open(path, "rb") as f:
        loaded = pickle.load(f)
    vid = ds.video_list[0].id
    assert vid in loaded and len(loaded[vid]) == 4


def test_eval_pipeline_perfect_detections(scorer_setup):
    """Synthetic scores where the GT proposal dominates => mAP 1.0."""
    ds = scorer_setup[0]
    scores = {}
    for video in ds.video_list:
        props = video.proposals
        rel = np.array([[p.start_frame / video.num_frames,
                         p.end_frame / video.num_frames] for p in props])
        act = np.full((len(props), K + 1), -5.0)
        comp = np.full((len(props), K), -5.0)
        for i, p in enumerate(props):
            if p.best_iou is not None and p.best_iou > 0.7:
                act[i, p.label] = 10.0
                comp[i, p.label - 1] = 3.0
            else:
                act[i, 0] = 10.0
        scores[video.id] = (rel, act, comp, None)

    dets = generate_detections(scores, K, top_k=0)
    dets = apply_classwise_nms(dets, 0.2)
    ap = evaluate_detections(dets, ds.get_all_gt(), K, [0.1, 0.3])
    # every GT is matched by a high-scoring overlapping proposal
    present = [c for c in range(K) if len(dets[c])]
    assert np.all(ap[present, 0] > 0.99), ap
    table = format_map_table([0.1, 0.3], ap)
    assert "mean AP" in table and "Average" in table


def test_merge_and_regression():
    rel = np.array([[0.2, 0.4]])
    act = np.array([[0.0, 1.0]])
    comp = np.array([[0.5]])
    reg = np.array([[[0.5, np.log(2.0)]]])
    s1 = {"v": (rel, act, comp, reg)}
    s2 = {"v": (rel, act * 3, comp * 3, reg * 3)}
    merged = merge_score_dicts([s1, s2], weights=[1.0, 1.0])
    np.testing.assert_allclose(merged["v"][1], act * 2)

    # regression moves center by duration*loc and scales duration by exp(dur)
    det = np.array([[0.2, 0.4, 0.9, 0.5, np.log(2.0)]])
    out = perform_regression(det)
    np.testing.assert_allclose(out[0, :2], [0.2, 0.6], atol=1e-6)

    dets_by_cls = [{"v": det}]
    out2 = apply_regression(dets_by_cls)
    np.testing.assert_allclose(out2[0]["v"], out)


def test_generate_detections_topk_mode():
    rng = np.random.RandomState(0)
    rel = np.sort(rng.rand(10, 2), axis=1)
    act = rng.randn(10, K + 1)
    comp = rng.randn(10, K)
    scores = {"v": (rel, act, comp, None)}
    dets = generate_detections(scores, K, top_k=5)
    total = sum(len(d.get("v", [])) for d in dets)
    assert total == 5


def test_sharded_frame_scorer_matches_single_device(scorer_setup):
    """Frame-axis sharding over the 8-device mesh must match unsharded scores."""
    from action_detection_tpu.infer.scorer import make_sharded_frame_scorer
    from action_detection_tpu.models import fuse_test_heads
    from action_detection_tpu.parallel import make_mesh

    ds, provider, model, spec, variables, reg_stats = scorer_setup
    kernel, bias = fuse_test_heads(variables["params"], K, (1, 1, 1))
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(32, 32, 32, 3), dtype=np.uint8)

    mesh = make_mesh()
    sharded_fn = make_sharded_frame_scorer(model, variables, kernel, bias,
                                           spec, mesh)
    sharded = np.asarray(sharded_fn(frames))

    single = np.asarray(model.apply(variables, 
        __import__("action_detection_tpu.data.transforms",
                   fromlist=["preprocess_frames"]).preprocess_frames(
            jnp.asarray(frames), spec, "RGB", 1),
        kernel, bias, method=type(model).score_frames))
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_score_videos_propagates_worker_errors(scorer_setup):
    ds, provider, model, spec, variables, reg_stats = scorer_setup

    def bad_factory(device):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        score_videos(bad_factory, ds, provider, devices=jax.devices()[:2])


def test_zero_tick_video_scores_empty(scorer_setup):
    """A video with num_frames <= new_length has an empty tick array
    (data/ssn_dataset.py:372, reachable on THUMOS shorts with Flow's
    new_length=5); the scorer must emit zero scores instead of crashing
    on jnp.concatenate([]) — mirroring cli/binary_test.py's empty entry."""
    from action_detection_tpu.data.ssn_dataset import TestSample

    ds, provider, model, spec, variables, reg_stats = scorer_setup
    scorer = make_scorer(scorer_setup)
    sample = TestSample(video_id="tiny_video",
                        frame_ticks=np.zeros((0,), np.int64),
                        num_frames=3,
                        rel_props=np.array([[0.1, 0.9], [0.2, 0.5]]),
                        prop_ticks=np.zeros((2, 4), np.int64),
                        prop_scaling=np.ones((2, 2), np.float32))
    out = scorer.score_video(sample, provider, keep_raw=True)
    assert out.act_scores.shape == (2, K + 1) and (out.act_scores == 0).all()
    assert out.comp_scores.shape == (2, K)
    assert out.reg_scores.shape == (2, K, 2)
    assert out.raw_scores.shape == (0, scorer.layout.total_cols)

    # the packed path must survive a zero-tick video mixed with normal ones
    normal = ds.get_test_sample(0)
    packed = scorer.score_video_pack([sample, normal], provider)
    assert packed[0].act_scores.shape == (2, K + 1)
    assert (packed[0].act_scores == 0).all()
    single = scorer.score_video(normal, provider)
    np.testing.assert_allclose(packed[1].act_scores, single.act_scores,
                               atol=1e-5)


def test_generate_detections_external_classifier_mode():
    """cls_score_dict mode keeps only the video's top classes (UntrimmedNets
    filter, eval_detection_results.py:130-145)."""
    rng = np.random.RandomState(1)
    rel = np.sort(rng.rand(6, 2), axis=1)
    act = rng.randn(6, K + 1)
    comp = rng.randn(6, K)
    scores = {"v": (rel, act, comp, None)}
    cls_scores = {"v": np.array([0.1, 0.9, 0.5])}
    dets = generate_detections(scores, K, top_k=0,
                               softmax_before_filter=True,
                               cls_score_dict=cls_scores, cls_top_k=1)
    # only class 1 (argmax) receives detections
    assert "v" in dets[1] and len(dets[1]["v"]) == 6
    assert "v" not in dets[0] and "v" not in dets[2]

    dets2 = generate_detections(scores, K, top_k=0,
                                softmax_before_filter=False,
                                cls_score_dict=cls_scores, cls_top_k=2)
    assert "v" in dets2[1] and "v" in dets2[2] and "v" not in dets2[0]


def test_single_crop_scoring(scorer_setup):
    """--test_crops 1 path (GroupScale + GroupCenterCrop)."""
    ds, provider, model, spec, variables, reg_stats = scorer_setup
    scorer = ProposalScorer(model, variables["params"],
                            variables.get("batch_stats"), spec,
                            reg_stats=reg_stats, test_crops=1, chunk_frames=8)
    out = scorer.score_video(ds.get_test_sample(0), provider)
    assert np.isfinite(out.act_scores).all()
    assert out.act_scores.shape[1] == K + 1


def test_multipart_pyramid_scoring(scorer_setup):
    """stpp_cfg (1,(1,2),1): train, fuse, score, pool — the general pyramid."""
    ds, provider, _, spec, _, reg_stats = scorer_setup
    cfg = (1, (1, 2), 1)
    model = SSN(num_class=K, base_model="TinyConv", dropout=0.0, stpp_cfg=cfg)
    variables = model.init({"params": jax.random.PRNGKey(2)},
                           jnp.zeros((1, 9, 32, 32, 3)), jnp.ones((1, 2)),
                           train=False)
    act, comp, reg = model.apply(variables, jnp.zeros((2, 9, 32, 32, 3)),
                                 jnp.ones((2, 2)), train=False)
    assert comp.shape == (2, K)

    scorer = ProposalScorer(model, variables["params"],
                            variables.get("batch_stats"), spec,
                            reg_stats=reg_stats, stpp_cfg=cfg,
                            test_crops=10, chunk_frames=8)
    assert scorer.layout.feat_multiplier == 5
    out = scorer.score_video(ds.get_test_sample(0), provider)
    assert out.act_scores.shape[1] == K + 1
    assert np.isfinite(out.comp_scores).all()


def test_device_oversample_matches_host_groupoversample():
    """Device 10-crop == host GroupOverSample, bit-for-bit, RGB and Flow."""
    from PIL import Image

    from action_detection_tpu.data.transforms import (
        GroupOverSample, Stack, device_oversample)

    rng = np.random.RandomState(0)
    crop = 16
    H, W = 24, 30
    # --- RGB: 3 ticks ---
    pils = [Image.fromarray(rng.randint(0, 256, (H, W, 3), dtype=np.uint8), "RGB")
            for _ in range(3)]
    host = Stack()(GroupOverSample(crop)(pils))     # (crop, crop, 10*3*3)
    n_imgs = 30
    host_arr = host.reshape(crop, crop, n_imgs, 3).transpose(2, 0, 1, 3)
    frames = np.stack([np.asarray(p, dtype=np.uint8) for p in pils])  # (3,H,W,3)
    dev = np.asarray(device_oversample(jnp.asarray(frames), crop))    # (30,c,c,3)
    np.testing.assert_array_equal(dev, host_arr)

    # --- Flow: 2 ticks x (x, y) planes ---
    pils = [Image.fromarray(rng.randint(0, 256, (H, W), dtype=np.uint8), "L")
            for _ in range(4)]  # x0 y0 x1 y1
    host = Stack()(GroupOverSample(crop)(pils))     # (crop, crop, 10*4)
    host_arr = host.reshape(crop, crop, 10, 2, 2)   # (c,c,crops,ticks,xy)
    host_arr = host_arr.transpose(2, 3, 0, 1, 4)    # (crops,ticks,c,c,xy)
    frames = np.stack([np.stack([np.asarray(pils[0]), np.asarray(pils[1])], -1),
                       np.stack([np.asarray(pils[2]), np.asarray(pils[3])], -1)])
    dev = np.asarray(device_oversample(jnp.asarray(frames), crop,
                                       modality="Flow"))
    np.testing.assert_array_equal(dev.reshape(10, 2, crop, crop, 2), host_arr)


def test_device_oversample_normed_matches_composed():
    """Fused normalize-then-crop == crop-then-normalize, bit-for-bit.

    Covers RGB (BGR roll), Flow (flip inversion of flow-x planes), RGBDiff
    (channel diffs), and a div255-style spec (InceptionV3), in f32 and bf16.
    """
    from action_detection_tpu.data.transforms import (
        device_oversample, device_oversample_normed, preprocess_frames)
    from action_detection_tpu.models.backbones import InputSpec

    rng = np.random.RandomState(7)
    crop = 16

    cases = [
        ("RGB", 1, 3, InputSpec(crop, (104.0, 117.0, 128.0), (1.0, 1.0, 1.0),
                                bgr=True, div255=False)),
        ("Flow", 2, 4, InputSpec(crop, (128.0,), (1.0,),
                                 bgr=False, div255=False)),
        ("RGBDiff", 2, 9, InputSpec(crop, (0.485, 0.456, 0.406),
                                    (0.229, 0.224, 0.225),
                                    bgr=False, div255=True)),
        ("RGB", 1, 3, InputSpec(crop, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5),
                                bgr=False, div255=True)),
    ]
    for modality, new_length, C, spec in cases:
        frames = jnp.asarray(rng.randint(0, 256, (3, 24, 30, C),
                                         dtype=np.uint8))
        for dtype in (None, jnp.bfloat16):
            composed = preprocess_frames(
                device_oversample(frames, crop, modality), spec, modality,
                new_length, dtype=dtype)
            fused = device_oversample_normed(frames, spec, modality,
                                             new_length, crop, dtype=dtype)
            np.testing.assert_array_equal(
                np.asarray(fused), np.asarray(composed),
                err_msg=f"{modality} dtype={dtype}")


def test_device_crops_scorer_matches_host_crops(scorer_setup):
    """ProposalScorer(device_crops) == host 10-crop path on the same video."""
    ds, provider, model, spec, variables, reg_stats = scorer_setup
    host_scorer = ProposalScorer(model, variables["params"],
                                 variables.get("batch_stats"), spec,
                                 reg_stats=reg_stats, test_crops=10,
                                 chunk_frames=8, device_crops=False)
    dev_scorer = ProposalScorer(model, variables["params"],
                                variables.get("batch_stats"), spec,
                                reg_stats=reg_stats, test_crops=10,
                                chunk_frames=8, device_crops=True)
    sample = ds.get_test_sample(1)
    out_h = host_scorer.score_video(sample, provider)
    out_d = dev_scorer.score_video(sample, provider)
    np.testing.assert_allclose(out_d.act_scores, out_h.act_scores, atol=2e-5)
    np.testing.assert_allclose(out_d.comp_scores, out_h.comp_scores, atol=2e-5)
    np.testing.assert_allclose(out_d.reg_scores, out_h.reg_scores, atol=2e-5)
