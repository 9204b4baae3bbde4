"""Shared-stem 10-crop scoring: geometry, exactness where exact, bounds where
approximate, and the end-to-end detection-metric bound.

The shared-stem path (bn_inception_int8.bninception_int8_e2e_features_sharedstem)
runs the stem once per frame+flip and slices the 10 crop windows on the
stride-8 trunk-input grid. It is approximate by construction — crop offsets
snap to the grid and window-border cells see real neighboring pixels instead
of per-crop zero padding — so, like int8 itself, it ships with an end-to-end
mAP bound (reference behavior being approximated: ssn_test.py:78-86 10-crop
oversample + crop-mean).
"""

import numpy as np
import pytest

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from action_detection_tpu.data.transforms import (device_normed_pair,
                                                  device_oversample_normed,
                                                  fill_fix_offset)
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.bn_inception import stem_feature_hw
from action_detection_tpu.models.backbones.bn_inception_int8 import (
    _e2e_stem_quantized, bninception_int8_e2e_features,
    bninception_int8_e2e_features_sharedstem, calibrate_e2e)

from tests.test_int8 import backbone_setup  # noqa: F401  (module fixture)
from tests.test_int8_iv3 import iv3_setup  # noqa: F401  (module fixture)


def test_stem_feature_hw():
    """Trunk-input sizes for the stride-8 stem (conv1 s2 + 2 ceil pools)."""
    assert stem_feature_hw(224) == 28
    assert stem_feature_hw(256) == 32
    assert stem_feature_hw(340) == 42
    assert stem_feature_hw(96) == 12
    assert stem_feature_hw(64) == 8


def _calibrated(backbone_setup, frames, cs, modality="RGB", new_length=1):
    backbone, variables = backbone_setup
    _, _, spec = get_backbone("BNInception", modality)
    crops = device_oversample_normed(jnp.asarray(frames), spec, modality,
                                     new_length, crop_size=cs)
    qe = calibrate_e2e(variables["params"], variables.get("batch_stats", {}),
                       crops[:4])
    return spec, crops, qe


def test_sharedstem_interior_cells_exact(backbone_setup):
    """With 8-aligned crop offsets, stem-window cells away from the crop
    border are BIT-IDENTICAL (int8) between the full-frame stem and the
    per-crop stem — the conv/pool grids align; only border cells differ
    (real neighbors vs the per-crop zero padding). Pins the snapping and
    mirror-offset math against an independently computed slicing."""
    rng = np.random.RandomState(0)
    H, W, cs = 128, 160, 96          # (W-cs)//4 = 16, (H-cs)//4 = 8: aligned
    frames = rng.randint(0, 256, size=(2, H, W, 3), dtype=np.uint8)
    spec, crops, qe = _calibrated(backbone_setup, frames, cs)

    xn, flip_src = device_normed_pair(jnp.asarray(frames), spec, "RGB", 1)
    stem_full = np.asarray(_e2e_stem_quantized(
        qe, jnp.concatenate([xn, jnp.flip(flip_src, axis=2)], axis=0)))
    stem_crops = np.asarray(_e2e_stem_quantized(qe, crops))

    N = frames.shape[0]
    fc = stem_feature_hw(cs)
    m = 2                            # stem receptive field 27px -> 2 cells
    for k, (o_w, o_h) in enumerate(fill_fix_offset(False, W, H, cs, cs)):
        assert o_w % 8 == 0 and o_h % 8 == 0, (o_w, o_h)
        fx, fy = o_w // 8, o_h // 8
        win = stem_full[:N, fy:fy + fc, fx:fx + fc, :]
        ref = stem_crops[2 * k * N:(2 * k + 1) * N]
        np.testing.assert_array_equal(win[:, m:-m, m:-m], ref[:, m:-m, m:-m])
        # flipped crop: mirrored offset into the flipped frame's stem
        mx = (W - cs - o_w) // 8
        winf = stem_full[N:, fy:fy + fc, mx:mx + fc, :]
        reff = stem_crops[(2 * k + 1) * N:(2 * k + 2) * N]
        np.testing.assert_array_equal(winf[:, m:-m, m:-m],
                                      reff[:, m:-m, m:-m])


def test_sharedstem_features_close(backbone_setup):
    """Unaligned geometry (offsets snap by up to 4px): crop-mean features —
    what the scorer consumes — agree with the per-crop path. Random weights
    + random pixels is the worst case (no spatial coherence)."""
    rng = np.random.RandomState(1)
    H, W, cs = 128, 168, 96          # w_step=18 -> offsets 0,72,36: 36/8=4.5
    frames = rng.randint(0, 256, size=(3, H, W, 3), dtype=np.uint8)
    spec, crops, qe = _calibrated(backbone_setup, frames, cs)

    xn, flip_src = device_normed_pair(jnp.asarray(frames), spec, "RGB", 1)
    ref = np.asarray(bninception_int8_e2e_features(qe, crops), np.float64)
    got = np.asarray(bninception_int8_e2e_features_sharedstem(
        qe, xn, flip_src, cs), np.float64)
    assert got.shape == ref.shape == (30, 1024)

    rm = ref.reshape(10, 3, -1).mean(0)
    gm = got.reshape(10, 3, -1).mean(0)
    cos = np.mean([np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
                   for a, b in zip(rm, gm)])
    rel = np.linalg.norm(gm - rm) / (np.linalg.norm(rm) + 1e-12)
    assert cos > 0.995, cos          # measured 0.99993
    assert rel < 0.05, rel           # measured 0.013


def test_sharedstem_percrop_layout(backbone_setup):
    """Per-CROP correspondence, not just crop-mean: binary_test keeps the
    (frames, crops, K) per-crop pickle (reference binary_test.py:84-94), so
    the sharedstem features must be crop-major in exactly
    device_oversample_normed's [o0, o0-flip, o1, o1-flip, ...] order.

    Discriminativeness is engineered, not hoped for: (a) frames are
    high-contrast 16px random tiles, so each crop window pools genuinely
    different content (uniform-random pixels make all windows statistically
    identical — global-pooled features were ~0.999-correlated across crops
    and the margin sat in cross-host float noise); (b) cosine is computed on
    CENTERED features (per-tick mean over crops removed), which strips the
    shared component that dominates raw cosine. Measured on this fixture:
    matched min 0.78, worst matched-vs-best-mismatched margin 0.36 — the
    0.12 assertion has 3x headroom and is ~1000x above float noise. A
    permuted or (ticks, crops)-transposed layout drives matched cells
    negative and fails hard."""
    rng = np.random.RandomState(7)
    H, W, cs = 128, 160, 96          # 8-aligned offsets -> interior exact
    N = 3
    tiles = rng.randint(0, 256, size=(N, H // 16 + 1, W // 16 + 1, 3))
    frames = (tiles.repeat(16, axis=1).repeat(16, axis=2)[:, :H, :W]
              .astype(np.uint8))
    spec, crops, qe = _calibrated(backbone_setup, frames, cs)

    xn, flip_src = device_normed_pair(jnp.asarray(frames), spec, "RGB", 1)
    ref = np.asarray(bninception_int8_e2e_features(qe, crops),
                     np.float64).reshape(10, N, -1)
    got = np.asarray(bninception_int8_e2e_features_sharedstem(
        qe, xn, flip_src, cs), np.float64).reshape(10, N, -1)

    # centered cosine: remove the per-tick mean over crops (the component
    # every crop of a frame shares) so only layout-identifying structure
    # enters the comparison
    refc = ref - ref.mean(axis=0, keepdims=True)
    gotc = got - got.mean(axis=0, keepdims=True)

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    matched = np.array([[cos(refc[c, n], gotc[c, n])
                         for n in range(N)] for c in range(10)])
    # every (crop, tick) cell pairs with its own counterpart (measured 0.78+)
    assert matched.min() > 0.6, matched.min()
    # ...and beats pairing with any OTHER crop of the same tick by a margin
    # far outside float noise (measured worst margin 0.36)
    for n in range(N):
        for c in range(10):
            others = [cos(refc[c2, n], gotc[c, n]) for c2 in range(10)
                      if c2 != c]
            assert matched[c, n] > max(others) + 0.12, (
                c, n, matched[c, n], max(others))


def test_sharedstem_flow_modality(backbone_setup):
    """Flow (new_length=5, 10-channel stacks): the flip inversion rides in
    flip_src; shared-stem tracks the per-crop path."""
    backbone, variables = backbone_setup
    rng = np.random.RandomState(2)
    H, W, cs = 128, 160, 96
    frames = rng.randint(0, 256, size=(2, H, W, 10), dtype=np.uint8)
    _, _, spec = get_backbone("BNInception", "Flow")
    crops = device_oversample_normed(jnp.asarray(frames), spec, "Flow", 5,
                                     crop_size=cs)
    # the module fixture's backbone is RGB (C=3); rebuild a 10-ch variables
    flow_bb, _, _ = get_backbone("BNInception", "Flow", new_length=5)
    fv = flow_bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 10)))
    qe = calibrate_e2e(fv["params"], fv.get("batch_stats", {}), crops[:4])

    xn, flip_src = device_normed_pair(jnp.asarray(frames), spec, "Flow", 5)
    ref = np.asarray(bninception_int8_e2e_features(qe, crops), np.float64)
    got = np.asarray(bninception_int8_e2e_features_sharedstem(
        qe, xn, flip_src, cs), np.float64)
    rm = ref.reshape(10, 2, -1).mean(0)
    gm = got.reshape(10, 2, -1).mean(0)
    cos = np.mean([np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
                   for a, b in zip(rm, gm)])
    assert np.isfinite(gm).all()
    assert cos > 0.995, cos


def test_sharedstem_iv3(iv3_setup):  # noqa: F811
    """InceptionV3 shared-stem: VALID semantics make 8-aligned windows
    nearly exact (only Conv2d_2b's SAME border differs); crop-mean features
    track the per-crop int8-e2e path."""
    from action_detection_tpu.models.backbones.inception_v3_int8 import (
        calibrate_e2e_iv3, inception_v3_int8_e2e_features,
        inception_v3_int8_e2e_features_sharedstem, iv3_stem_feature_hw)

    assert iv3_stem_feature_hw(299) == 35

    backbone, variables = iv3_setup
    rng = np.random.RandomState(3)
    H, W, cs = 128, 160, 96
    frames = rng.randint(0, 256, size=(2, H, W, 3), dtype=np.uint8)
    _, _, spec = get_backbone("InceptionV3", "RGB")
    crops = device_oversample_normed(jnp.asarray(frames), spec, "RGB", 1,
                                     crop_size=cs)
    qe = calibrate_e2e_iv3(variables["params"],
                           variables.get("batch_stats", {}), crops[:4])
    xn, flip_src = device_normed_pair(jnp.asarray(frames), spec, "RGB", 1)
    ref = np.asarray(inception_v3_int8_e2e_features(qe, crops), np.float64)
    got = np.asarray(inception_v3_int8_e2e_features_sharedstem(
        qe, xn, flip_src, cs), np.float64)
    assert got.shape == ref.shape == (20, 2048)
    rm = ref.reshape(10, 2, -1).mean(0)
    gm = got.reshape(10, 2, -1).mean(0)
    cos = np.mean([np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
                   for a, b in zip(rm, gm)])
    assert np.isfinite(gm).all()
    assert cos > 0.995, cos


def test_sharedstem_production_geometry(backbone_setup):
    """TRUE production geometry — 256x340 scale frames, 224 crop (THUMOS
    ssn_test shapes): crop-mean int8-e2e features from the shared stem track
    the per-crop path at the bounds the production default relies on.
    The 10-crop offsets here are the real deployed ones ((0,116,58)x(0,32,16);
    58 and 116 snap by 2-4px, the rest are 8-aligned)."""
    rng = np.random.RandomState(4)
    H, W, cs = 256, 340, 224
    frames = rng.randint(0, 256, size=(1, H, W, 3), dtype=np.uint8)
    spec, crops, qe = _calibrated(backbone_setup, frames, cs)

    xn, flip_src = device_normed_pair(jnp.asarray(frames), spec, "RGB", 1)
    ref = np.asarray(bninception_int8_e2e_features(qe, crops), np.float64)
    got = np.asarray(bninception_int8_e2e_features_sharedstem(
        qe, xn, flip_src, cs), np.float64)
    assert got.shape == ref.shape == (10, 1024)

    rm = ref.mean(0)
    gm = got.mean(0)
    cos = np.dot(rm, gm) / (np.linalg.norm(rm) * np.linalg.norm(gm) + 1e-12)
    rel = np.linalg.norm(gm - rm) / (np.linalg.norm(rm) + 1e-12)
    assert cos > 0.999, cos          # measured on chip: 0.99993
    assert rel < 0.04, rel           # measured on chip: 0.013


def test_sharedstem_scorer_validation():
    """shared_stem=True demands device 10-crop + int8-e2e + a wired backbone."""
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN

    model = SSN(num_class=3, base_model="BNInception", dropout=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                           train=False)
    _, _, spec = get_backbone("BNInception", "RGB")
    rs = np.array([[0.0, 0.0], [1.0, 1.0]])
    with pytest.raises(ValueError, match="shared_stem"):
        ProposalScorer(model, variables["params"], variables.get("batch_stats"),
                       spec, reg_stats=rs, test_crops=1, quantize="e2e",
                       shared_stem=True)
    with pytest.raises(ValueError, match="shared_stem"):
        ProposalScorer(model, variables["params"], variables.get("batch_stats"),
                       spec, reg_stats=rs, test_crops=10, device_crops=True,
                       quantize=False, shared_stem=True)


def test_sharedstem_end_to_end_detection_bound():
    """Shared-stem's DETECTION-metric bound, the int8 treatment applied:
    both arms run the full 10-crop device-crops stack (ProposalScorer ->
    detections -> NMS -> regression -> mAP) on the color-coded real-detector
    fixture; the isolated shared-stem effect (vs the per-crop int8-e2e
    10-crop arm) must leave mAP unchanged (< 0.5 point, same bound as int8).

    The fixture's tiny geometry AMPLIFIES the approximation far beyond
    production: 64px crops give 8x8 stem windows where the 2-cell border
    ring (the only inexact cells under aligned offsets) is 75% of the
    window, vs 27% at the production 224 crop (28x28 window), and its 4px
    offsets snap by half a stem cell. The combined-score bound here is
    therefore looser than int8's 0.12 (measured 0.25 at this geometry);
    production-geometry score agreement is pinned at true 256x340/224 shapes
    in test_sharedstem_production_geometry below and measured on chip in
    scripts/sharedstem_probe.py. The mAP bound — the metric users consume —
    must hold even under this amplification."""
    import os
    import tempfile

    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.data.ssn_dataset import SSNDataset
    from action_detection_tpu.evaluation import (apply_classwise_nms,
                                                 apply_regression,
                                                 evaluate_detections,
                                                 generate_detections)
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.ops.metrics import softmax
    from tests.test_int8 import (DET_K, ColorCodedProvider,
                                 build_color_detector,
                                 detection_calibration_frames,
                                 write_detection_fixture)

    K = DET_K
    model, params, batch_stats, small, reg_stats = build_color_detector()

    with tempfile.TemporaryDirectory() as d:
        pf, gt_by = write_detection_fixture(os.path.join(d, "p.txt"),
                                            n_videos=2)
        ds = SSNDataset(pf, SamplingConfig(), test_interval=40)
        provider = ColorCodedProvider(gt_by)
        calib = detection_calibration_frames()

        results = {}
        for tag, shared in (("percrop", False), ("shared", True)):
            scorer = ProposalScorer(model, params, batch_stats or None,
                                    small, reg_stats=reg_stats, num_class=K,
                                    test_crops=10, chunk_frames=4,
                                    device_crops=True, quantize="e2e",
                                    calibration_frames=calib,
                                    shared_stem=shared)
            assert scorer.shared_stem == shared
            scored = {}
            for i in range(len(ds.video_list)):
                out = scorer.score_video(ds.get_test_sample(i), provider)
                scored[out.video_id] = out.as_tuple()
            results[tag] = scored

        all_gt = ds.get_all_gt()
        maps = {}
        for tag in results:
            dets = generate_detections(results[tag], K, top_k=0,
                                       softmax_before_filter=True)
            dets = apply_classwise_nms(dets, 0.2)
            dets = apply_regression(dets)
            ap = evaluate_detections(dets, all_gt, K,
                                     np.arange(0.1, 1.0, 0.1), workers=2)
            maps[tag] = float(ap.mean())
        assert maps["percrop"] > 0.8, maps
        assert abs(maps["shared"] - maps["percrop"]) < 0.005, maps

        max_norm_delta = 0.0
        for vid in results["percrop"]:
            _, act_f, comp_f, _ = results["percrop"][vid]
            _, act_q, comp_q, _ = results["shared"][vid]
            comb_f = softmax(act_f)[:, 1:] * np.exp(comp_f)
            comb_q = softmax(act_q)[:, 1:] * np.exp(comp_q)
            max_norm_delta = max(max_norm_delta, float(
                np.abs(comb_q - comb_f).max() / comb_f.max()))
        # geometry-amplified bound (see docstring); production bound is the
        # 224-crop test below + the on-chip probe
        assert max_norm_delta < 0.30, max_norm_delta
