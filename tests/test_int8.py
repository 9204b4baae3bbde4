"""Int8 quantized BNInception: BN folding exactness + quantized-path accuracy."""

import numpy as np
import pytest

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.bn_inception_int8 import (
    bninception_int8_features, fold_bn, quantize_backbone,
)


@pytest.fixture(scope="module")
def backbone_setup():
    backbone, _, _ = get_backbone("BNInception", "RGB")
    variables = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # realistic-ish BN stats (init stats are 0-mean/1-var identities)
    rng = np.random.RandomState(0)

    def jitter(tree, scale_leaf):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jnp.asarray(scale_leaf(p, np.asarray(x), rng)), tree)

    def stats_leaf(path, x, rng):
        leaf = path[-1].key
        if leaf == "mean":
            return (0.05 * rng.randn(*x.shape)).astype(np.float32)
        return (1.0 + 0.3 * rng.rand(*x.shape)).astype(np.float32)

    def param_leaf(path, x, rng):
        leaf = path[-1].key
        name = path[-2].key if len(path) >= 2 else ""
        if name.endswith("_bn"):
            if leaf == "scale":
                return (1.0 + 0.1 * rng.randn(*x.shape)).astype(np.float32)
            return (0.05 * rng.randn(*x.shape)).astype(np.float32)
        return np.asarray(x)

    variables = {"params": jitter(variables["params"], param_leaf),
                 "batch_stats": jitter(variables["batch_stats"], stats_leaf)}
    return backbone, variables


def test_fold_bn_is_exact(backbone_setup):
    """Conv+BN == folded conv, layer by layer (the stem conv checked directly)."""
    backbone, variables = backbone_setup
    folded = fold_bn(variables["params"], variables["batch_stats"])
    assert "conv1_7x7_s2" in folded and "inception_3a_1x1" in folded

    p = variables["params"]["conv1_7x7_s2"]
    bn = variables["params"]["conv1_7x7_s2_bn"]
    st = variables["batch_stats"]["conv1_7x7_s2_bn"]
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))

    ref = jax.lax.conv_general_dilated(x, p["kernel"], (2, 2), ((3, 3), (3, 3)),
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref + p["bias"]
    ref = (ref - st["mean"]) * bn["scale"] / jnp.sqrt(st["var"] + 1e-5) + bn["bias"]

    f = folded["conv1_7x7_s2"]
    got = jax.lax.conv_general_dilated(x, jnp.asarray(f["kernel"]), (2, 2),
                                       ((3, 3), (3, 3)),
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = got + jnp.asarray(f["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_features_close_to_float(backbone_setup):
    """Quantized features track the f32 reference closely (cos > 0.995)."""
    backbone, variables = backbone_setup
    q = quantize_backbone(variables["params"], variables["batch_stats"])

    rng = np.random.RandomState(2)
    # image-scale inputs (the real scorer feeds mean-subtracted 0-255 frames)
    x = (rng.rand(2, 64, 64, 3).astype(np.float32) * 255.0 - 117.0)

    ref = np.asarray(backbone.apply(variables, jnp.asarray(x))).astype(np.float64)
    got = np.asarray(bninception_int8_features(q, jnp.asarray(x))).astype(np.float64)
    assert got.shape == ref.shape == (2, 1024)
    assert np.isfinite(got).all()

    for r, g in zip(ref, got):
        cos = float(np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9))
        assert cos > 0.995, cos
    rel_rms = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9))
    assert rel_rms < 0.08, rel_rms


def test_calibrated_static_scales_match_dynamic(backbone_setup):
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        calibrate_activation_scales)

    backbone, variables = backbone_setup
    q = quantize_backbone(variables["params"], variables["batch_stats"])
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255.0 - 117.0)
    scales = calibrate_activation_scales(q, x)
    assert len(scales) == 69  # every conv layer calibrated
    dyn = np.asarray(bninception_int8_features(q, x))
    stat = np.asarray(bninception_int8_features(q, x, act_scales=scales))
    # calibrated on the same batch -> identical scales -> near-identical out
    rel = np.linalg.norm(stat - dyn) / (np.linalg.norm(dyn) + 1e-9)
    assert rel < 0.05, rel


def test_int8_e2e_features_close_to_float(backbone_setup):
    """End-to-end int8 activations track f32 features (per-input-channel
    scale folding keeps per-branch precision through the concats)."""
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        bninception_int8_e2e_features, calibrate_e2e)

    backbone, variables = backbone_setup
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255.0 - 117.0)
    qe = calibrate_e2e(variables["params"], variables["batch_stats"], x)
    assert qe["__feat_scale__"].shape == (1024,)

    ref = np.asarray(backbone.apply(variables, x)).astype(np.float64)
    got = np.asarray(bninception_int8_e2e_features(qe, x)).astype(np.float64)
    assert got.shape == ref.shape == (2, 1024)
    assert np.isfinite(got).all()
    for r, g in zip(ref, got):
        cos = float(np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9))
        assert cos > 0.99, cos
    rel_rms = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9))
    assert rel_rms < 0.12, rel_rms


def test_entry_fusion_bit_exact(backbone_setup):
    """The default fused branch-entry path (__entry__) is BIT-identical to
    running each module's entry 1x1 convs separately: they share the input
    (hence its per-channel scale folding), accumulate in s32, and the
    requantizing epilogue is per output channel — so one conv over the
    concatenated weights followed by a split changes nothing numerically.
    scripts/entryfuse_probe.py adopted it on this basis (26.6 -> 24.8 ms
    headline feature step on one v5e; the no-concat escalation lost 1.7x
    there and was rejected)."""
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        bninception_int8_e2e_features, calibrate_e2e)

    backbone, variables = backbone_setup
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255.0 - 117.0)
    qe = calibrate_e2e(variables["params"], variables["batch_stats"], x)
    assert "__entry__" in qe
    unfused = {k: v for k, v in qe.items() if k != "__entry__"}
    fused_feats = np.asarray(bninception_int8_e2e_features(qe, x))
    plain_feats = np.asarray(bninception_int8_e2e_features(unfused, x))
    assert np.array_equal(fused_feats, plain_feats)


def test_int8_e2e_flow_modality(backbone_setup):
    """ssn_test defaults int8-e2e on for Flow runs too: the quantizer must
    handle the 10-channel Flow conv1 (ssn_models.py:318-343 surgery) and
    flow-normalized inputs (mean 128, no BGR) at the same accuracy bound."""
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        bninception_int8_e2e_features, calibrate_e2e)

    backbone, _, spec = get_backbone("BNInception", "Flow")
    assert spec.mean == (128.0,)
    variables = backbone.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 10)))
    rng = np.random.RandomState(7)

    # reuse the module fixture's realistic BN jitter on the Flow param tree
    _, rgb_vars = backbone_setup
    jittered = {"params": dict(variables["params"]),
                "batch_stats": dict(variables["batch_stats"])}
    for col in ("params", "batch_stats"):
        for name, leaf in rgb_vars[col].items():
            if name != "conv1_7x7_s2":  # all but the surgered stem conv match
                jittered[col][name] = leaf
    k = np.asarray(variables["params"]["conv1_7x7_s2"]["kernel"])
    jittered["params"]["conv1_7x7_s2"] = {
        "kernel": jnp.asarray(0.05 * rng.randn(*k.shape).astype(np.float32)),
        "bias": jnp.asarray(0.01 * rng.randn(64).astype(np.float32)),
    }
    variables = jittered

    # flow-normalized inputs: uint8-scale stacked flow fields minus mean 128
    x = jnp.asarray(rng.rand(2, 64, 64, 10).astype(np.float32) * 255.0 - 128.0)
    qe = calibrate_e2e(variables["params"], variables["batch_stats"], x)

    ref = np.asarray(backbone.apply(variables, x)).astype(np.float64)
    got = np.asarray(bninception_int8_e2e_features(qe, x)).astype(np.float64)
    assert got.shape == ref.shape == (2, 1024)
    assert np.isfinite(got).all()
    for r, g in zip(ref, got):
        cos = float(np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9))
        assert cos > 0.99, cos
    rel_rms = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9))
    assert rel_rms < 0.12, rel_rms


def test_int8_e2e_lazy_calibration(backbone_setup):
    """ProposalScorer e2e mode without calibration_frames calibrates on the
    first chunk and scores finitely."""
    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.data.pipeline import SyntheticFrameProvider
    from action_detection_tpu.data.ssn_dataset import SSNDataset
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN
    from tests.test_datasets import write_proposal_list
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        prop_file = write_proposal_list(os.path.join(d, "p.txt"), n_videos=1)
        ds = SSNDataset(prop_file, SamplingConfig(), test_interval=60)
        provider = SyntheticFrameProvider(width=80, height=72)
        model = SSN(num_class=3, base_model="BNInception", dropout=0.0)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                               train=False)
        _, _, spec = get_backbone("BNInception", "RGB")
        scorer = ProposalScorer(model, variables["params"],
                                variables.get("batch_stats"), spec,
                                reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                                test_crops=1, chunk_frames=4, quantize="e2e")
        scorer.input_spec = spec.__class__(64, spec.mean, spec.std, spec.bgr,
                                           spec.div255)
        assert scorer._quantized is None
        out = scorer.score_video(ds.get_test_sample(0), provider)
        assert scorer._quantized is not None
        assert np.isfinite(out.act_scores).all()

        # the 10-crop device-crops path feeds SCALE-size frames (odd dims
        # after rescale, e.g. 73x87 here) to _score_chunk: calibration must
        # cut crops first — a raw backbone call on odd dims crashes in the
        # stride-2 modules (regression for a bug found driving the real path)
        scorer10 = ProposalScorer(model, variables["params"],
                                  variables.get("batch_stats"), spec,
                                  reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                                  test_crops=10, chunk_frames=4,
                                  device_crops=True, quantize="e2e")
        scorer10.input_spec = spec.__class__(64, spec.mean, spec.std,
                                             spec.bgr, spec.div255)
        out10 = scorer10.score_video(ds.get_test_sample(0), provider)
        assert scorer10._quantized is not None
        assert np.isfinite(out10.act_scores).all()


def test_int8_scorer_end_to_end(backbone_setup):
    """ProposalScorer(quantize=True) scores a synthetic video."""
    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.data.pipeline import SyntheticFrameProvider
    from action_detection_tpu.data.ssn_dataset import SSNDataset
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN
    from tests.test_datasets import write_proposal_list
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        prop_file = write_proposal_list(os.path.join(d, "p.txt"), n_videos=1)
        ds = SSNDataset(prop_file, SamplingConfig(), test_interval=60)
        provider = SyntheticFrameProvider(width=80, height=72)
        model = SSN(num_class=3, base_model="BNInception", dropout=0.0)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                               train=False)
        rng = np.random.RandomState(0)
        calib = rng.randint(0, 256, size=(4, 64, 64, 3), dtype=np.uint8)
        _, _, spec = get_backbone("BNInception", "RGB")
        scorer = ProposalScorer(model, variables["params"],
                                variables.get("batch_stats"), spec,
                                reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                                test_crops=1, chunk_frames=4,
                                quantize=True, calibration_frames=calib)
        # input spec says 224 crops; use tiny transform via spec override
        scorer.input_spec = spec.__class__(64, spec.mean, spec.std, spec.bgr,
                                           spec.div255)
        out = scorer.score_video(ds.get_test_sample(0), provider)
        assert np.isfinite(out.act_scores).all()


DET_K = 3
DET_PAL = {0: (110, 110, 110), 1: (200, 60, 60), 2: (60, 200, 60),
           3: (60, 60, 200)}


class ColorCodedProvider:
    """Frames carry a class-coded color inside GT segments (+- noise)."""

    modality = "RGB"

    def __init__(self, gt, height=72, width=80):
        self.gt = gt
        self.height, self.width = height, width

    def load(self, vid, idx):
        import zlib

        from PIL import Image

        lab = 0
        for l, a, b in self.gt[vid]:
            if a <= idx <= b:
                lab = l
                break
        r = np.random.RandomState(zlib.crc32(f"{vid}/{int(idx)}".encode()))
        arr = np.clip(np.asarray(DET_PAL[lab], np.int16)
                      + r.randint(-12, 13,
                                  size=(self.height, self.width, 3)), 0, 255)
        return [Image.fromarray(arr.astype(np.uint8), "RGB")]


def write_detection_fixture(path, n_videos=3, frames=600):
    """Proposal list with GT + fg/incomplete/bg proposals per video."""
    K = DET_K
    gt_by, lines = {}, []
    for v in range(n_videos):
        vid = f"video_{v}"
        gt = [(1 + v % K, 100, 300), (1 + (v + 1) % K, 400, 520)]
        gt_by[vid] = gt
        props = []
        for g in gt:
            props.append((g[0], 0.85, 0.9, g[1] - 20, g[2] + 5))
            props.append((g[0], 0.75, 0.95, g[1] + 5, g[2] - 15))
            props.append((g[0], 0.2, 0.9, g[1] + 30, g[1] + 110))
        props += [(0, 0.0, 0.0, 530, 595), (0, 0.005, 0.0, 10, 90)]
        lines.append(f"# {v}\n{vid}\n{frames}\n1\n{len(gt)}\n")
        lines += [f"{g[0]} {g[1]} {g[2]}\n" for g in gt]
        lines.append(f"{len(props)}\n")
        lines += [f"{p[0]} {p[1]:.4f} {p[2]:.4f} {p[3]} {p[4]}\n"
                  for p in props]
    with open(path, "w") as f:
        f.writelines(lines)
    return path, gt_by


def build_color_detector():
    """A REAL detector without training: the activity head is the exact
    interpolator of the class-mean backbone features (lstsq) and the
    completeness head is 2*course - start - end over the STPP parts.
    Returns (model, params, batch_stats, small_spec, reg_stats) — f32 mAP is
    ~0.89 on the write_detection_fixture videos."""
    from action_detection_tpu.data.transforms import preprocess_frames
    from action_detection_tpu.models import SSN

    K = DET_K
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0)
    hv = model.init({"params": jax.random.PRNGKey(1)},
                    jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                    train=False)
    params = dict(hv["params"])
    batch_stats = dict(hv.get("batch_stats") or {})
    backbone, _, base = get_backbone("BNInception", "RGB")
    small = base.__class__(64, base.mean, base.std, base.bgr, base.div255)
    bvars = {"params": params["backbone"]}
    if "backbone" in batch_stats:
        bvars["batch_stats"] = batch_stats["backbone"]

    # class-mean features -> exact-interpolation activity head
    mu = []
    for lab in range(K + 1):
        imgs = [np.clip(np.asarray(DET_PAL[lab], np.int16)
                        + np.random.RandomState(lab * 100 + i)
                        .randint(-12, 13, size=(64, 64, 3)), 0, 255)
                .astype(np.uint8) for i in range(4)]
        x = preprocess_frames(jnp.asarray(np.stack(imgs)), small, "RGB", 1)
        mu.append(np.asarray(backbone.apply(bvars, x)).mean(0))
    mu = np.stack(mu).astype(np.float64)
    A = np.concatenate([mu, np.ones((K + 1, 1))], 1)
    t_act = -4 * np.ones((K + 1, K + 1))
    np.fill_diagonal(t_act, 4.0)
    sol = np.linalg.lstsq(A, t_act, rcond=None)[0]
    params["activity_fc"] = {"kernel": jnp.asarray(sol[:-1], jnp.float32),
                             "bias": jnp.asarray(sol[-1], jnp.float32)}
    t_comp = -2 * np.ones((K + 1, K))
    for c in range(1, K + 1):
        t_comp[c, c - 1] = 2.0
    wc = np.linalg.lstsq(A, t_comp, rcond=None)[0][:-1]
    params["completeness_fc"] = {
        "kernel": jnp.asarray(np.concatenate([-wc, 2 * wc, -wc]), jnp.float32),
        "bias": jnp.zeros(K)}
    params["regressor_fc"] = {"kernel": jnp.zeros((3 * 1024, 2 * K)),
                              "bias": jnp.zeros(2 * K)}
    reg_stats = np.array([[0.0, 0.0], [0.05, 0.05]], np.float32)
    return model, params, batch_stats, small, reg_stats


def detection_calibration_frames(size=64, per_class=3, seed=9):
    """Calibration frames spanning every class's activation range
    (multi-video calibration; one-color calibration under-covers)."""
    r = np.random.RandomState(seed)
    return np.stack([
        np.clip(np.asarray(DET_PAL[lab], np.int16)
                + r.randint(-12, 13, size=(size, size, 3)), 0, 255)
        .astype(np.uint8)
        for lab in range(DET_K + 1) for _ in range(per_class)])


def test_int8_end_to_end_detection_bound():
    """Int8's DETECTION-metric error bound (VERDICT r2 item 3).

    The fixture detector (build_color_detector) has realistic score
    separation — the regime where an int8-vs-f32 mAP delta is meaningful
    (with near-tied random scores the delta only measures tie shuffling;
    measured and rejected).

    All arms run the full CLI stack (ProposalScorer -> detections -> NMS ->
    regression -> mAP, multi-video-style calibration frames): the combined
    score delta is bounded and the mAP delta must be < 0.5 mAP point.
    """
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

    K = DET_K
    model, params, batch_stats, small, reg_stats = build_color_detector()
    base = get_backbone("BNInception", "RGB")[2]

    with tempfile.TemporaryDirectory() as d:
        pf, gt_by = write_detection_fixture(os.path.join(d, "p.txt"))
        ds = SSNDataset(pf, SamplingConfig(), test_interval=40)
        provider = ColorCodedProvider(gt_by)
        calib = detection_calibration_frames()

        results = {}
        for tag, q, c in (("f32", False, None),
                          ("perlayer", "perlayer", calib),
                          ("e2e", "e2e", calib)):
            scorer = ProposalScorer(model, params, batch_stats or None, base,
                                    reg_stats=reg_stats, num_class=K,
                                    test_crops=1, chunk_frames=4,
                                    quantize=q, calibration_frames=c)
            scorer.input_spec = small
            scored = {}
            for i in range(len(ds.video_list)):
                out = scorer.score_video(ds.get_test_sample(i), provider)
                scored[out.video_id] = out.as_tuple()
            results[tag] = scored

        # combined-score deltas (the quantity that moves mAP): bounded
        # against the video's score scale, plus relative error on the
        # detections that matter (above 5% of the top score)
        for int8_tag in ("perlayer", "e2e"):
            max_norm_delta, top_rel = 0.0, 0.0
            for vid in results["f32"]:
                _, act_f, comp_f, _ = results["f32"][vid]
                _, act_q, comp_q, _ = results[int8_tag][vid]
                comb_f = softmax(act_f)[:, 1:] * np.exp(comp_f)
                comb_q = softmax(act_q)[:, 1:] * np.exp(comp_q)
                scale = comb_f.max()
                max_norm_delta = max(max_norm_delta,
                                     float(np.abs(comb_q - comb_f).max() / scale))
                top = comb_f > 0.05 * scale
                if top.any():
                    top_rel = max(top_rel, float(
                        (np.abs(comb_q - comb_f)[top] / comb_f[top]).max()))
            # measured: perlayer 0.063 / 0.142, e2e 0.066 / 0.158
            assert max_norm_delta < 0.12, (int8_tag, max_norm_delta)
            assert top_rel < 0.25, (int8_tag, top_rel)

        # mAP through the full pipeline: delta < 0.5 mAP point for BOTH modes
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
        assert maps["f32"] > 0.8, maps   # the fixture is a real detector
        assert abs(maps["perlayer"] - maps["f32"]) < 0.005, maps  # measured 0.0
        assert abs(maps["e2e"] - maps["f32"]) < 0.005, maps       # measured 0.0


def test_quantization_report(backbone_setup):
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        quantization_report)

    backbone, variables = backbone_setup
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255.0 - 117.0)
    fk = rng.randn(1024, 61).astype(np.float32) * 0.01
    fb = np.zeros(61, np.float32)
    rep = quantization_report(backbone, variables, x, fused_kernel=fk,
                              fused_bias=fb)
    assert set(rep) == {"feature_cosine", "feature_rel_rms", "score_rel_rms"}
    assert rep["feature_cosine"] > 0.99
    assert rep["feature_rel_rms"] < 0.1
    assert np.isfinite(rep["score_rel_rms"])


def test_quantization_report_on_torch_twin_weights():
    """Int8 divergence bounds on torch-initialized converted weights with the
    real fused test FC — the strongest pre-deployment int8 validation
    available without the reference release checkpoints (VERDICT r1 item 4).
    Per-head (act/comp/reg) score errors are bounded separately since the
    combined score softmax(act)*exp(comp) is what moves mAP.
    """
    torch = pytest.importorskip("torch")

    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        quantization_report)
    from action_detection_tpu.models.convert import convert_torch_backbone_state
    from action_detection_tpu.models.ssn import fuse_test_heads
    from action_detection_tpu.ops.stpp import ReorganizedScoreLayout, StppConfig
    from tests.test_torch_parity import build_torch_bninception

    torch.manual_seed(3)
    tm = build_torch_bninception()
    tm.eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.4)
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0, 0.02)
    params, batch_stats = convert_torch_backbone_state(tm.state_dict(),
                                                       "BNInception")
    backbone, _, _ = get_backbone("BNInception", "RGB")
    variables = {"params": params, "batch_stats": batch_stats}

    K = 20
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0)
    head_vars = model.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                           train=False)
    kernel, bias = fuse_test_heads(head_vars["params"], K, (1, 1, 1))
    cfg = StppConfig.from_raw((1, 1, 1))
    layout = ReorganizedScoreLayout(K + 1, K, 2 * K, cfg.feat_multiplier)

    rng = np.random.RandomState(5)
    # Caffe-normalized input range (mean-subtracted BGR uint8)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255.0 - 117.0)
    rep = quantization_report(backbone, variables, x,
                              fused_kernel=np.asarray(kernel),
                              fused_bias=np.asarray(bias), layout=layout)
    assert rep["feature_cosine"] > 0.995, rep
    assert rep["feature_rel_rms"] < 0.06, rep
    for head in ("act", "comp", "reg"):
        assert rep[f"{head}_rel_rms"] < 0.12, rep

    # the e2e mode (int8 activations end-to-end) holds the same bounds
    rep_e2e = quantization_report(backbone, variables, x,
                                  fused_kernel=np.asarray(kernel),
                                  fused_bias=np.asarray(bias), layout=layout,
                                  mode="e2e")
    assert rep_e2e["feature_cosine"] > 0.995, rep_e2e
    assert rep_e2e["feature_rel_rms"] < 0.08, rep_e2e
    for head in ("act", "comp", "reg"):
        assert rep_e2e[f"{head}_rel_rms"] < 0.12, rep_e2e


def test_prequantized_scorer_matches_calibrating_scorer(backbone_setup):
    """export_quantized -> prequantized= skips calibration, same scores.

    score_videos builds one scorer per device; the first one calibrates and
    the rest reuse its tree (cli/ssn_test.py scorer_factory), so the reuse
    path must be byte-identical to calibrating again.
    """
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN

    model = SSN(num_class=3, base_model="BNInception", dropout=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                           train=False)
    rng = np.random.RandomState(0)
    calib = rng.randint(0, 256, size=(4, 64, 64, 3), dtype=np.uint8)
    _, _, spec = get_backbone("BNInception", "RGB")

    def make(calibration, prequantized):
        s = ProposalScorer(model, variables["params"],
                           variables.get("batch_stats"), spec,
                           reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                           test_crops=1, chunk_frames=4, quantize=True,
                           calibration_frames=calibration,
                           prequantized=prequantized)
        s.input_spec = spec.__class__(64, spec.mean, spec.std, spec.bgr,
                                      spec.div255)
        return s

    a = make(calib, None)
    export = a.export_quantized()
    assert export is not None
    b = make(None, export)
    # the reuse path must not keep a host float-param copy alive either
    assert a._qp is None and b._qp is None

    chunk = rng.randint(0, 256, size=(4, 64, 64, 3), dtype=np.uint8)
    sa = np.asarray(a._score_chunk(jnp.asarray(chunk), n_stacks=4))
    sb = np.asarray(b._score_chunk(jnp.asarray(chunk), n_stacks=4))
    np.testing.assert_array_equal(sa, sb)

    # prequantized without a quantize mode is a caller bug, not a silent noop
    import pytest as _pytest
    with _pytest.raises(ValueError, match="prequantized"):
        ProposalScorer(model, variables["params"],
                       variables.get("batch_stats"), spec,
                       reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                       test_crops=1, chunk_frames=4, quantize=False,
                       prequantized=export)


def test_lazy_calibration_shared_across_fanout():
    """score_videos with a LAZY-quantizing factory (no calibration_frames)
    must produce device-count-independent scores: the first calibration is
    computed deterministically from the first work item on the main thread
    and installed into every sibling scorer. Without the sharing, each
    device would calibrate int8 scales on ITS first chunk (different videos
    -> different scales -> device-dependent scores)."""
    import os
    import tempfile

    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.data.pipeline import SyntheticFrameProvider
    from action_detection_tpu.data.ssn_dataset import SSNDataset
    from action_detection_tpu.infer.scorer import ProposalScorer, score_videos
    from action_detection_tpu.models import SSN
    from tests.test_datasets import write_proposal_list

    model = SSN(num_class=3, base_model="BNInception", dropout=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 9, 64, 64, 3)), jnp.ones((1, 2)),
                           train=False)
    _, _, spec = get_backbone("BNInception", "RGB")

    def factory(device):
        s = ProposalScorer(model, variables["params"],
                           variables.get("batch_stats"), spec,
                           reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                           test_crops=1, chunk_frames=4, quantize="e2e",
                           device=device)
        s.input_spec = spec.__class__(64, spec.mean, spec.std, spec.bgr,
                                      spec.div255)
        assert s.needs_lazy_calibration
        return s

    with tempfile.TemporaryDirectory() as d:
        prop_file = write_proposal_list(os.path.join(d, "p.txt"), n_videos=4)
        ds = SSNDataset(prop_file, SamplingConfig(), test_interval=60)
        provider = SyntheticFrameProvider(width=80, height=72)

        res1 = score_videos(factory, ds, provider, devices=jax.devices()[:1])
        res3 = score_videos(factory, ds, provider, devices=jax.devices()[:3])
        assert set(res1) == set(res3) and len(res1) == 4
        for vid in res1:
            np.testing.assert_array_equal(res1[vid].act_scores,
                                          res3[vid].act_scores)
            np.testing.assert_array_equal(res1[vid].comp_scores,
                                          res3[vid].comp_scores)

        # pack mode: work items are video GROUPS — the main-thread election
        # must handle them too, with the same device-count invariance
        # (pack's first calibrating chunk mixes videos, so it is compared
        # against pack itself, not the per-video runs)
        resp1 = score_videos(factory, ds, provider,
                             devices=jax.devices()[:1], pack=True)
        resp2 = score_videos(factory, ds, provider,
                             devices=jax.devices()[:2], pack=True)
        assert set(resp1) == set(resp2) == set(res1)
        for vid in resp1:
            np.testing.assert_array_equal(resp1[vid].act_scores,
                                          resp2[vid].act_scores)
