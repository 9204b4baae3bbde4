"""Int8-e2e InceptionV3: BN folding exactness + quantized-path accuracy.

Counterpart of tests/test_int8.py for the second backbone family the
reference's published numbers use (ssn_models.py:129-144). IV3 has no
Caffe ceil-mode pooling, so any spatial size is conv/pool-consistent.
"""

import numpy as np
import pytest

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.inception_v3_int8 import (
    calibrate_e2e_iv3, fold_bn_iv3, inception_v3_int8_e2e_features,
)


@pytest.fixture(scope="module")
def iv3_setup():
    backbone, _, _ = get_backbone("InceptionV3", "RGB")
    variables = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 95, 95, 3)))
    rng = np.random.RandomState(0)

    def jitter(tree, leaf_fn):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jnp.asarray(leaf_fn(p, np.asarray(x), rng)), tree)

    def stats_leaf(path, x, rng):
        if path[-1].key == "mean":
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


def test_fold_bn_iv3_is_exact(iv3_setup):
    """Bias-free conv + BN(eps=1e-3) == folded conv, stem conv checked."""
    backbone, variables = iv3_setup
    folded = fold_bn_iv3(variables["params"], variables["batch_stats"])
    assert "Conv2d_1a_3x3" in folded
    assert "Mixed_5b/branch1x1" in folded and "Mixed_7c/branch3x3_2a" in folded
    assert len(folded) == 94          # every IV3 conv folded

    p = variables["params"]["Conv2d_1a_3x3_conv"]
    bn = variables["params"]["Conv2d_1a_3x3_bn"]
    st = variables["batch_stats"]["Conv2d_1a_3x3_bn"]
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))

    ref = jax.lax.conv_general_dilated(x, p["kernel"], (2, 2),
                                       ((0, 0), (0, 0)),
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = (ref - st["mean"]) * bn["scale"] / jnp.sqrt(st["var"] + 1e-3) + bn["bias"]

    f = folded["Conv2d_1a_3x3"]
    got = jax.lax.conv_general_dilated(x, jnp.asarray(f["kernel"]), (2, 2),
                                       ((0, 0), (0, 0)),
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = got + jnp.asarray(f["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_iv3_int8_e2e_features_close_to_float(iv3_setup):
    backbone, variables = iv3_setup
    rng = np.random.RandomState(2)
    # Caffe-normalized input range (the reference IV3 port keeps mean
    # [104,117,128] / std 1, ssn_models.py:133-139)
    x = jnp.asarray(rng.rand(2, 95, 95, 3).astype(np.float32) * 255.0 - 117.0)

    # all-int8 path (hybrid stem off): the walker quantized every folded
    # conv exactly once
    qe = calibrate_e2e_iv3(variables["params"], variables["batch_stats"], x,
                           hybrid_stem=False)
    assert qe["__feat_scale__"].shape == (2048,)
    folded = fold_bn_iv3(variables["params"], variables["batch_stats"])
    assert (set(qe) - {"__input_scale__", "__feat_scale__", "__entry__"}
            == set(folded))

    ref = np.asarray(backbone.apply(variables, x)).astype(np.float64)
    got = np.asarray(inception_v3_int8_e2e_features(qe, x)).astype(np.float64)
    assert got.shape == ref.shape == (2, 2048)
    assert np.isfinite(got).all()
    for r, g in zip(ref, got):
        cos = float(np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9))
        assert cos > 0.99, cos
    rel_rms = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9))
    assert rel_rms < 0.12, rel_rms


def test_iv3_int8_e2e_hybrid_stem(iv3_setup):
    """hybrid_stem=True (the default): bf16 folded stem + int8 trunk,
    quantized once at the Conv2d_4a output. Must be at least as close to
    float as the all-int8 path (the stem is exact, so only trunk
    quantization error remains)."""
    backbone, variables = iv3_setup
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 95, 95, 3).astype(np.float32) * 255.0 - 117.0)

    qe_h = calibrate_e2e_iv3(variables["params"], variables["batch_stats"], x)
    assert set(qe_h["__stem__"]) == {
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
        "Conv2d_3b_1x1", "Conv2d_4a_3x3"}
    # stem convs are NOT in the int8 table
    assert "Conv2d_1a_3x3" not in qe_h

    ref = np.asarray(backbone.apply(variables, x)).astype(np.float64)
    got = np.asarray(inception_v3_int8_e2e_features(qe_h, x)) \
        .astype(np.float64)
    assert got.shape == (2, 2048) and np.isfinite(got).all()
    rel_h = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9))

    qe = calibrate_e2e_iv3(variables["params"], variables["batch_stats"], x,
                           hybrid_stem=False)
    got_i8 = np.asarray(inception_v3_int8_e2e_features(qe, x)) \
        .astype(np.float64)
    rel_i8 = float(np.linalg.norm(got_i8 - ref) / (np.linalg.norm(ref) + 1e-9))
    assert rel_h < 0.12, rel_h
    assert rel_h <= rel_i8 * 1.05, (rel_h, rel_i8)


def test_iv3_entry_fusion_bit_exact(iv3_setup):
    """IV3's fused branch-entry path (__entry__: every Mixed module's same-
    input 1x1 stride-1 entries, incl. Mixed_7a's two; Mixed_6a has none) is
    bit-identical to the per-conv walk — same exactness argument as
    tests/test_int8.py::test_entry_fusion_bit_exact."""
    backbone, variables = iv3_setup
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.rand(2, 95, 95, 3).astype(np.float32) * 255.0 - 117.0)
    qe = calibrate_e2e_iv3(variables["params"], variables["batch_stats"], x)
    assert len(qe["__entry__"]) == 10
    unfused = {k: v for k, v in qe.items() if k != "__entry__"}
    fused_feats = np.asarray(inception_v3_int8_e2e_features(qe, x))
    plain_feats = np.asarray(inception_v3_int8_e2e_features(unfused, x))
    assert np.array_equal(fused_feats, plain_feats)


def test_iv3_int8_e2e_odd_dims(iv3_setup):
    """VALID semantics: odd spatial sizes run (unlike BNInception ceil-mode)."""
    backbone, variables = iv3_setup
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 87, 101, 3).astype(np.float32) * 255.0 - 117.0)
    qe = calibrate_e2e_iv3(variables["params"], variables["batch_stats"], x)
    got = np.asarray(inception_v3_int8_e2e_features(qe, x))
    assert got.shape == (1, 2048) and np.isfinite(got).all()


def test_iv3_int8_e2e_fused_score_bound(iv3_setup):
    """Per-head (act/comp/reg) fused-score error bounds for IV3 int8-e2e —
    the combined score softmax(act)*exp(comp) is what moves mAP, so these
    mirror the BNInception bounds that justify default-on
    (test_int8.py::test_quantization_report_on_torch_twin_weights)."""
    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.ssn import fuse_test_heads
    from action_detection_tpu.ops.stpp import (ReorganizedScoreLayout,
                                               StppConfig,
                                               reorganized_score_slices)

    backbone, variables = iv3_setup
    K = 20
    model = SSN(num_class=K, base_model="InceptionV3", dropout=0.0)
    head_vars = model.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, 9, 95, 95, 3)), jnp.ones((1, 2)),
                           train=False)
    kernel, bias = fuse_test_heads(head_vars["params"], K, (1, 1, 1))
    cfg = StppConfig.from_raw((1, 1, 1))
    layout = ReorganizedScoreLayout(K + 1, K, 2 * K, cfg.feat_multiplier)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 95, 95, 3).astype(np.float32) * 255.0 - 117.0)
    qe = calibrate_e2e_iv3(variables["params"], variables["batch_stats"], x)
    ref = np.asarray(backbone.apply(variables, x)).astype(np.float64)
    got = np.asarray(inception_v3_int8_e2e_features(qe, x)).astype(np.float64)

    sref = ref @ np.asarray(kernel) + np.asarray(bias)
    sgot = got @ np.asarray(kernel) + np.asarray(bias)
    for name, sl in zip(("act", "comp", "reg"),
                        reorganized_score_slices(layout)):
        rel = float(np.linalg.norm(sgot[:, sl] - sref[:, sl])
                    / (np.linalg.norm(sref[:, sl]) + 1e-12))
        assert rel < 0.12, (name, rel)


def test_iv3_int8_scorer_end_to_end():
    """ProposalScorer(quantize='e2e') on the InceptionV3 backbone, lazy
    calibration, through the full score_video path."""
    import os
    import tempfile

    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.data.pipeline import SyntheticFrameProvider
    from action_detection_tpu.data.ssn_dataset import SSNDataset
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN
    from tests.test_datasets import write_proposal_list

    with tempfile.TemporaryDirectory() as d:
        prop_file = write_proposal_list(os.path.join(d, "p.txt"), n_videos=1)
        ds = SSNDataset(prop_file, SamplingConfig(), test_interval=60)
        provider = SyntheticFrameProvider(width=120, height=100)
        model = SSN(num_class=3, base_model="InceptionV3", dropout=0.0)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 9, 95, 95, 3)), jnp.ones((1, 2)),
                               train=False)
        _, _, spec = get_backbone("InceptionV3", "RGB")
        scorer = ProposalScorer(model, variables["params"],
                                variables.get("batch_stats"), spec,
                                reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                                test_crops=1, chunk_frames=4, quantize="e2e")
        scorer.input_spec = spec.__class__(95, spec.mean, spec.std, spec.bgr,
                                           spec.div255)
        assert scorer._quantized is None
        out = scorer.score_video(ds.get_test_sample(0), provider)
        assert scorer._quantized is not None
        # the dispatcher default is the hybrid bf16 stem (iv3_probe.py win)
        assert "__stem__" in scorer._quantized
        assert np.isfinite(out.act_scores).all()
        assert np.isfinite(out.comp_scores).all()

    # perlayer mode is BNInception-only: the scorer refuses up front
    with pytest.raises(ValueError, match="perlayer"):
        ProposalScorer(model, variables["params"],
                       variables.get("batch_stats"), spec,
                       reg_stats=np.array([[0.0, 0.0], [1.0, 1.0]]),
                       test_crops=1, chunk_frames=4, quantize="perlayer")


def test_quantize_dispatcher():
    from action_detection_tpu.models.backbones.quantize import (
        int8_support_error, supports_int8)

    assert supports_int8("BNInception", "e2e")
    assert supports_int8("BNInception", "perlayer")
    assert supports_int8("InceptionV3", "e2e")
    assert not supports_int8("InceptionV3", "perlayer")
    assert not supports_int8("TinyConv", "e2e")
    assert "TinyConv" in int8_support_error("TinyConv")
