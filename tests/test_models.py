"""Model tests: BNInception structure, SSN forward shapes, head fusion
commutation (linear heads ∘ pooling == pooling ∘ linear heads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from action_detection_tpu.models import SSN, BinaryClassifier, fuse_test_heads
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.ops.stpp import (
    StppConfig, ReorganizedScoreLayout, reorganized_stpp_pool,
)


def test_bninception_shapes_and_naming():
    backbone, feat_dim, spec = get_backbone("BNInception", "RGB")
    assert feat_dim == 1024
    assert spec.input_size == 224 and spec.bgr and not spec.div255
    x = jnp.zeros((2, 64, 64, 3))
    variables = backbone.init(jax.random.PRNGKey(0), x)
    feats = backbone.apply(variables, x)
    assert feats.shape == (2, 1024)
    # caffe-port layer names for checkpoint conversion
    params = variables["params"]
    assert "conv1_7x7_s2" in params
    assert "conv2_3x3" in params
    assert "inception_3a" in params and "inception_3a_1x1" in params["inception_3a"]
    assert "inception_3c" in params and "inception_3c_1x1" not in params["inception_3c"]
    assert "batch_stats" in variables
    # parameter count sanity: BN-Inception is ~11.3M params
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 10_000_000 < n < 13_000_000, n


def test_bninception_flow_channels():
    backbone, _, spec = get_backbone("BNInception", "Flow")
    assert spec.mean == (128.0,)
    x = jnp.zeros((1, 64, 64, 10))  # 2 * new_length(5) channels
    variables = backbone.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["conv1_7x7_s2"]["kernel"].shape == (7, 7, 10, 64)


def test_ssn_forward_shapes_and_dropout_rng():
    K = 5
    model = SSN(num_class=K, dropout=0.5)
    P, S, H = 2, 9, 32
    frames = jnp.asarray(np.random.RandomState(0).randn(P, S, H, H, 3),
                         dtype=jnp.float32)
    scaling = jnp.ones((P, 2), dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, frames, scaling,
                           train=False)
    act, comp, reg = model.apply(variables, frames, scaling, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)})
    assert act.shape == (P, K + 1)
    assert comp.shape == (P, K)
    assert reg.shape == (P, K, 2)
    # eval forward is deterministic (no dropout)
    a1, _, _ = model.apply(variables, frames, scaling, train=False)
    a2, _, _ = model.apply(variables, frames, scaling, train=False)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_binary_classifier_shapes():
    model = BinaryClassifier(course_segment=5, dropout=0.0)
    P, S, H = 2, 5, 32
    frames = jnp.zeros((P, S, H, H, 3))
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    logits = model.apply(variables, frames, train=False)
    assert logits.shape == (P, 2)
    dense = model.apply(variables, jnp.zeros((7, H, H, 3)),
                        method=BinaryClassifier.score_frames)
    assert dense.shape == (7, 2)


@pytest.mark.parametrize("raw_cfg", [(1, 1, 1), (1, (1, 2), 1)])
def test_fuse_test_heads_layout(raw_cfg):
    """Fused kernel/bias must match the ReorganizedScoreLayout column count and
    reproduce head outputs column-block-wise."""
    rng = np.random.RandomState(0)
    K, D = 4, 16
    cfg = StppConfig.from_raw(raw_cfg)
    J = cfg.feat_multiplier
    params = {
        "activity_fc": {"kernel": jnp.asarray(rng.randn(D, K + 1), jnp.float32),
                        "bias": jnp.asarray(rng.randn(K + 1), jnp.float32)},
        "completeness_fc": {"kernel": jnp.asarray(rng.randn(J * D, K), jnp.float32),
                            "bias": jnp.asarray(rng.randn(K), jnp.float32)},
        "regressor_fc": {"kernel": jnp.asarray(rng.randn(J * D, 2 * K), jnp.float32),
                         "bias": jnp.asarray(rng.randn(2 * K), jnp.float32)},
    }
    kernel, bias = fuse_test_heads(params, K, raw_cfg)
    layout = ReorganizedScoreLayout(act_len=K + 1, comp_len=K, reg_len=2 * K,
                                    feat_multiplier=J)
    assert kernel.shape == (D, layout.total_cols)
    assert bias.shape == (layout.total_cols,)
    # block j of comp columns must equal the j-th input-block of the comp head
    comp_k = np.asarray(params["completeness_fc"]["kernel"])
    for j in range(J):
        block = np.asarray(kernel[:, K + 1 + j * K: K + 1 + (j + 1) * K])
        np.testing.assert_allclose(block, comp_k[j * D:(j + 1) * D, :])
    # part biases sum back to the original bias
    comp_bias_blocks = np.asarray(bias[K + 1: K + 1 + J * K]).reshape(J, K)
    np.testing.assert_allclose(comp_bias_blocks.sum(axis=0),
                               np.asarray(params["completeness_fc"]["bias"]),
                               rtol=1e-5)


def test_train_test_commutation():
    """For stpp_cfg (1,1,1): pooling fused per-frame scores over a part range
    equals applying the heads to the part-mean feature (linear-head
    commutation — the identity prepare_test_fc relies on,
    ssn_models.py:176-201)."""
    rng = np.random.RandomState(1)
    K, D, T = 4, 16, 30
    raw_cfg = (1, 1, 1)
    cfg = StppConfig.from_raw(raw_cfg)
    J = cfg.feat_multiplier
    params = {
        "activity_fc": {"kernel": jnp.asarray(rng.randn(D, K + 1), jnp.float32),
                        "bias": jnp.asarray(rng.randn(K + 1), jnp.float32)},
        "completeness_fc": {"kernel": jnp.asarray(rng.randn(J * D, K), jnp.float32),
                            "bias": jnp.asarray(rng.randn(K), jnp.float32)},
        "regressor_fc": {"kernel": jnp.asarray(rng.randn(J * D, 2 * K), jnp.float32),
                         "bias": jnp.asarray(rng.randn(2 * K), jnp.float32)},
    }
    kernel, bias = fuse_test_heads(params, K, raw_cfg)
    layout = ReorganizedScoreLayout(act_len=K + 1, comp_len=K, reg_len=2 * K,
                                    feat_multiplier=J)

    feats = rng.randn(T, D).astype(np.float32)
    frame_scores = jnp.asarray(feats) @ kernel + bias      # (T, total)

    ticks = np.array([[2, 6, 18, 24]])
    scaling = np.array([[0.7, 0.3]], dtype=np.float32)
    act, comp, reg = reorganized_stpp_pool(
        frame_scores, jnp.asarray(ticks), jnp.asarray(scaling), layout, cfg)

    # direct head computation from part-mean features
    m_start = feats[2:6].mean(axis=0)
    m_course = feats[6:18].mean(axis=0)
    m_end = feats[18:24].mean(axis=0)
    stpp_ft = np.concatenate([m_start * 0.7, m_course, m_end * 0.3])

    comp_direct = stpp_ft @ np.asarray(params["completeness_fc"]["kernel"]) \
        + (0.7 + 1.0 + 0.3) / 3.0 * 0  # bias handled below
    # fused bias: each part block carries bias/J scaled by that part's scale
    comp_bias = np.asarray(params["completeness_fc"]["bias"]) / J * (0.7 + 1.0 + 0.3)
    np.testing.assert_allclose(np.asarray(comp)[0], comp_direct + comp_bias,
                               rtol=1e-4, atol=1e-4)

    act_direct = m_course @ np.asarray(params["activity_fc"]["kernel"]) \
        + np.asarray(params["activity_fc"]["bias"])
    np.testing.assert_allclose(np.asarray(act)[0], act_direct, rtol=1e-4, atol=1e-4)

    reg_direct = stpp_ft @ np.asarray(params["regressor_fc"]["kernel"]) \
        + np.asarray(params["regressor_fc"]["bias"]) / J * (0.7 + 1.0 + 0.3)
    np.testing.assert_allclose(np.asarray(reg)[0], reg_direct, rtol=1e-4, atol=1e-4)


def test_inception_v3_shapes():
    backbone, feat_dim, spec = get_backbone("InceptionV3", "RGB")
    assert feat_dim == 2048
    assert spec.input_size == 299 and spec.scale_size == 341
    # 75 is the smallest valid input (stride stack); keeps CPU compile fast
    x = jnp.zeros((1, 75, 75, 3))
    variables = backbone.init(jax.random.PRNGKey(0), x)
    feats = backbone.apply(variables, x)
    assert feats.shape == (1, 2048)
    params = variables["params"]
    assert "Conv2d_1a_3x3_conv" in params
    assert "Mixed_5b" in params and "Mixed_7c" in params
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # inception v3 trunk is ~21.8M params
    assert 20_000_000 < n < 24_000_000, n


def test_resnet_shapes():
    backbone, feat_dim, spec = get_backbone("resnet50", "RGB")
    assert feat_dim == 2048
    assert spec.div255 and not spec.bgr
    x = jnp.zeros((1, 64, 64, 3))
    variables = backbone.init(jax.random.PRNGKey(0), x)
    feats = backbone.apply(variables, x)
    assert feats.shape == (1, 2048)
    params = variables["params"]
    assert "conv1" in params and "layer1_0" in params and "layer4_2" in params
    assert "downsample_conv" in params["layer1_0"]
    assert "downsample_conv" not in params["layer1_1"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 22_000_000 < n < 28_000_000, n  # resnet50 trunk ~23.5M

    b18, d18, _ = get_backbone("resnet18", "RGB")
    assert d18 == 512
    v18 = b18.init(jax.random.PRNGKey(0), x)
    assert b18.apply(v18, x).shape == (1, 512)
