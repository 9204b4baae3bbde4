"""Eq-mask max-pool backward (ops/pooling.py).

The forward must stay bit-identical to flax's nn.max_pool (the scorer and all
parity arms ride on it); the backward must equal the SelectAndScatter AD
gradient whenever window maxima are unique, which is the measure-one case for
conv/BN activations. The one intended divergence — tie routing — is pinned
explicitly below, not left to chance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from action_detection_tpu.ops.pooling import max_pool_2d

CONFIGS = [
    # kernel, stride, padding, H, W  (stem/trunk shapes incl. ceil-mode pads)
    (3, 2, ((0, 1), (0, 1)), 112, 112),   # BNInception stem pool1 (ceil)
    (3, 2, ((0, 1), (0, 1)), 56, 56),     # stem pool2 (ceil)
    (3, 1, ((1, 1), (1, 1)), 28, 28),     # trunk stride-1 max branch
    (3, 2, ((0, 0), (0, 0)), 35, 35),     # InceptionV3 VALID grid reduce
    (2, 2, ((0, 0), (0, 0)), 32, 32),     # VGG
    (3, 2, ((1, 1), (1, 1)), 112, 112),   # ResNet stem
    (3, 2, ((0, 2), (0, 1)), 17, 23),     # asymmetric odd shape
    (2, 3, ((0, 0), (0, 0)), 13, 13),     # stride > kernel (gap residues)
    (3, 3, ((1, 1), (1, 1)), 15, 15),     # stride == kernel
]


def _distinct_input(shape, seed=0):
    """Float input with all-distinct values: window maxima are unique, so
    eq-mask and SelectAndScatter gradients must agree exactly."""
    rng = np.random.RandomState(seed)
    vals = rng.permutation(int(np.prod(shape))).astype(np.float32)
    return (vals / vals.size - 0.5).reshape(shape)


@pytest.mark.parametrize("kernel,stride,pad,H,W", CONFIGS)
def test_forward_matches_flax(kernel, stride, pad, H, W):
    x = jnp.asarray(_distinct_input((2, H, W, 5)))
    ours = max_pool_2d(x, kernel, stride, pad)
    ref = nn.max_pool(x, (kernel, kernel), strides=(stride, stride),
                      padding=list(pad))
    assert ours.shape == ref.shape
    assert jnp.array_equal(ours, ref)


@pytest.mark.parametrize("kernel,stride,pad,H,W", CONFIGS)
def test_grad_matches_selectandscatter(kernel, stride, pad, H, W):
    x = jnp.asarray(_distinct_input((2, H, W, 5), seed=H + W))
    # Weighted sum so dy is non-uniform (catches shifted-read misalignment).
    def loss(pool):
        def f(x):
            y = pool(x)
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * w)
        return f

    g_ours = jax.grad(loss(lambda x: max_pool_2d(x, kernel, stride, pad)))(x)
    g_ref = jax.grad(loss(lambda x: nn.max_pool(
        x, (kernel, kernel), strides=(stride, stride), padding=list(pad))))(x)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_ref))


def test_grad_under_jit_bf16():
    # Integer values 0..255 are bf16-exact, so this permuted input stays
    # all-distinct after the cast (a wider random tensor would collapse into
    # ties under bf16 rounding and legitimately diverge on tie routing).
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.permutation(256).reshape(2, 4, 4, 8), jnp.bfloat16)
    f = jax.jit(jax.grad(lambda x: max_pool_2d(
        x, 3, 2, ((0, 1), (0, 1))).astype(jnp.float32).sum()))
    g = f(x)
    g_ref = jax.grad(lambda x: nn.max_pool(
        x, (3, 3), strides=(2, 2),
        padding=[(0, 1), (0, 1)]).astype(jnp.float32).sum())(x)
    assert jnp.array_equal(g, g_ref)


def test_tie_routing_documented_divergence():
    """Intended divergence from SelectAndScatter: a window whose max is tied
    routes a full dy to EVERY tied position (Caffe/torch-CUDA-style), not
    just the first in scan order. Pin it so a regression to the (slower)
    AD path — or an accidental tie-break change — is caught."""
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)  # single 2x2 window, all tied
    g = jax.grad(lambda x: max_pool_2d(x, 2, 2, ((0, 0), (0, 0))).sum())(x)
    assert np.asarray(g).ravel().tolist() == [1.0, 1.0, 1.0, 1.0]
    g_ref = jax.grad(lambda x: nn.max_pool(
        x, (2, 2), strides=(2, 2), padding=[(0, 0), (0, 0)]).sum())(x)
    assert float(np.asarray(g_ref).sum()) == 1.0  # first-match semantics


def test_backbone_stem_grad_matches_ad_path():
    """End-to-end through the real BNInception stem pools: gradients w.r.t.
    the stem input must equal the pre-lever AD path on tie-free input."""
    from action_detection_tpu.models.backbones.bn_inception import _max_pool

    # The middle step must mix channels/neighborhoods like the real conv2:
    # stride-2 overlapping pool windows duplicate values (adjacent outputs
    # sharing one argmax), and an elementwise middle step would carry those
    # duplicates into pool2 as exact ties, where eq-mask and SelectAndScatter
    # legitimately diverge. A random conv restores distinctness.
    wconv = jnp.asarray(np.random.RandomState(11).randn(3, 3, 4, 4),
                        jnp.float32)

    def stem(x, mp):
        x = mp(x, 3, 2, ceil=True)
        x = jax.lax.conv_general_dilated(
            x, wconv, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return mp(x, 3, 2, ceil=True)

    def mp_ref(x, kernel, stride, ceil=False, pad=0):
        from action_detection_tpu.models.backbones.bn_inception import (
            _ceil_pool_padding)
        padding = ([_ceil_pool_padding(x.shape[1], kernel, stride),
                    _ceil_pool_padding(x.shape[2], kernel, stride)]
                   if ceil else [(pad, pad), (pad, pad)])
        return nn.max_pool(x, (kernel, kernel), strides=(stride, stride),
                           padding=padding)

    x = jnp.asarray(_distinct_input((2, 112, 112, 4), seed=7))
    g_ours = jax.grad(lambda x: (stem(x, _max_pool) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: (stem(x, mp_ref) ** 2).sum())(x)
    # Single-pool grads are pinned bit-exact above; through the chained conv
    # backward the two pool-backward formulations reassociate float adds, so
    # this end-to-end pin tolerates ulp-level differences only.
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
