"""Eq-mask max-pool backward (ops/pooling.py) — a measured-REJECTED training
lever, kept opt-in.

The r5 on-chip A/B (scripts/train_profile_probe.py) measured the eq-mask VJP
at 321.9 ms fwd+bwd vs 262.7 ms for the plain SelectAndScatter AD path at the
recipe batch, so the DEFAULT dispatch is the plain path (pinned below). The
eq-mask semantics stay pinned under explicit opt-in (`eq_mask_on` fixture):
forward bit-identical to flax's nn.max_pool, backward equal to the
SelectAndScatter AD gradient whenever window maxima are unique, and the one
intended divergence — tie routing — pinned explicitly, not left to chance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from action_detection_tpu.ops import pooling
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


@pytest.fixture
def eq_mask_on():
    """Opt in to the rejected eq-mask VJP for the duration of one test."""
    prev = pooling.set_eq_mask(True)
    yield
    pooling.set_eq_mask(prev)


def _distinct_input(shape, seed=0):
    """Float input with all-distinct values: window maxima are unique, so
    eq-mask and SelectAndScatter gradients must agree exactly."""
    rng = np.random.RandomState(seed)
    vals = rng.permutation(int(np.prod(shape))).astype(np.float32)
    return (vals / vals.size - 0.5).reshape(shape)


def test_default_is_plain_ad():
    """The DEFAULT dispatch is the plain reduce_window AD path (the r5
    measured revert): ties route first-match exactly like nn.max_pool, and
    the global flag reads disabled."""
    assert not pooling.eq_mask_enabled()
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)  # single 2x2 window, all tied
    g = jax.grad(lambda x: max_pool_2d(x, 2, 2, ((0, 0), (0, 0))).sum())(x)
    g_ref = jax.grad(lambda x: nn.max_pool(
        x, (2, 2), strides=(2, 2), padding=[(0, 0), (0, 0)]).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
    assert float(np.asarray(g).sum()) == 1.0  # first-match semantics


@pytest.mark.parametrize("kernel,stride,pad,H,W", CONFIGS)
def test_forward_matches_flax(eq_mask_on, kernel, stride, pad, H, W):
    x = jnp.asarray(_distinct_input((2, H, W, 5)))
    ours = max_pool_2d(x, kernel, stride, pad)
    ref = nn.max_pool(x, (kernel, kernel), strides=(stride, stride),
                      padding=list(pad))
    assert ours.shape == ref.shape
    assert jnp.array_equal(ours, ref)


@pytest.mark.parametrize("kernel,stride,pad,H,W", CONFIGS)
def test_grad_matches_selectandscatter(eq_mask_on, kernel, stride, pad, H, W):
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


def test_grad_under_jit_bf16(eq_mask_on):
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


def test_tie_routing_documented_divergence(eq_mask_on):
    """Intended divergence of the OPTED-IN eq-mask path: a window whose max
    is tied routes a full dy to EVERY tied position (Caffe-style), not just
    the first in scan order. Pin it so an accidental tie-break change in the
    kept-measurable lever is caught."""
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)  # single 2x2 window, all tied
    g = jax.grad(lambda x: max_pool_2d(x, 2, 2, ((0, 0), (0, 0))).sum())(x)
    assert np.asarray(g).ravel().tolist() == [1.0, 1.0, 1.0, 1.0]
    g_ref = jax.grad(lambda x: nn.max_pool(
        x, (2, 2), strides=(2, 2), padding=[(0, 0), (0, 0)]).sum())(x)
    assert float(np.asarray(g_ref).sum()) == 1.0  # first-match semantics


def test_stride1_dispatches_to_plain_ad(eq_mask_on):
    """Even when eq-mask is opted in, stride-1 pools must ride the plain
    reduce_window AD path: eq-mask at stride 1 keeps its whole add chain at
    input resolution and blew the train-step HBM compile at the recipe batch
    (BENCH_r04 train_error, twenty 182.25M temps from inception_5b). Pin via
    tie semantics: the plain path routes a tied dy to the FIRST position,
    eq-mask to all."""
    x = jnp.zeros((1, 3, 3, 1), jnp.float32)  # stride-1 3x3 pad-1, all tied
    g = jax.grad(lambda x: max_pool_2d(x, 3, 1, ((1, 1), (1, 1))).sum())(x)
    g_ref = jax.grad(lambda x: nn.max_pool(
        x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)]).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
    assert float(np.asarray(g).sum()) == 9.0  # one dy unit per window


def test_set_eq_mask_toggles_and_restores():
    """set_eq_mask is the knob bench.py's train-arm fallback ladder rides:
    enabling gives eq-mask tie semantics on newly traced functions,
    disabling restores SelectAndScatter semantics, and the previous value
    round-trips."""
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)
    prev = pooling.set_eq_mask(True)
    try:
        assert prev is False and pooling.eq_mask_enabled()
        g = jax.grad(lambda x: max_pool_2d(
            x, 2, 2, ((0, 0), (0, 0))).sum())(x)
        assert float(np.asarray(g).sum()) == 4.0  # eq-mask: all tied hit
        pooling.set_eq_mask(False)
        g = jax.grad(lambda x: max_pool_2d(
            x, 2, 2, ((0, 0), (0, 0))).sum())(x)
        assert float(np.asarray(g).sum()) == 1.0  # first-match again
    finally:
        pooling.set_eq_mask(prev)
    assert not pooling.eq_mask_enabled()


def test_int_dtype_forward_defined(eq_mask_on):
    """Integer inputs are legal in the forward (iinfo-min init) and must
    dispatch to the plain path even when eq-mask is opted in — the eq-mask
    backward's NaN fill is only defined for floats (ADVICE r4)."""
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.int32).reshape(2, 8, 8, 3)
    y = max_pool_2d(x, 3, 2, ((0, 1), (0, 1)))
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)])
    assert y.dtype == x.dtype
    assert jnp.array_equal(y, ref)


def test_rank_contract_is_explicit():
    with pytest.raises(ValueError, match="rank-4"):
        max_pool_2d(jnp.zeros((2, 3, 4, 4, 5)), 2, 2, ((0, 0), (0, 0)))


# --- the Pallas fused backward (ops/pool_bwd_pallas.py) -------------------
# On the CPU test mesh the kernel runs in Pallas interpreter mode
# (max_pool_bwd_pallas auto-selects it off-TPU); semantics are identical to
# the compiled TPU kernel.

@pytest.fixture
def pallas_on():
    prev = pooling.set_pool_backward("pallas")
    yield
    pooling.set_pool_backward(prev)


@pytest.mark.parametrize("kernel,stride,pad,H,W", CONFIGS)
def test_pallas_grad_matches_selectandscatter(pallas_on, kernel, stride,
                                              pad, H, W):
    """Unique maxima + non-uniform dy: the Pallas backward must equal the
    SelectAndScatter AD gradient bit-for-bit (integer-valued weights keep
    the ≤(k/s)² per-position adds reassociation-exact)."""
    x = jnp.asarray(_distinct_input((2, H, W, 5), seed=H + W))

    def loss(pool):
        def f(x):
            y = pool(x)
            w = (jnp.arange(y.size, dtype=jnp.float32) % 7 + 1).reshape(
                y.shape)
            return jnp.sum(y * w)
        return f

    g_ours = jax.grad(loss(lambda x: max_pool_2d(x, kernel, stride, pad)))(x)
    g_ref = jax.grad(loss(lambda x: nn.max_pool(
        x, (kernel, kernel), strides=(stride, stride), padding=list(pad))))(x)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_ref))


@pytest.mark.parametrize("kernel,stride,pad,H,W", CONFIGS)
def test_pallas_tie_routing_matches_selectandscatter(pallas_on, kernel,
                                                     stride, pad, H, W):
    """Heavily tied input (values quantized to 4 levels): first-match
    routing must match SelectAndScatter exactly — unlike eq-mask, the
    Pallas kernel is a drop-in with NO semantic deviation."""
    rng = np.random.RandomState(H * 31 + W)
    x = jnp.asarray(rng.randint(0, 4, size=(2, H, W, 3)).astype(np.float32))
    g_ours = jax.grad(lambda x: max_pool_2d(x, kernel, stride, pad).sum())(x)
    g_ref = jax.grad(lambda x: nn.max_pool(
        x, (kernel, kernel), strides=(stride, stride),
        padding=list(pad)).sum())(x)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_ref))


def test_pallas_grad_under_jit_bf16(pallas_on):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.permutation(2 * 12 * 12 * 8).reshape(2, 12, 12, 8)
                    % 256, jnp.bfloat16)
    f = jax.jit(jax.grad(lambda x: max_pool_2d(
        x, 3, 2, ((0, 1), (0, 1))).astype(jnp.float32).sum()))
    g = f(x)
    g_ref = jax.grad(lambda x: nn.max_pool(
        x, (3, 3), strides=(2, 2),
        padding=[(0, 1), (0, 1)]).astype(jnp.float32).sum())(x)
    assert jnp.array_equal(g, g_ref)


def test_pallas_forward_unchanged(pallas_on):
    """Forward is the same reduce_window regardless of backward mode."""
    x = jnp.asarray(_distinct_input((2, 20, 20, 3), seed=9))
    y = max_pool_2d(x, 3, 2, ((0, 1), (0, 1)))
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)])
    assert jnp.array_equal(y, ref)


def test_pallas_backbone_stem_grad_bit_exact(pallas_on):
    """Through the chained BNInception stem pools the Pallas route must
    stay bit-exact vs the AD path on integer-valued input (first-match
    semantics ⇒ identical routing; integer grads ⇒ no reassociation ulp)."""
    from action_detection_tpu.models.backbones.bn_inception import _max_pool

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randint(0, 64, size=(2, 56, 56, 4)).astype(
        np.float32))

    def stem(x, mp):
        x = mp(x, 3, 2, ceil=True)
        return mp(x, 3, 2, ceil=True)

    def mp_ref(x, kernel, stride, ceil=False, pad=0):
        from action_detection_tpu.models.backbones.bn_inception import (
            _ceil_pool_padding)
        padding = ([_ceil_pool_padding(x.shape[1], kernel, stride),
                    _ceil_pool_padding(x.shape[2], kernel, stride)]
                   if ceil else [(pad, pad), (pad, pad)])
        return nn.max_pool(x, (kernel, kernel), strides=(stride, stride),
                           padding=padding)

    g_ours = jax.grad(lambda x: (stem(x, _max_pool) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: (stem(x, mp_ref) ** 2).sum())(x)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_ref))


def test_pool_backward_mode_validation():
    with pytest.raises(ValueError, match="unknown pool backward mode"):
        pooling.set_pool_backward("cuda")
    assert pooling.pool_backward() in ("sas", "eq_mask", "pallas")


def test_backbone_stem_grad_matches_ad_path(eq_mask_on):
    """End-to-end through the real BNInception stem pools with eq-mask opted
    in: gradients w.r.t. the stem input must equal the default AD path on
    tie-free input (the wiring through _max_pool stays correct should the
    lever ever be re-opened on different hardware)."""
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

    x = jnp.asarray(_distinct_input((8, 112, 112, 4), seed=7))
    g_ours = jax.grad(lambda x: (stem(x, _max_pool) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: (stem(x, mp_ref) ** 2).sum())(x)
    # Single-pool grads are pinned bit-exact above; through the chained conv
    # backward the two pool-backward formulations reassociate float adds, so
    # this end-to-end pin tolerates ulp-level differences only.
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
