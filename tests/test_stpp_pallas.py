"""Pallas STPP kernel parity vs the XLA cumsum-gather path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from action_detection_tpu.ops.stpp import (
    ReorganizedScoreLayout, StppConfig, reorganized_stpp_pool,
)
from action_detection_tpu.ops.stpp_pallas import reorganized_stpp_pool_pallas
from tests.test_stpp import make_random_ticks


@pytest.mark.parametrize("raw_cfg,K,T,P", [
    ((1, 1, 1), 5, 40, 16),
    ((1, (1, 2), 1), 4, 64, 8),
])
def test_pallas_pool_matches_xla(raw_cfg, K, T, P):
    rng = np.random.RandomState(0)
    cfg = StppConfig.from_raw(raw_cfg)
    layout = ReorganizedScoreLayout(act_len=K + 1, comp_len=K, reg_len=2 * K,
                                    feat_multiplier=cfg.feat_multiplier)
    scores = jnp.asarray(rng.randn(T, layout.total_cols).astype(np.float32))
    ticks = jnp.asarray(make_random_ticks(rng, P, T))
    scaling = jnp.asarray(rng.rand(P, 2).astype(np.float32))

    ref = reorganized_stpp_pool(scores, ticks, scaling, layout, cfg)
    got = reorganized_stpp_pool_pallas(scores, ticks, scaling, layout, cfg,
                                       interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_pool_padded_frames():
    rng = np.random.RandomState(1)
    cfg = StppConfig.from_raw((1, 1, 1))
    K = 3
    layout = ReorganizedScoreLayout(K + 1, K, 2 * K, cfg.feat_multiplier)
    T_real, T_pad, P = 20, 32, 8
    scores = rng.randn(T_pad, layout.total_cols).astype(np.float32)
    ticks = jnp.asarray(make_random_ticks(rng, P, T_real))
    scaling = jnp.asarray(rng.rand(P, 2).astype(np.float32))

    ref = reorganized_stpp_pool(jnp.asarray(scores), ticks, scaling, layout,
                                cfg, num_frames=T_real)
    got = reorganized_stpp_pool_pallas(jnp.asarray(scores), ticks, scaling,
                                       layout, cfg, num_frames=T_real,
                                       interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
