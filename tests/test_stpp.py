"""STPP tests: matmul-form training pool and cumsum-gather test pool against
straightforward loop oracles implementing the reference semantics
(/root/reference/ops/ssn_ops.py:39-70 and :126-170)."""

import numpy as np
import pytest

import jax.numpy as jnp

from action_detection_tpu.ops.stpp import (
    StppConfig, ReorganizedScoreLayout, parse_stage_config,
    stpp_pool_matrix, stpp_train_pool, reorganized_stpp_pool,
    reorganized_score_slices,
)


def oracle_train_stpp(ft, scaling, seg_split, stage_parts, sc=True):
    """Loop oracle of training STPP (part-major concat of scaled part means)."""
    x1, x2, n_seg = seg_split
    P, S, D = ft.shape
    bounds = [(0, x1), (x1, x2), (x2, n_seg)]
    mults = [sum(p) for p in stage_parts]
    parts_out = []
    for stage_idx, parts in enumerate(stage_parts):
        lo, hi = bounds[stage_idx]
        stage_len = hi - lo
        stage_ft = ft[:, lo:hi, :]
        if stage_idx == 0:
            s = scaling[:, 0]
        elif stage_idx == 2:
            s = scaling[:, 1]
        else:
            s = None
        for n_part in parts:
            ticks = np.arange(0, stage_len + 1e-5, stage_len / n_part)
            for i in range(n_part):
                part = stage_ft[:, int(ticks[i]):int(ticks[i + 1]), :].mean(axis=1) / mults[stage_idx]
                if s is not None:
                    part = part * s[:, None]
                parts_out.append(part)
    stpp_ft = np.concatenate(parts_out, axis=1)
    if sc:
        return ft[:, x1:x2, :].mean(axis=1), stpp_ft
    return stpp_ft, stpp_ft


def oracle_reorg_pool(scores, ticks_arr, scaling_arr, layout, stage_parts):
    """Loop oracle of the reorganized test pooling (per-proposal pspool)."""
    T = scores.shape[0]
    J = layout.feat_multiplier
    act_s, comp_s, reg_s = reorganized_score_slices(layout)
    n_out = ticks_arr.shape[0]
    out_act = np.zeros((n_out, layout.act_len))
    out_comp = np.zeros((n_out, layout.comp_len))
    out_reg = np.zeros((n_out, layout.reg_len)) if layout.with_regression else None

    def pspool(out, i, raw, ticks, scaling, score_len):
        offset = 0
        for stage_idx, parts in enumerate(stage_parts):
            if stage_idx == 0:
                s = scaling[0]
            elif stage_idx == len(stage_parts) - 1:
                s = scaling[1]
            else:
                s = 1.0
            stage_cnt = sum(parts)
            left = ticks[stage_idx]
            right = max(ticks[stage_idx] + 1, ticks[stage_idx + 1])
            if right <= 0 or left >= T:
                offset += stage_cnt
                continue
            for n_part in parts:
                part_ticks = np.arange(left, right + 1e-5, (right - left) / n_part)
                for k in range(n_part):
                    pl = int(part_ticks[k])
                    pr = int(part_ticks[k + 1])
                    if pr - pl >= 1:
                        out[i, :] += raw[pl:pr, offset * score_len:(offset + 1) * score_len].mean(axis=0) * s
                    offset += 1

    raw_act = scores[:, act_s]
    raw_comp = scores[:, comp_s]
    raw_reg = scores[:, reg_s] if layout.with_regression else None
    for i in range(n_out):
        t = ticks_arr[i]
        if layout.standalone_classifier:
            out_act[i, :] = raw_act[t[1]:max(t[1] + 1, t[2]), :].mean(axis=0)
        else:
            pspool(out_act, i, raw_act, t, scaling_arr[i], layout.act_len)
        pspool(out_comp, i, raw_comp, t, scaling_arr[i], layout.comp_len)
        if layout.with_regression:
            pspool(out_reg, i, raw_reg, t, scaling_arr[i], layout.reg_len)
    return out_act, out_comp, out_reg


def test_parse_stage_config():
    assert parse_stage_config(3) == ((3,), 3)
    assert parse_stage_config((1, 2)) == ((1, 2), 3)
    with pytest.raises(ValueError):
        parse_stage_config("x")


@pytest.mark.parametrize("raw_cfg", [(1, 1, 1), (1, (1, 2), 1), (2, (1, 2, 4), 2)])
def test_pool_matrix_rows_sum(raw_cfg):
    cfg = StppConfig.from_raw(raw_cfg)
    W, stage_ids = stpp_pool_matrix((2, 7, 9), cfg)
    assert W.shape == (9, cfg.feat_multiplier)
    assert stage_ids.shape == (cfg.feat_multiplier,)
    # each part column sums to 1/norm_num of its stage
    mults = cfg.stage_multipliers
    col_sums = W.sum(axis=0)
    for j, sid in enumerate(stage_ids):
        assert abs(col_sums[j] - 1.0 / mults[sid]) < 1e-6


@pytest.mark.parametrize("raw_cfg,sc", [((1, 1, 1), True), ((1, (1, 2), 1), True),
                                        ((1, (1, 2), 1), False)])
def test_train_pool_matches_oracle(raw_cfg, sc):
    rng = np.random.RandomState(3)
    cfg = StppConfig.from_raw(raw_cfg)
    P, S, D = 16, 9, 12
    ft = rng.randn(P, S, D).astype(np.float32)
    scaling = rng.rand(P, 2).astype(np.float32)
    seg_split = (2, 7, 9)
    act, comp = stpp_train_pool(jnp.asarray(ft), jnp.asarray(scaling),
                                seg_split, cfg, standalone_classifier=sc)
    o_act, o_comp = oracle_train_stpp(ft, scaling, seg_split, cfg.stage_parts, sc=sc)
    np.testing.assert_allclose(np.asarray(act), o_act, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp), o_comp, rtol=1e-5, atol=1e-5)


def make_random_ticks(rng, n_prop, T):
    """Random monotone tick 4-tuples with the dataset invariant tick[1] < T
    (proposal starts lie strictly inside the video; ssn_dataset.py:423-424),
    including degenerate edge cases."""
    ticks = np.empty((n_prop, 4), dtype=np.int64)
    for i in range(n_prop):
        t1 = rng.randint(0, T)
        t0 = rng.randint(0, t1 + 1)
        t2 = rng.randint(t1, T + 1)
        t3 = rng.randint(t2, T + 1)
        ticks[i] = (t0, t1, t2, t3)
    # force some degenerate proposals: zero-length stages, full-video spans
    if n_prop >= 3:
        ticks[0] = [0, 0, T, T]
        ticks[1] = [0, T // 2, T // 2, T]
        ticks[2] = [T - 1, T - 1, T, T]
    return ticks


@pytest.mark.parametrize("raw_cfg", [(1, 1, 1), (1, (1, 2), 1)])
def test_reorganized_pool_matches_oracle(raw_cfg):
    rng = np.random.RandomState(4)
    cfg = StppConfig.from_raw(raw_cfg)
    K = 5
    layout = ReorganizedScoreLayout(act_len=K + 1, comp_len=K, reg_len=2 * K,
                                    feat_multiplier=cfg.feat_multiplier)
    T, P = 37, 24
    scores = rng.randn(T, layout.total_cols).astype(np.float32)
    ticks = make_random_ticks(rng, P, T)
    scaling = rng.rand(P, 2).astype(np.float32)

    act, comp, reg = reorganized_stpp_pool(
        jnp.asarray(scores), jnp.asarray(ticks), jnp.asarray(scaling), layout, cfg)
    o_act, o_comp, o_reg = oracle_reorg_pool(scores.astype(np.float64), ticks,
                                             scaling.astype(np.float64), layout,
                                             cfg.stage_parts)
    np.testing.assert_allclose(np.asarray(act), o_act, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(comp), o_comp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), o_reg, rtol=1e-4, atol=1e-4)


def test_reorganized_pool_padding_invariance():
    """Padding the frame axis must not change pooled outputs."""
    rng = np.random.RandomState(5)
    cfg = StppConfig.from_raw((1, 1, 1))
    K = 3
    layout = ReorganizedScoreLayout(act_len=K + 1, comp_len=K, reg_len=2 * K,
                                    feat_multiplier=cfg.feat_multiplier)
    T, P = 20, 8
    scores = rng.randn(T, layout.total_cols).astype(np.float32)
    ticks = make_random_ticks(rng, P, T)
    scaling = rng.rand(P, 2).astype(np.float32)

    base = reorganized_stpp_pool(jnp.asarray(scores), jnp.asarray(ticks),
                                 jnp.asarray(scaling), layout, cfg)
    padded = np.concatenate([scores, rng.randn(12, layout.total_cols).astype(np.float32)])
    padded_out = reorganized_stpp_pool(jnp.asarray(padded), jnp.asarray(ticks),
                                       jnp.asarray(scaling), layout, cfg, num_frames=T)
    for b, p in zip(base, padded_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(p), rtol=1e-6, atol=1e-6)
