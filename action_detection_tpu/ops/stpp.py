"""Structured Temporal Pyramid Pooling (STPP), TPU-native formulations.

Semantics parity targets (reference, for behavior only):
  training pooling  /root/reference/ops/ssn_ops.py:22-79
  reorganized test  /root/reference/ops/ssn_ops.py:82-170

Design notes (this is the core re-design, not a translation):

* **Training**: the reference loops over pyramid parts and concatenates
  per-part segment means. Because the segment->part assignment is static, the
  whole pyramid is one matmul: ``out[p, j, d] = sum_s W[s, j] * ft[p, s, d]``
  with a precomputed ``(num_segments, num_parts)`` pooling matrix ``W`` that
  already folds in the per-stage ``1/norm_num`` normalization. Start/end
  stages are then scaled by the per-proposal validity scaling. XLA maps this
  onto the MXU and fuses the scaling multiply.

* **Testing**: the reference loops over proposals in Python, averaging rows
  of a shared ``(frames, score_dim)`` matrix per pyramid part. We compute one
  exclusive cumulative sum over frames and turn every part mean into two
  gathers and a subtraction: ``mean = (cs[pr] - cs[pl]) / (pr - pl)``. Cost is
  O(frames * dim + proposals * parts * dim), fully vectorized, jittable, and
  pads cleanly to static frame buckets (rows past the real frame count never
  enter any gather because tick indices are bounded by the real count).

Integer tick semantics (the reference's float64 ``np.arange`` stage
subdivision with ``int()`` truncation, stage skipping when the stage lies
outside the scored range, ``right = max(left+1, next_tick)``) follow the
reference bit-for-bit via host-computed part bounds
(:func:`reference_part_bounds`); see tests/test_reference_oracle.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

StageSpec = Union[int, Tuple[int, ...]]


def parse_stage_config(stage_cfg: StageSpec) -> Tuple[Tuple[int, ...], int]:
    """Normalize a stage spec to (parts tuple, total part count)."""
    if isinstance(stage_cfg, int):
        return (stage_cfg,), stage_cfg
    if isinstance(stage_cfg, (tuple, list)):
        return tuple(stage_cfg), sum(stage_cfg)
    raise ValueError(f"Incorrect STPP config {stage_cfg}")


@dataclasses.dataclass(frozen=True)
class StppConfig:
    """Static pyramid structure: pyramid level sizes for the 3 stages."""
    starting_parts: Tuple[int, ...]
    course_parts: Tuple[int, ...]
    ending_parts: Tuple[int, ...]

    @classmethod
    def from_raw(cls, cfg: Sequence[StageSpec]) -> "StppConfig":
        s, _ = parse_stage_config(cfg[0])
        c, _ = parse_stage_config(cfg[1])
        e, _ = parse_stage_config(cfg[2])
        return cls(s, c, e)

    @property
    def stage_parts(self) -> Tuple[Tuple[int, ...], ...]:
        return (self.starting_parts, self.course_parts, self.ending_parts)

    @property
    def stage_multipliers(self) -> Tuple[int, int, int]:
        return (sum(self.starting_parts), sum(self.course_parts), sum(self.ending_parts))

    @property
    def feat_multiplier(self) -> int:
        return sum(self.stage_multipliers)

    def part_table(self):
        """Per-part static metadata: (stage_idx, level_size, index_in_level).

        Parts are enumerated in the reference's concatenation order: stages in
        (start, course, end) order, pyramid levels within a stage in config
        order, parts within a level left to right.
        """
        table = []
        for stage_idx, parts in enumerate(self.stage_parts):
            for n_part in parts:
                for i in range(n_part):
                    table.append((stage_idx, n_part, i))
        return table


def stpp_pool_matrix(seg_split: Tuple[int, int, int], cfg: StppConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Build the static (num_segments, num_parts) training pooling matrix.

    ``seg_split = (x1, x2, n_seg)``: segments [0,x1) are the starting stage,
    [x1,x2) the course stage, [x2,n_seg) the ending stage. Entry ``W[s, j]``
    is ``1 / (len(part_j) * norm_num(stage of j))`` when segment ``s`` falls in
    part ``j``. Also returns ``stage_id`` (num_parts,) in {0,1,2} for applying
    the start/end validity scaling.
    """
    x1, x2, n_seg = seg_split
    stage_bounds = [(0, x1), (x1, x2), (x2, n_seg)]
    mults = cfg.stage_multipliers

    cols = []
    stage_ids = []
    for stage_idx, parts in enumerate(cfg.stage_parts):
        lo, hi = stage_bounds[stage_idx]
        stage_len = hi - lo
        for n_part in parts:
            # part boundaries replicate arange(0, L+eps, L/n) + int() truncation
            ticks = [int(stage_len * i / n_part) for i in range(n_part + 1)]
            ticks[-1] = stage_len
            for i in range(n_part):
                col = np.zeros(n_seg, dtype=np.float32)
                lo_i, hi_i = lo + ticks[i], lo + ticks[i + 1]
                if hi_i > lo_i:
                    col[lo_i:hi_i] = 1.0 / ((hi_i - lo_i) * mults[stage_idx])
                cols.append(col)
                stage_ids.append(stage_idx)
    return np.stack(cols, axis=1), np.asarray(stage_ids, dtype=np.int32)


def stpp_train_pool(ft: jnp.ndarray, scaling: jnp.ndarray,
                    seg_split: Tuple[int, int, int], cfg: StppConfig,
                    standalone_classifier: bool = True):
    """Training-time STPP.

    Args:
      ft: ``(P, S, D)`` per-segment features (P proposals, S segments).
      scaling: ``(P, 2)`` start/end stage validity scalings.
      seg_split: static ``(x1, x2, S)`` stage boundaries.
      cfg: pyramid structure.
      standalone_classifier: when True (SSN's setting) the activity feature is
        the plain course-stage mean; otherwise it is the full pyramid.

    Returns:
      ``(activity_ft, completeness_ft)`` of shapes ``(P, D)`` (sc) or
      ``(P, J*D)``, and ``(P, J*D)`` — part-major layout matching the
      reference's concatenation order.
    """
    W_np, stage_ids = stpp_pool_matrix(seg_split, cfg)
    W = jnp.asarray(W_np)                              # (S, J)
    # full-precision contraction: the pooling matrix is exact part weights and
    # this runs once per step over a tiny S axis — bf16 MXU rounding here
    # costs accuracy for no speed
    pooled = jnp.einsum("psd,sj->pjd", ft, W, precision=jax.lax.Precision.HIGHEST)

    # scale factor per part: scaling[:,0] for start parts, 1 for course,
    # scaling[:,1] for end parts
    scale_sel = jnp.stack([scaling[:, 0],
                           jnp.ones_like(scaling[:, 0]),
                           scaling[:, 1]], axis=1)     # (P, 3)
    part_scale = scale_sel[:, stage_ids]               # (P, J)
    pooled = pooled * part_scale[:, :, None]

    P, J, D = pooled.shape
    stpp_ft = pooled.reshape(P, J * D)
    if standalone_classifier:
        x1, x2, _ = seg_split
        course_ft = ft[:, x1:x2, :].mean(axis=1)
        return course_ft, stpp_ft
    return stpp_ft, stpp_ft


@dataclasses.dataclass(frozen=True)
class ReorganizedScoreLayout:
    """Column layout of the fused test-FC output (act | comp parts | reg parts)."""
    act_len: int
    comp_len: int
    reg_len: int
    feat_multiplier: int
    standalone_classifier: bool = True
    with_regression: bool = True

    @property
    def act_cols(self) -> int:
        return self.act_len if self.standalone_classifier else self.act_len * self.feat_multiplier

    @property
    def total_cols(self) -> int:
        cols = self.act_cols + self.comp_len * self.feat_multiplier
        if self.with_regression:
            cols += self.reg_len * self.feat_multiplier
        return cols


def reorganized_score_slices(layout: ReorganizedScoreLayout):
    """(act, comp, reg) column slices of the fused score matrix."""
    act = slice(0, layout.act_cols)
    comp = slice(act.stop, act.stop + layout.comp_len * layout.feat_multiplier)
    reg = slice(comp.stop, comp.stop + layout.reg_len * layout.feat_multiplier) \
        if layout.with_regression else None
    return act, comp, reg


def reference_part_bounds(prop_ticks: np.ndarray, cfg: StppConfig):
    """Host-side per-(proposal, part) [pl, pr) bounds, bit-exact vs reference.

    The reference computes part boundaries as
    ``int(np.arange(left, right + 1e-5, (right - left) / n_part)[k])``
    (ops/ssn_ops.py:144-147). ``np.arange`` fills by *accumulating* the
    float64 step with per-element rounding, so e.g. span 7 / 3 parts ends at
    23.999999999999996 -> int 23 (NOT the rational 24) while span 2 / 3 parts
    ends at 22.000000000000004 -> 22. No closed-form integer or float32
    formula reproduces this, so the literal float64 pipeline runs here on
    host — proposal ticks are host data before they ever ship to the device.
    Returns (pl, pr) int32 arrays of shape (P, J).
    """
    ticks = np.asarray(prop_ticks)
    table = cfg.part_table()
    P, J = ticks.shape[0], len(table)
    pl = np.zeros((P, J), np.int32)
    pr = np.zeros((P, J), np.int32)
    memo = {}
    for j, (s, n_part, k) in enumerate(table):
        for p in range(P):
            left = int(ticks[p, s])
            right = max(left + 1, int(ticks[p, s + 1]))
            key = (left, right, n_part)
            bounds = memo.get(key)
            if bounds is None:
                part_ticks = np.arange(left, right + 1e-5,
                                       (right - left) / n_part)
                bounds = memo[key] = [int(x) for x in part_ticks]
            pl[p, j] = bounds[k]
            pr[p, j] = bounds[k + 1]
    return pl, pr


def _part_bounds_rational(prop_ticks: jnp.ndarray, cfg: StppConfig):
    """In-graph [pl, pr) bounds: exact rational truncation toward zero.

    Used only when the ticks are traced (no host values available). Matches
    :func:`reference_part_bounds` except where the reference's float64
    arange accumulation itself deviates from exact rational arithmetic
    (non-power-of-two part counts whose final boundary lands a hair below
    the integer — see reference_part_bounds); prefer passing host-computed
    bounds via ``part_bounds=`` for bit parity.
    """
    table = cfg.part_table()
    stage_idx = jnp.asarray([t[0] for t in table], dtype=jnp.int32)      # (J,)
    n_part = jnp.asarray([t[1] for t in table], dtype=jnp.int32)
    part_i = jnp.asarray([t[2] for t in table], dtype=jnp.int32)

    ticks = prop_ticks.astype(jnp.int32)                                 # (P, 4)
    left = jnp.take(ticks, stage_idx, axis=1)                            # (P, J)
    nxt = jnp.take(ticks, stage_idx + 1, axis=1)
    right = jnp.maximum(left + 1, nxt)

    def trunc_div(num, den):
        # rational truncation toward zero (Python int(); // floors)
        return jnp.where(num >= 0, num // den, -((-num) // den))

    span = right - left
    n = n_part[None, :]
    pl = trunc_div(left * n + part_i[None, :] * span, n)
    pr = trunc_div(left * n + (part_i[None, :] + 1) * span, n)
    return pl, pr


def _part_validity(prop_ticks, pl, pr, cfg: StppConfig, num_frames):
    """Stage skip rule (right<=0 or left>=num_frames, ssn_ops.py:140) and the
    per-part pr-pl>=1 rule, computed in-graph so num_frames can be traced."""
    table = cfg.part_table()
    stage_idx = jnp.asarray([t[0] for t in table], dtype=jnp.int32)
    ticks = prop_ticks.astype(jnp.int32)
    left = jnp.take(ticks, stage_idx, axis=1)
    nxt = jnp.take(ticks, stage_idx + 1, axis=1)
    right = jnp.maximum(left + 1, nxt)
    stage_valid = (right > 0) & (left < num_frames)
    return stage_valid & ((pr - pl) >= 1), stage_idx


def _pool_block(cs: jnp.ndarray, pl: jnp.ndarray, pr: jnp.ndarray,
                valid: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Sum over parts of scaled part means from an exclusive cumsum.

    cs: ``(T+1, J, C)`` exclusive cumsum over frames of the part-major score
    block; pl/pr/valid: ``(P, J)``; scale: ``(P, J)``.
    Returns ``(P, C)``.
    """
    T = cs.shape[0] - 1
    pl_c = jnp.clip(pl, 0, T)
    pr_c = jnp.clip(pr, 0, T)
    j_idx = jnp.arange(cs.shape[1])[None, :]                   # (1, J)
    upper = cs[pr_c, j_idx]                                    # (P, J, C)
    lower = cs[pl_c, j_idx]
    denom = jnp.maximum(pr_c - pl_c, 1).astype(cs.dtype)
    means = (upper - lower) / denom[:, :, None]
    weights = jnp.where(valid, scale, 0.0).astype(cs.dtype)    # (P, J)
    return jnp.einsum("pjc,pj->pc", means, weights,
                      precision=jax.lax.Precision.HIGHEST)


def reorganized_stpp_pool(scores: jnp.ndarray, prop_ticks: jnp.ndarray,
                          prop_scaling: jnp.ndarray,
                          layout: ReorganizedScoreLayout, cfg: StppConfig,
                          num_frames=None, part_bounds=None):
    """Pool per-frame fused scores into per-proposal (act, comp, reg) scores.

    Args:
      scores: ``(T, total_cols)`` per-frame fused test-FC outputs. Rows at or
        beyond the real frame count (``num_frames``) may be padding.
      prop_ticks: ``(P, 4)`` int frame ticks (start-aug, start, end, end-aug)
        in subsampled-frame coordinates.
      prop_scaling: ``(P, 2)`` start/end validity scalings.
      layout: fused-score column layout.
      cfg: pyramid structure.
      num_frames: real (unpadded) number of scored frames; defaults to ``T``.
      part_bounds: optional host-precomputed ``(pl, pr)`` from
        :func:`reference_part_bounds`. When None and ``prop_ticks`` is
        concrete (host data), bounds are computed with the bit-exact host
        formula automatically; traced ticks fall back to the rational
        in-graph formula (see _part_bounds_rational).

    Returns:
      ``(act (P, act_len), comp (P, comp_len), reg (P, reg_len) or None)``.
    """
    T = scores.shape[0]
    if num_frames is None:
        num_frames = T
    act_slice, comp_slice, reg_slice = reorganized_score_slices(layout)
    J = layout.feat_multiplier

    if part_bounds is None and not isinstance(prop_ticks, jax.core.Tracer):
        part_bounds = reference_part_bounds(np.asarray(prop_ticks), cfg)
    if part_bounds is not None:
        pl = jnp.asarray(part_bounds[0], jnp.int32)
        pr = jnp.asarray(part_bounds[1], jnp.int32)
    else:
        pl, pr = _part_bounds_rational(prop_ticks, cfg)
    valid, stage_idx = _part_validity(prop_ticks, pl, pr, cfg, num_frames)
    scale_sel = jnp.stack([prop_scaling[:, 0],
                           jnp.ones_like(prop_scaling[:, 0]),
                           prop_scaling[:, 1]], axis=1)        # (P, 3)
    part_scale = scale_sel[:, stage_idx]                       # (P, J)

    def excl_cumsum(block: jnp.ndarray) -> jnp.ndarray:
        zeros = jnp.zeros((1,) + block.shape[1:], dtype=block.dtype)
        return jnp.concatenate([zeros, jnp.cumsum(block, axis=0)], axis=0)

    # activity: standalone classifier pools the plain course range
    if layout.standalone_classifier:
        act_raw = scores[:, act_slice]
        cs_act = excl_cumsum(act_raw)                          # (T+1, C)
        l = jnp.clip(prop_ticks[:, 1], 0, num_frames)
        r = jnp.clip(jnp.maximum(prop_ticks[:, 1] + 1, prop_ticks[:, 2]), 0, num_frames)
        denom = jnp.maximum(r - l, 1).astype(scores.dtype)
        act = (cs_act[r] - cs_act[l]) / denom[:, None]
    else:
        act_raw = scores[:, act_slice].reshape(T, J, layout.act_len)
        act = _pool_block(excl_cumsum(act_raw), pl, pr, valid, part_scale)

    comp_raw = scores[:, comp_slice].reshape(T, J, layout.comp_len)
    comp = _pool_block(excl_cumsum(comp_raw), pl, pr, valid, part_scale)

    reg = None
    if layout.with_regression:
        reg_raw = scores[:, reg_slice].reshape(T, J, layout.reg_len)
        reg = _pool_block(excl_cumsum(reg_raw), pl, pr, valid, part_scale)
    return act, comp, reg
