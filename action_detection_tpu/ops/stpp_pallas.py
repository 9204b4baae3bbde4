"""Pallas TPU kernel for reorganized STPP score pooling.

The XLA path (ops/stpp.py:reorganized_stpp_pool) materializes an exclusive
cumulative sum ``(T+1, J, C)`` in HBM and gathers twice per (proposal, part).
This kernel fuses cumsum + gather + weighted accumulation in VMEM: each grid
step loads one part's ``(T, C)`` score block once, computes the running sum
on-chip, and accumulates ``w[p, j] * mean(rows pl..pr)`` into the ``(P, C)``
output without writing any intermediate to HBM.

Grid: ``(J,)`` — one step per pyramid part; the output block is revisited and
accumulated across steps (sequential TPU grid). Part bounds/weights arrive as
scalar-prefetch operands so the DMA schedule is known before the body runs.

Used by inference when ``use_pallas=True`` (falls back to the XLA path off
TPU); parity is tested against the XLA path in tests/test_stpp_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stpp import ReorganizedScoreLayout, StppConfig, _part_bounds, reorganized_score_slices


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _inclusive_cumsum_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum over rows as a log-step (Hillis-Steele) scan.

    Mosaic has no cumsum primitive; this uses log2(T) full-block adds with
    circular rolls masked at the wrap boundary — pure VPU work.
    """
    T = x.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < T:
        rolled = pltpu.roll(x, shift, axis=0)
        x = x + jnp.where(row_ids >= shift, rolled, jnp.zeros_like(x))
        shift *= 2
    return x


def _pool_kernel(pl_ref, pr_ref, w_ref, scores_ref, out_ref, cs_ref):
    """One pyramid part: accumulate weighted part means into out.

    pl/pr: (P, J) int32 row bounds; w: (P, J) f32 weights (0 for invalid);
    scores_ref: (T, C) VMEM block of this part's columns; out_ref: (P, C);
    cs_ref: (T, C) VMEM scratch holding the running sum (dynamic row gathers
    must go through a ref — Mosaic has no dynamic_slice on values).
    """
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cs_ref[:] = _inclusive_cumsum_rows(scores_ref[:].astype(jnp.float32))

    n_props = out_ref.shape[0]

    def body(p, _):
        lo = pl_ref[p, j]
        hi = pr_ref[p, j]
        w = w_ref[p, j]
        # inclusive cumsum: sum rows [lo, hi) = cs[hi-1] - (cs[lo-1] if lo>0)
        upper = cs_ref[jnp.maximum(hi - 1, 0), :]
        lower = cs_ref[jnp.maximum(lo - 1, 0), :]
        lower = jnp.where(lo > 0, lower, jnp.zeros_like(lower))
        upper = jnp.where(hi > 0, upper, jnp.zeros_like(upper))
        denom = jnp.maximum(hi - lo, 1).astype(jnp.float32)
        mean = (upper - lower) / denom
        out_ref[p, :] += w * mean
        return 0

    jax.lax.fori_loop(0, n_props, body, 0)


# deferred import so the module can be inspected without pallas present
from jax.experimental import pallas as pl  # noqa: E402

try:  # pragma: no cover - only on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS_TPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PALLAS_TPU = False


@functools.partial(jax.jit, static_argnames=("n_parts", "interpret"))
def _pool_block_pallas(scores_parts: jnp.ndarray, pl_idx: jnp.ndarray,
                       pr_idx: jnp.ndarray, weights: jnp.ndarray,
                       n_parts: int, interpret: bool = False) -> jnp.ndarray:
    """scores_parts: (J, T, Cp); pl/pr/weights: (P, J). Returns (P, Cp)."""
    J, T, Cp = scores_parts.shape
    P = pl_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_parts,),
        in_specs=[
            # parts axis leads so the trailing block dims are full (T, Cp)
            # (Mosaic requires the last two block dims aligned or full);
            # index_map receives (grid idx, *scalar_prefetch_refs)
            pl.BlockSpec((1, T, Cp), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, Cp), lambda j, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, Cp), jnp.float32)],
    )

    def kernel(pl_ref, pr_ref, w_ref, scores_ref, out_ref, cs_ref):
        _pool_kernel(pl_ref, pr_ref, w_ref,
                     scores_ref[0], out_ref, cs_ref)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, Cp), jnp.float32),
        interpret=interpret,
    )(pl_idx, pr_idx, weights, scores_parts)


def reorganized_stpp_pool_pallas(scores: jnp.ndarray, prop_ticks: jnp.ndarray,
                                 prop_scaling: jnp.ndarray,
                                 layout: ReorganizedScoreLayout,
                                 cfg: StppConfig, num_frames=None,
                                 interpret: bool = False):
    """Drop-in replacement for reorganized_stpp_pool using the fused kernel.

    Pads part column blocks to the 128-lane boundary, runs one kernel per
    score head (act handled as a single-part pyramid over the course range).
    """
    T = scores.shape[0]
    if num_frames is None:
        num_frames = T
    act_slice, comp_slice, reg_slice = reorganized_score_slices(layout)
    J = layout.feat_multiplier

    pl_idx, pr_idx, valid, stage_idx = _part_bounds(prop_ticks, cfg, num_frames)
    pl_idx = jnp.clip(pl_idx, 0, T).astype(jnp.int32)
    pr_idx = jnp.clip(pr_idx, 0, T).astype(jnp.int32)
    scale_sel = jnp.stack([prop_scaling[:, 0],
                           jnp.ones_like(prop_scaling[:, 0]),
                           prop_scaling[:, 1]], axis=1)
    weights = jnp.where(valid, scale_sel[:, stage_idx], 0.0).astype(jnp.float32)

    def run_block(block_scores: jnp.ndarray, C: int, pl_b, pr_b, w_b):
        # (T, Jb, C) -> (Jb, T, Cp) with C padded to the 128-lane boundary
        Jb = block_scores.shape[1]
        Cp = _round_up(C, 128)
        padded = jnp.pad(block_scores, ((0, 0), (0, 0), (0, Cp - C)))
        padded = jnp.transpose(padded, (1, 0, 2))
        out = _pool_block_pallas(padded, pl_b, pr_b, w_b, n_parts=Jb,
                                 interpret=interpret)
        return out[:, :C]

    # activity (standalone classifier): single "part" covering course range
    if layout.standalone_classifier:
        act_raw = scores[:, act_slice][:, None, :]            # (T, 1, C)
        l = jnp.clip(prop_ticks[:, 1], 0, num_frames).astype(jnp.int32)[:, None]
        r = jnp.clip(jnp.maximum(prop_ticks[:, 1] + 1, prop_ticks[:, 2]),
                     0, num_frames).astype(jnp.int32)[:, None]
        ones = jnp.ones((prop_ticks.shape[0], 1), jnp.float32)
        act = run_block(act_raw, layout.act_len, l, r, ones)
    else:
        act_raw = scores[:, act_slice].reshape(T, J, layout.act_len)
        act = run_block(act_raw, layout.act_len, pl_idx, pr_idx, weights)

    comp_raw = scores[:, comp_slice].reshape(T, J, layout.comp_len)
    comp = run_block(comp_raw, layout.comp_len, pl_idx, pr_idx, weights)

    reg = None
    if layout.with_regression:
        reg_raw = scores[:, reg_slice].reshape(T, J, layout.reg_len)
        reg = run_block(reg_raw, layout.reg_len, pl_idx, pr_idx, weights)
    return act, comp, reg
