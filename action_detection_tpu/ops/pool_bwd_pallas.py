"""Pallas TPU kernel for the max-pool backward (a SelectAndScatter
replacement with EXACT first-match semantics).

VERDICT (measured on-chip, v5e, /tmp/r5_poolbwd11.log): correct but
REJECTED as a default. All 8 correctness gates (4 pool shapes x f32/bf16,
int-valued) are EXACT vs the SelectAndScatter AD dx, but the kernel is
SLOWER at every recipe-batch pool — stem pool1 30.7 ms vs 13.0 (0.42x),
stem pool2 22.8 vs 10.2 (0.45x), 3c 17.6 vs 7.9 (0.45x), 4e 6.7 vs 4.9
(0.74x); ~150 GB/s effective vs SelectAndScatter's ~330-355 — and wiring
it into the full train step OOMs the HBM compile at the 1,152-image batch
(18.31G > 15.75G: the 5D reshape materializes as layout copies at input
resolution and breaks XLA's remat/fusion around the pools). Net:
SelectAndScatter on v5e is already within ~2.3x of the HBM roofline in
isolation; the in-step ~83 ms profile cost is remat scheduling, not kernel
inefficiency, so no standalone backward kernel can recover it. Kept as an
opt-in (``pooling.set_pool_backward('pallas')``) measured lever and as the
repo's worked example of Mosaic layout constraints (see Layout below).

Motivation: ``jax.grad`` of ``lax.reduce_window(max)`` lowers to XLA
SelectAndScatter, measured at ~83 ms of the 263 ms SSN train step at the
1,152-image recipe batch (scripts/train_profile_probe.py; the two
BNInception stem pools are ~73 ms of it). The HBM roofline for those pools
is ~10-15 ms (read x + y + dy, write dx once, at the padded T(8,128)
layout), so SelectAndScatter runs at ~5x off light speed. The r4/r5 attempt
to beat it with an XLA-elementwise eq-mask reformulation measured SLOWER
(321.9 vs 262.7 ms fwd+bwd — see ops/pooling.py); this kernel is the "real
fused kernel" follow-up.

Semantics: identical to SelectAndScatter's GE-select — dy of each window
routes to the FIRST position (row-major within the window) whose value
equals the window max. This matches the plain AD path exactly (including
tie behavior), so adopting it changes no training semantics; the only
float caveat is that multi-window contributions into one input position
accumulate in f32 and round once to the storage dtype, where the AD path
adds in that dtype (ulp-level reassociation on 16-bit inputs, exact
whenever sums are representable — the int-valued correctness gates are
bit-exact).

Layout: everything rides ONE free-at-trace-time reshape
``(N, H, W, C) -> (N, H/sh, sh, W/sw, sw*C)`` (a row-major view: input
position u = sh*i + rh lands at [i, rh], and the (w, c) pair at lane
rw*C + c). After it, every stride-decimated access in the kernel is a
UNIT-STRIDE slice — no strided vector ops (Mosaic implements those for
32-bit data only: ``tpu.strided_load`` rejects bf16 and
``vector.extract_strided_slice`` requires stride 1 — /tmp/r5_poolbwd2/4),
and no i32 pair-packing (whose halved lane count hits XLA's pad-to-128
tiling for a measured 4.0x HBM expansion and an OOM at the recipe batch —
/tmp/r5_poolbwd7.log). Native dtype end to end; the merged lane dim
sw*C >= 128 at every BNInception/ResNet/VGG pool keeps tiles dense.

How it works (one grid step = a block of N images, everything in VMEM):

1.  Group the kh*kw window offsets by (dh, eqw) where the w-axis shift is
    e_w = dw - pad_lo = sw*eqw + erw: for a fixed (dh, eqw) ALL w-residues
    erw share the same spatial slice of the 5D view — one full-lane read
    ``x5[:, i+eqh, erh, j+eqw, :]`` covers every erw lane group at once.
2.  Compare against y tiled sw times along lanes. First-match index per
    window AND lane group: iterate (dh, eqw) DESCENDING over
    ``fm = where(xs == yy, t_vec, fm)`` with ``t_vec = base + lane_group``
    (invalid lane groups masked to -2) — after the loop fm holds the
    smallest matching row-major offset, exactly SelectAndScatter's order.
3.  Route: ``c = where(fm == t_vec, dyy, 0)`` lands on the row-residue
    accumulator ``acc[erh]`` (shape [nb, Hq, Wq, sw*C], f32) at a static
    (eqh, eqw) offset — a contiguous pad+add at window resolution; the
    lane groups ARE the w-residues, so no interleave is ever needed.
4.  Store: ``dx5[:, :, rh, :, :] = acc[rh]`` — one unit-stride full-lane
    store per row residue (zeros for gap residues when stride > kernel).

All loops are static Python loops over the (small) offset-pair count;
every intermediate except the accumulators is at window resolution, so the
kernel is HBM-bound on the unavoidable x/dx traffic.

Capability note: the reference relies on torch's cuDNN MaxPool2d backward
(/root/reference/ssn_models.py:107-154 selects the torch-port backbones
whose pools this trains); this is the TPU-native equivalent of that fused
backward kernel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Pad2 = Tuple[Tuple[int, int], Tuple[int, int]]


def _offset_pairs(kernel, stride, padding, dims):
    """Static (dh, eqw) plan: one entry per full-lane compare (docstring #1).

    Returns tuples (erh, eqh, i0, i1, eqw, g_lo, g_hi, j0, j1, base) in
    ascending row-major-tidx order, where [i0, i1] x [j0, j1] is the valid
    window range, [g_lo, g_hi] the valid w-residue lane groups, and
    base + erw the row-major window offset tidx = dh*kw + dw.
    """
    (kh, kw), (sh, sw) = kernel, stride
    (plh, _), (plw, _) = padding
    Hq, Wq, Ho, Wo = dims
    pairs = []
    for dh in range(kh):
        eh = dh - plh
        erh = eh % sh
        eqh = (eh - erh) // sh
        i0, i1 = max(-eqh, 0), min(Hq - 1 - eqh, Ho - 1)
        if i1 < i0:
            continue
        for eqw in range((-plw) // sw, (kw - 1 - plw) // sw + 1):
            g_lo = max(0, -plw - sw * eqw)
            g_hi = min(sw - 1, kw - 1 - plw - sw * eqw)
            j0, j1 = max(-eqw, 0), min(Wq - 1 - eqw, Wo - 1)
            if g_hi < g_lo or j1 < j0:
                continue
            pairs.append((erh, eqh, i0, i1, eqw, g_lo, g_hi, j0, j1,
                          dh * kw + plw + sw * eqw))
    return pairs


def _pool_bwd_kernel(kernel, stride, padding, dims, x_ref, y_ref, dy_ref,
                     dx_ref):
    """x_ref/dx_ref are the 5D view (nb, Hq, sh, Wq, sw*C); y/dy 4D NHWC."""
    (_, _), (sh, sw) = kernel, stride
    Hq, Wq, Ho, Wo = dims
    # Compares run in f32: Mosaic has no bf16 cmpf at the packed 16-bit
    # layout ("Target does not support this comparison",
    # /tmp/r5_poolbwd10.log) and bf16->f32 is exact, so the f32 eq is
    # bit-equivalent to the bf16 eq it replaces.
    y = y_ref[...].astype(jnp.float32)
    dy = dy_ref[...]
    nb, _, _, C = y.shape
    lanes = sw * C
    neg = jnp.float32(-jnp.inf)
    pairs = _offset_pairs(kernel, stride, padding, dims)

    # y/dy tiled sw times along lanes: lane rw*C + c compares the w-residue
    # rw plane of x against the same window max (docstring #2).
    yy = jnp.concatenate([y] * sw, axis=-1) if sw > 1 else y
    dyy = (jnp.concatenate([dy] * sw, axis=-1) if sw > 1 else dy).astype(
        jnp.float32)
    glane = lax.broadcasted_iota(jnp.int32, (nb, Ho, Wo, lanes), 3) // C

    def xs_at(p):
        """Full-lane window-res slice of x5 at (dh, eqw), -inf outside.

        Invalid lane groups (their dw falls outside this pair's window)
        are masked to -inf IN THE FLOAT DOMAIN: their slots hold real x
        data from a neighboring dw's plane that may equal y. Masking the
        i1 compare instead trips a Mosaic relayout bug (full -> replicated
        on the & of a full eq with a lane-only mask, /tmp/r5_poolbwd8.log).
        """
        erh, eqh, i0, i1, eqw, g_lo, g_hi, j0, j1, _ = p
        sl = x_ref[:, i0 + eqh:i1 + 1 + eqh, erh,
                   j0 + eqw:j1 + 1 + eqw, :].astype(jnp.float32)
        full = lax.pad(sl, neg, ((0, 0, 0), (i0, Ho - 1 - i1, 0),
                                 (j0, Wo - 1 - j1, 0), (0, 0, 0)))
        if g_lo > 0 or g_hi < sw - 1:
            full = jnp.where((glane >= g_lo) & (glane <= g_hi), full, neg)
        return full

    def t_vec(p):
        """Row-major offset per lane group; -2 (never matched) when the
        group's dw falls outside the window."""
        _, _, _, _, _, g_lo, g_hi, _, _, base = p
        return jnp.where((glane >= g_lo) & (glane <= g_hi), base + glane,
                         jnp.int32(-2))

    # --- first-match offset per window+lane group (descending tidx =>
    # smallest match wins within the group, SelectAndScatter's scan order) ---
    big = jnp.int32(2 ** 30)
    fm = jnp.full((nb, Ho, Wo, lanes), big, jnp.int32)
    for p in reversed(pairs):
        # invalid lane groups can't match: xs_at masks them to -inf, so
        # the unmasked base+glane on those lanes is never written. The
        # arithmetic select (not jnp.where) matters: a select mixing a
        # full-layout cond with the lane-replicated t_vec makes Mosaic
        # demand an invalid full->replicated i1 relayout
        # (/tmp/r5_poolbwd9.log); the multiply only broadcasts
        # replicated->full, which is legal.
        m = (xs_at(p) == yy).astype(jnp.int32)
        fm = fm + m * (t_vec(p) - fm)

    # Global first match ACROSS lane groups: each group tracks only its own
    # w-residue's offsets, but SelectAndScatter routes to the single
    # smallest offset overall (ties can span residues). Group tidx sets are
    # disjoint (tidx mod structure fixes the residue), so gm == t_vec on
    # group g iff g holds the true first match.
    if sw > 1:
        gm = lax.slice_in_dim(fm, 0, C, axis=3)
        for g in range(1, sw):
            gm = jnp.minimum(gm, lax.slice_in_dim(fm, g * C, (g + 1) * C,
                                                  axis=3))
        fm = jnp.concatenate([gm] * sw, axis=-1)

    # --- route dy onto the sh row-residue accumulators (docstring #3) ---
    accs = {}
    for p in pairs:
        erh, eqh, i0, i1, eqw, _, _, j0, j1, _ = p
        # multiplicative routing for the same relayout reason as the fm pass
        c = dyy * (fm == t_vec(p)).astype(jnp.float32)
        c = lax.slice(c, (0, i0, j0, 0), (nb, i1 + 1, j1 + 1, lanes))
        c = lax.pad(c, jnp.float32(0),
                    ((0, 0, 0), (i0 + eqh, Hq - (i1 + 1 + eqh), 0),
                     (j0 + eqw, Wq - (j1 + 1 + eqw), 0), (0, 0, 0)))
        accs[erh] = c if erh not in accs else accs[erh] + c

    # --- one unit-stride store per row residue (docstring #4) ---
    for rh in range(sh):
        acc = accs.get(rh)
        val = (jnp.zeros((nb, Hq, Wq, lanes), dx_ref.dtype) if acc is None
               else acc.astype(dx_ref.dtype))
        dx_ref[:, :, rh, :, :] = val


def max_pool_bwd_pallas(x: jnp.ndarray, y: jnp.ndarray, dy: jnp.ndarray,
                        kernel: Tuple[int, int], stride: Tuple[int, int],
                        padding: Pad2, *, block_images: int | None = None,
                        interpret: bool | None = None) -> jnp.ndarray:
    """dx of an NHWC max pool via the Pallas kernel (module docstring).

    Float dtypes only (AD never flows through integer pools — max_pool_2d
    dispatches those to the plain path). ``interpret=None`` auto-selects
    interpreter mode off-TPU (the CPU test mesh); ``block_images``
    overrides the images-per-grid-step choice.
    """
    N, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    (sh, sw) = tuple(stride)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(f"max_pool_bwd_pallas is float-only, got {x.dtype}")
    if dy.dtype != x.dtype:
        dy = dy.astype(x.dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    # Round H/W up to stride multiples so every residue grid is exactly
    # (Hq, Wq); -inf tail cells never match a (finite) window max, and the
    # pad fuses into the 4D->5D relayout copy XLA emits anyway.
    Hq, Wq = -(-H // sh), -(-W // sw)
    Hp, Wp = Hq * sh, Wq * sw
    if (Hp, Wp) != (H, W):
        x = lax.pad(x, jnp.asarray(-jnp.inf, x.dtype),
                    ((0, 0, 0), (0, Hp - H, 0), (0, Wp - W, 0), (0, 0, 0)))
    x5 = x.reshape(N, Hq, sh, Wq, sw * C)

    if block_images is None:
        # x5 + dx5 (double-buffered) dominate VMEM; the flat term covers
        # y/dy blocks, fm/yy/dyy, the f32 accumulators and per-pair temps.
        per_img = H * W * C * (5 * x.dtype.itemsize + 13)
        block_images = max(1, min(8, int(72e6 // max(per_img, 1))))
    nb = min(block_images, N)

    kern = functools.partial(_pool_bwd_kernel, tuple(kernel), (sh, sw),
                             (tuple(padding[0]), tuple(padding[1])),
                             (Hq, Wq, Ho, Wo))
    spec5 = pl.BlockSpec((nb, Hq, sh, Wq, sw * C), lambda n: (n, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((nb, Ho, Wo, C), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    dx5 = pl.pallas_call(
        kern,
        grid=(pl.cdiv(N, nb),),
        in_specs=[spec5, spec4, spec4],
        out_specs=spec5,
        out_shape=jax.ShapeDtypeStruct((N, Hq, sh, Wq, sw * C), x.dtype),
        # the image-block dim must be SEQUENTIAL: left as the default
        # (parallel), the compiler accounts scoped vmem per grid step and
        # the kernel "OOMs" linearly in N (measured: 18M at N=4, 44M at
        # N=64 against the 16M scoped limit, same blocks)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x5, y, dy)
    dx = dx5.reshape(N, Hp, Wp, C)
    if (Hp, Wp) != (H, W):
        dx = lax.slice(dx, (0, 0, 0, 0), (N, H, W, C))
    return dx
