"""Pallas TPU kernel for the max-pool backward (a SelectAndScatter
replacement with EXACT first-match semantics).

Motivation: ``jax.grad`` of ``lax.reduce_window(max)`` lowers to XLA
SelectAndScatter, measured at ~83 ms of the 263 ms SSN train step at the
1,152-image recipe batch (scripts/train_profile_probe.py; the two
BNInception stem pools are ~73 ms of it). The HBM roofline for those pools
is ~10 ms (read x + y + dy, write dx once), so SelectAndScatter runs at
~15% of light speed. The r4/r5 attempt to beat it with an XLA-elementwise
eq-mask reformulation measured SLOWER (321.9 vs 262.7 ms fwd+bwd — see
ops/pooling.py); this kernel is the "real fused kernel" follow-up.

Semantics: identical to SelectAndScatter's GE-select — dy of each window
routes to the FIRST position (row-major within the window) whose value
equals the window max. This matches the plain AD path exactly (including
tie behavior), so adopting it changes no training semantics; the only
float caveat is add ORDER when several windows route into one input
position (ulp-level reassociation).

How it works (one grid step = a block of N images, everything in VMEM):

1.  For each of the kh*kw window offsets t=(dh,dw), gather the
    stride-decimated slice ``xs_t[i] = x[s*i + (d - pad_lo)]`` at window
    resolution with a strided ``lax.slice`` (out-of-range windows filled
    -inf so forward padding never matches).
2.  First-match index per window: iterate t DESCENDING over
    ``fm = where(xs_t == y, t, fm)`` — after the loop, fm holds the
    smallest matching t (exactly SelectAndScatter's scan order).
3.  Route: for each t, ``c_t = where(fm == t, dy, 0)`` lands on the input
    residue grid r = (d - pad_lo) mod s at a static offset — a contiguous
    pad+add at WINDOW resolution (no strided writes).
4.  Interleave the s*s residue accumulators back to the input grid with
    ``pltpu.repeat`` + parity masks (pure elementwise; no relayout).

All loops are static Python loops over the (small) kernel-offset count;
every intermediate except the final dx is at window resolution (~1/(s*s)
of the input), so the kernel is HBM-bound on the unavoidable x/dx traffic.

Capability note: the reference relies on torch's cuDNN MaxPool2d backward
(/root/reference/ssn_models.py:107-154 selects the torch-port backbones
whose pools this trains); this is the TPU-native equivalent of that fused
backward kernel.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Pad2 = Tuple[Tuple[int, int], Tuple[int, int]]


def _axis_offsets(d: int, pad_lo: int, size_in: int, size_out: int,
                  s: int):
    """Valid window-index range [i0, i1] for kernel offset d on one axis.

    e = d - pad_lo is the input-coordinate shift: window i reads input
    position u = s*i + e. Valid windows satisfy 0 <= u < size_in and
    0 <= i < size_out.
    """
    e = d - pad_lo
    i0 = max(-(-(-e) // s), 0)                  # ceil(-e / s)
    i1 = min((size_in - 1 - e) // s, size_out - 1)
    return e, i0, i1


def _pool_bwd_kernel(kernel, stride, padding, shapes, x_ref, y_ref, dy_ref,
                     dx_ref):
    (kh, kw), (sh, sw) = kernel, stride
    (plh, _), (plw, _) = padding
    H, W, Ho, Wo = shapes
    x = x_ref[...]
    y = y_ref[...]
    dy = dy_ref[...]
    NB, _, _, C = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    zero = jnp.asarray(0, dy.dtype)

    def xs_at(dh, dw):
        """x decimated onto window offset (dh, dw), -inf outside range."""
        eh, ih0, ih1 = _axis_offsets(dh, plh, H, Ho, sh)
        ew, iw0, iw1 = _axis_offsets(dw, plw, W, Wo, sw)
        if ih1 < ih0 or iw1 < iw0:
            return None, None
        sl = lax.slice(x, (0, sh * ih0 + eh, sw * iw0 + ew, 0),
                       (NB, sh * ih1 + eh + 1, sw * iw1 + ew + 1, C),
                       (1, sh, sw, 1))
        full = lax.pad(sl, neg,
                       ((0, 0, 0), (ih0, Ho - 1 - ih1, 0),
                        (iw0, Wo - 1 - iw1, 0), (0, 0, 0)))
        return full, ((eh, ih0, ih1), (ew, iw0, iw1))

    # --- first-match offset per window (descending t => smallest t wins,
    # exactly SelectAndScatter's row-major scan order) ---
    fm = jnp.full(y.shape, -1, jnp.int32)
    for tidx in range(kh * kw - 1, -1, -1):
        dh, dw = divmod(tidx, kw)
        xs, _ = xs_at(dh, dw)
        if xs is None:
            continue
        fm = jnp.where(xs == y, tidx, fm)

    # --- route dy onto the s*s input residue grids (window-res adds) ---
    accs = {}
    for tidx in range(kh * kw):
        dh, dw = divmod(tidx, kw)
        xs, rngs = xs_at(dh, dw)
        if xs is None:
            continue
        (eh, ih0, ih1), (ew, iw0, iw1) = rngs
        c = jnp.where(fm == tidx, dy, zero)
        c = lax.slice(c, (0, ih0, iw0, 0), (NB, ih1 + 1, iw1 + 1, C))
        rh, rw = eh % sh, ew % sw
        jh0 = ih0 + (eh - rh) // sh            # exact (eh ≡ rh mod sh)
        jw0 = iw0 + (ew - rw) // sw
        hh = (H - 1 - rh) // sh + 1            # residue-grid lengths
        ww = (W - 1 - rw) // sw + 1
        c = lax.pad(c, zero,
                    ((0, 0, 0), (jh0, hh - jh0 - (ih1 - ih0 + 1), 0),
                     (jw0, ww - jw0 - (iw1 - iw0 + 1), 0), (0, 0, 0)))
        key = (rh, rw)
        accs[key] = c if key not in accs else accs[key] + c

    # --- interleave residue grids back to the input grid ---
    iota_h = lax.broadcasted_iota(jnp.int32, (1, H, 1, 1), 1)
    iota_w = lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2)
    out = jnp.zeros((NB, H, W, C), dy.dtype)
    for (rh, rw), acc in accs.items():
        rep = acc
        if sh > 1:
            rep = pltpu.repeat(rep, sh, axis=1)
        if sw > 1:
            rep = pltpu.repeat(rep, sw, axis=2)
        # rep[q] = acc[q // s]; the residue positions u = s*j + r need
        # acc[j] = rep[u - r]: pad left by r, crop to (H, W)
        rep = lax.pad(rep, zero, ((0, 0, 0), (rh, 0, 0), (rw, 0, 0),
                                  (0, 0, 0)))
        rep = lax.slice(rep, (0, 0, 0, 0), (NB, H, W, C))
        mask = (iota_h % sh == rh) & (iota_w % sw == rw)
        out = out + jnp.where(mask, rep, zero)
    dx_ref[...] = out


def max_pool_bwd_pallas(x: jnp.ndarray, y: jnp.ndarray, dy: jnp.ndarray,
                        kernel: Tuple[int, int], stride: Tuple[int, int],
                        padding: Pad2, *, block_images: int | None = None,
                        interpret: bool | None = None) -> jnp.ndarray:
    """dx of an NHWC max pool via the Pallas kernel (module docstring).

    ``interpret=None`` auto-selects interpreter mode off-TPU (the CPU test
    mesh); ``block_images`` overrides the images-per-grid-step choice.
    """
    N, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    if dy.dtype != x.dtype:
        dy = dy.astype(x.dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if block_images is None:
        # x + dx at input res dominate VMEM; leave headroom for the
        # window-res intermediates and double buffering
        per_img = (2 * H * W + 2 * Ho * Wo) * C * x.dtype.itemsize
        block_images = max(1, min(8, int(5e6 // max(per_img, 1))))
    nb = min(block_images, N)

    kern = functools.partial(_pool_bwd_kernel, tuple(kernel), tuple(stride),
                             (tuple(padding[0]), tuple(padding[1])),
                             (H, W, Ho, Wo))
    grid = (pl.cdiv(N, nb),)
    spec_in = pl.BlockSpec((nb, H, W, C), lambda n: (n, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out_grid = pl.BlockSpec((nb, Ho, Wo, C), lambda n: (n, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_in, spec_out_grid, spec_out_grid],
        out_specs=spec_in,
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
        interpret=interpret,
    )(x, y, dy)
