"""Max pooling with an eq-mask custom backward (TPU-friendly).

``jax.grad`` of ``lax.reduce_window(max)`` lowers to XLA SelectAndScatter,
which Mosaic/XLA:TPU executes as an unfused windowed scatter. The r4 train
profile (scripts/train_profile_probe.py) measured the BNInception pools'
backward at ~83 ms of the 263 ms train step (~32%), almost all of it in the
two stem pools (112^2 x 64 and 56^2 x 192 at the 1,152-image recipe batch).

This module keeps the forward bit-identical (the same reduce_window max) and
replaces only the VJP with the classic eq-mask formulation (what Caffe's CPU
pooling backward does): route dy to every input position whose value equals
the window max. Computed as kh*kw shifted compare-select-adds over the
stride-dilated output grid - all elementwise ops XLA fuses into one loop,
instead of a SelectAndScatter.

Tie semantics deliberately differ from SelectAndScatter: when several
positions inside one window tie at the max, SelectAndScatter routes dy to
the first in scan order while eq-mask routes a full dy to each (the summed
gradient magnitude grows). Ties are measure-zero for conv/BN float
activations; the difference is documented and pinned in
tests/test_pooling.py rather than hidden.

Behavior being trained matches the reference's max pools (torch
nn.MaxPool2d inside the BNInception/InceptionV3 ports selected at
/root/reference/ssn_models.py:107-154); torch's CUDA pooling backward is
atomic-add over argmax, i.e. also not first-match - exact tie routing was
never part of the reference contract.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pad2 = Tuple[Tuple[int, int], Tuple[int, int]]


def _reduce_max(x: jnp.ndarray, kernel: Tuple[int, int],
                stride: Tuple[int, int], padding: Pad2) -> jnp.ndarray:
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, jnp.asarray(init, x.dtype), lax.max,
        (1, kernel[0], kernel[1], 1), (1, stride[0], stride[1], 1),
        ((0, 0), padding[0], padding[1], (0, 0)))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(x: jnp.ndarray, kernel: Tuple[int, int],
             stride: Tuple[int, int], padding: Pad2) -> jnp.ndarray:
    """NHWC max pool; forward == flax.linen.max_pool, backward = eq-mask.

    ``padding`` is ((top, bottom), (left, right)) explicit spatial padding.
    """
    return _reduce_max(x, kernel, stride, padding)


def _fwd(x, kernel, stride, padding):
    y = _reduce_max(x, kernel, stride, padding)
    return y, (x, y)


def _bwd(kernel, stride, padding, res, dy):
    """Residue-class (space-to-depth) eq-mask backward.

    dx[p] = sum over windows i covering p of [x[p] == y[i]] * dy[i]. Group
    input positions by their stride residue r = p mod s: every position in
    residue class r is covered by the same pattern of T_r = ceil((k-r)/s)
    window shifts, so its gradient is T_r shifted compare-select-adds at
    OUTPUT resolution. Two earlier formulations OOMed at the 1,152-image
    stem batch (measured, /tmp/trainprof*.log): dense input-resolution
    dilation peaked 27.6G HBM (XLA kept remat clones of the full-size add
    chain live), and lax.map batch chunking forced 2x-padded layout copies
    of the whole input. Here the only input-resolution buffers are the
    final residue interleave and dx itself.
    """
    x, y = res
    (kh, kw), (sh, sw) = kernel, stride
    (plh, phh), (plw, phw) = padding
    N, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    Hp, Wp = H + plh + phh, W + plw + phw
    Hh, Ww = -(-Hp // sh), -(-Wp // sw)          # residue-grid lengths
    nan = jnp.asarray(jnp.nan, x.dtype)
    zero = jnp.asarray(0, dy.dtype)

    # x on the residue-aligned padded grid, NaN-filled so forward padding
    # and alignment-tail cells never match a window max.
    xp = lax.pad(x, nan, ((0, 0, 0), (plh, Hh * sh - H - plh, 0),
                          (plw, Ww * sw - W - plw, 0), (0, 0, 0)))
    xr = xp.reshape(N, Hh, sh, Ww, sw, C)

    outs = []
    for rh in range(sh):
        th_n = max(-(-(kh - rh) // sh), 0)       # shifts hitting residue rh
        for rw in range(sw):
            tw_n = max(-(-(kw - rw) // sw), 0)
            xs = xr[:, :, rh, :, rw, :]          # [N, Hh, Ww, C]
            if th_n == 0 or tw_n == 0:           # stride > kernel gap cells
                outs.append(jnp.zeros((N, Hh, Ww, C), dy.dtype))
                continue
            # Window index for residue position m at shift t is m - t; lo
            # guard cells cover m-t < 0, hi cells cover m-t >= Ho.
            pads = ((0, 0, 0), (th_n - 1, Hh - Ho, 0),
                    (tw_n - 1, Ww - Wo, 0), (0, 0, 0))
            yp = lax.pad(y, nan, pads)
            dp = lax.pad(dy, zero, pads)
            acc = jnp.zeros((N, Hh, Ww, C), dy.dtype)
            for th in range(th_n):
                for tw in range(tw_n):
                    ys = lax.slice(yp, (0, th_n - 1 - th, tw_n - 1 - tw, 0),
                                   (N, th_n - 1 - th + Hh,
                                    tw_n - 1 - tw + Ww, C))
                    ds = lax.slice(dp, (0, th_n - 1 - th, tw_n - 1 - tw, 0),
                                   (N, th_n - 1 - th + Hh,
                                    tw_n - 1 - tw + Ww, C))
                    acc = acc + jnp.where(xs == ys, ds, zero)
            outs.append(acc)

    # Interleave residue grids back to the padded-input grid and crop.
    stacked = jnp.stack(outs, 0).reshape(sh, sw, N, Hh, Ww, C)
    dxp = stacked.transpose(2, 3, 0, 4, 1, 5).reshape(N, Hh * sh, Ww * sw, C)
    dx = lax.slice(dxp, (0, plh, plw, 0), (N, plh + H, plw + W, C))
    return (dx,)


max_pool.defvjp(_fwd, _bwd)


def max_pool_2d(x: jnp.ndarray, kernel: int | Tuple[int, int],
                stride: int | Tuple[int, int],
                padding: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Convenience wrapper taking int or tuple kernel/stride."""
    k = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (tuple(padding[0]), tuple(padding[1]))
    return max_pool(x, k, s, p)
