"""Max pooling with an opt-in eq-mask custom backward — a TRIED AND
REJECTED training lever, kept measurable (off by default).

``jax.grad`` of ``lax.reduce_window(max)`` lowers to XLA SelectAndScatter,
which Mosaic/XLA:TPU executes as an unfused windowed scatter. The r4 train
profile (scripts/train_profile_probe.py) measured the BNInception pools'
backward at ~83 ms of the 263 ms train step (~32%), almost all of it in the
two stem pools (112^2 x 64 and 56^2 x 192 at the 1,152-image recipe batch)
— motivating this module: keep the forward bit-identical (the same
reduce_window max) and replace only the VJP with the classic eq-mask
formulation (what Caffe's CPU pooling backward does): route dy to every
input position whose value equals the window max, computed as kh*kw shifted
compare-select-adds over the stride-decimated output grid.

REJECTED r5 on measurement (single process A/B at the recipe batch, one
v5e, hard-synced, /tmp/r5_trainprof.log + scripts/train_profile_probe.py):
fwd+bwd 321.9 ms with the eq-mask VJP on the stride-2 pools vs 262.7 ms on
the plain SelectAndScatter AD path (pool-backward-free floor 180.0 ms).
The eq-mask backward costs ~142 ms where SelectAndScatter costs ~83 ms:
the pad/slice/interleave chain materializes layout copies on the (8,128)-
tiled HBM layout instead of fusing, so the "XLA fuses elementwise" premise
is false at these shapes. The full train step measured 0.325 s/step (eq)
vs 0.263 s/step (plain) — scripts/train_bench.py, /tmp/r5_trainbench.log.
``_EQ_MASK_ENABLED`` therefore defaults to FALSE: all pools ride the plain
reduce_window AD path, exactly the r3-verified trainer. ``set_eq_mask``
keeps the lever opt-in measurable (the probe's ``fwd+bwd eq`` arm, the
pinned-semantics tests) rather than deleting the record.

Dispatch rule (max_pool_2d, when enabled): the eq-mask VJP is used only
when BOTH spatial strides are > 1. The residue-class backward's working
buffers live on the stride-decimated grid, so with stride 1 they sit at
full input resolution and the add chain multiplies them: r4's first wiring
applied eq-mask to the stride-1 inception_5b branch pool too, and the
train-step compile blew HBM at the 1,152-image recipe batch (BENCH_r04
train_error: twenty 182.25M bf16[1152,9,9,1024] HLO temps from that one
pool's chain). Integer dtypes ride the plain path as well: AD never flows
through them, and the eq-mask backward's NaN fill is only defined for
floats.

Tie semantics of the eq-mask path deliberately differ from SelectAndScatter:
when several positions inside one window tie at the max, SelectAndScatter
routes dy to the first in scan order while eq-mask routes a full dy to each
(the summed gradient magnitude grows). torch's pooling backward (CPU and
CUDA) routes dy to exactly ONE saved argmax per window - CUDA's atomic adds
make the ORDER nondeterministic, not the single-target routing - so eq-mask
is a conscious deviation from the reference contract, recorded in PARITY.md
and pinned in tests/test_pooling.py. Ties are measure-zero for f32 conv/BN
activations but NOT under bf16 (coarse mantissa) or value duplication across
overlapping windows; post-ReLU zero-ties are neutralized by the ReLU
backward. Reference pools being trained: torch nn.MaxPool2d inside the
BNInception/InceptionV3 ports selected at /root/reference/ssn_models.py:107-154.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pad2 = Tuple[Tuple[int, int], Tuple[int, int]]

#: which backward the strided/float pools trace with:
#:   "sas"     — plain reduce_window AD (XLA SelectAndScatter backward)
#:   "eq_mask" — the rejected r4 XLA-elementwise lever (kept measurable)
#:   "pallas"  — the fused Pallas kernel, exact SelectAndScatter semantics
#:               (ops/pool_bwd_pallas.py; also tried-and-rejected r5 —
#:               measured 0.42-0.74x vs SelectAndScatter on-chip, see its
#:               module docstring for the full verdict)
_POOL_BWD_MODE = "sas"
_POOL_BWD_MODES = ("sas", "eq_mask", "pallas")


def set_pool_backward(mode: str) -> str:
    """Select the max-pool backward implementation (returns previous mode).

    Affects functions traced AFTER the call; callers flipping it for a jitted
    program must rebuild/clear-cache that program (see bench.py's train-arm
    fallback ladder)."""
    global _POOL_BWD_MODE
    if mode not in _POOL_BWD_MODES:
        raise ValueError(f"unknown pool backward mode {mode!r}; choose from "
                         f"{_POOL_BWD_MODES}")
    prev = _POOL_BWD_MODE
    _POOL_BWD_MODE = mode
    return prev


def pool_backward() -> str:
    return _POOL_BWD_MODE


def set_eq_mask(enabled: bool) -> bool:
    """Back-compat toggle for the eq-mask lever (returns whether it WAS on).

    ``set_eq_mask(True)`` selects the eq-mask backward, ``False`` the plain
    SelectAndScatter AD (overriding pallas too — this is the knob the bench
    fallback ladder uses to force the known-good path)."""
    return set_pool_backward("eq_mask" if enabled else "sas") == "eq_mask"


def eq_mask_enabled() -> bool:
    return _POOL_BWD_MODE == "eq_mask"


def _reduce_max(x: jnp.ndarray, kernel: Tuple[int, int],
                stride: Tuple[int, int], padding: Pad2) -> jnp.ndarray:
    # init must be a CONCRETE scalar: jax only recognizes the max monoid
    # (and thus the differentiable reduce_window_max primitive) on known
    # values — a traced/device init fails linearization under jax 0.9.0.
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        int(jnp.iinfo(x.dtype).min))
    return lax.reduce_window(
        x, init, lax.max,
        (1, kernel[0], kernel[1], 1), (1, stride[0], stride[1], 1),
        ((0, 0), padding[0], padding[1], (0, 0)))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(x: jnp.ndarray, kernel: Tuple[int, int],
             stride: Tuple[int, int], padding: Pad2) -> jnp.ndarray:
    """NHWC max pool; forward == flax.linen.max_pool, backward = eq-mask.

    ``padding`` is ((top, bottom), (left, right)) explicit spatial padding.
    Float dtypes only (the backward's off-window fill is NaN); callers with
    integer inputs or stride-1 pools go through max_pool_2d, which dispatches
    them to the plain AD path.
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
    final residue interleave and dx itself — which is also why max_pool_2d
    never routes stride-1 pools here (the residue grid IS the input grid
    then, and the r4 compile blew HBM on exactly that case).
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


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool_pallas(x: jnp.ndarray, kernel: Tuple[int, int],
                    stride: Tuple[int, int], padding: Pad2) -> jnp.ndarray:
    """NHWC max pool; forward == flax.linen.max_pool, backward = the fused
    Pallas kernel with exact SelectAndScatter (first-match) semantics
    (ops/pool_bwd_pallas.py). Float dtypes only (callers dispatch through
    max_pool_2d)."""
    return _reduce_max(x, kernel, stride, padding)


def _fwd_pallas(x, kernel, stride, padding):
    y = _reduce_max(x, kernel, stride, padding)
    return y, (x, y)


def _bwd_pallas(kernel, stride, padding, res, dy):
    from .pool_bwd_pallas import max_pool_bwd_pallas

    x, y = res
    return (max_pool_bwd_pallas(x, y, dy, kernel, stride, padding),)


max_pool_pallas.defvjp(_fwd_pallas, _bwd_pallas)


def max_pool_2d(x: jnp.ndarray, kernel: int | Tuple[int, int],
                stride: int | Tuple[int, int],
                padding: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """NHWC max pool with the backward-mode dispatch (module docstring)."""
    if x.ndim != 4:
        raise ValueError(
            f"max_pool_2d expects NHWC rank-4 input, got shape {x.shape}; "
            "flatten/restore extra leading dims at the call site")
    k = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (tuple(padding[0]), tuple(padding[1]))
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return _reduce_max(x, k, s, p)       # AD never flows through ints
    if _POOL_BWD_MODE == "pallas" and min(s) > 1:
        # stride-1 pools stay on plain AD: the kernel's working set sits at
        # full input resolution there and the win is negligible (the 7x7
        # inception_5b pool is ~0 of the 83 ms SelectAndScatter total)
        return max_pool_pallas(x, k, s, p)
    if _POOL_BWD_MODE == "eq_mask" and min(s) > 1:
        return max_pool(x, k, s, p)          # rejected lever, opt-in only
    return _reduce_max(x, k, s, p)
