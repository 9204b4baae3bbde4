"""Int8 quantized BNInception inference path (post-training, calibration-free).

The v5e MXU runs s8 x s8 -> s32 at ~2x bf16 peak (measured ~4x on inception
shapes, where bf16 convs are partly overhead-bound). Since the scorer spends
~93% of its step in the backbone (DESIGN.md), quantizing it is the main
throughput lever beyond round 1's 5.06x.

Scheme (accuracy-first, no calibration data needed):
* BN folding: conv weight/bias absorb the frozen BN affine+stats, so the
  quantized conv epilogue is just bias + ReLU.
* weights: per-output-channel symmetric int8 (`max|w|/127`).
* activations: dynamic per-tensor symmetric int8, scale computed on device
  per layer per batch (a max-reduction — cheap on VPU, tracks the actual
  activation range instead of a calibration estimate).
* pooling/concat run on the dequantized bf16 activations.

This is a standalone functional forward mirroring the flax BNInception
topology exactly (same _INCEPTION_CFG table and pooling helpers), consuming
prequantized params produced by :func:`quantize_backbone`.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bn_inception import _INCEPTION_CFG, _avg_pool_include_pad, _max_pool

QuantizedParams = Dict[str, Dict[str, Any]]


def fold_bn(params: dict, batch_stats: dict, eps: float = 1e-5) -> dict:
    """Fold frozen BN into each conv: w' = w * g/sqrt(v+eps), b' = (b-m)*g/sqrt(v+eps) + beta.

    Returns {layer_name: {"kernel": (H,W,I,O), "bias": (O,)}} for every conv
    that has a sibling ``<name>_bn``.
    """
    def collect(p_node, s_node, out):
        for name, leaf in p_node.items():
            if isinstance(leaf, dict) and "kernel" in leaf:
                bn = p_node.get(name + "_bn")
                stats = s_node.get(name + "_bn") if s_node else None
                if bn is None or stats is None:
                    continue
                g = np.asarray(bn["scale"])
                beta = np.asarray(bn["bias"])
                m = np.asarray(stats["mean"])
                v = np.asarray(stats["var"])
                inv = g / np.sqrt(v + eps)
                w = np.asarray(leaf["kernel"]) * inv
                b = (np.asarray(leaf["bias"]) - m) * inv + beta
                out[name] = {"kernel": w, "bias": b}
            elif isinstance(leaf, dict):
                collect(leaf, (s_node or {}).get(name, {}), out)
        return out

    return collect(params, batch_stats, {})


def quantize_backbone(params: dict, batch_stats: dict,
                      folded: dict = None) -> QuantizedParams:
    """BN-fold then per-output-channel int8-quantize every conv."""
    folded = folded if folded is not None else fold_bn(params, batch_stats)
    q: QuantizedParams = {}
    for name, leaf in folded.items():
        w = leaf["kernel"]
        sw = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0        # (O,)
        sw = np.where(sw == 0, 1.0, sw)
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        q[name] = {"wq": jnp.asarray(wq),
                   "sw": jnp.asarray(sw, jnp.float32),
                   "bias": jnp.asarray(leaf["bias"], jnp.float32)}
    return q


def _conv_int8(x: jnp.ndarray, layer: dict, stride: int = 1, pad: int = 0,
               relu: bool = True, sx=None) -> jnp.ndarray:
    """Per-tensor activation quantization + s8xs8->s32 conv + epilogue.

    ``sx``: static activation scale (calibrated). When None, the scale is
    computed dynamically (an extra full-tensor max reduction per layer —
    measured ~25% slower end-to-end than static scales; use calibration for
    deployment).
    """
    if sx is None:
        sx = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, layer["wq"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * layer["sw"]) + layer["bias"]
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Single topology walk, interpreted through an ops interface.
#
# The per-layer runtime, the e2e runtime, both calibration passes and the
# host scale algebra all traverse the SAME stem + _INCEPTION_CFG graph; one
# walker over a small ops interface makes the faces structurally incapable
# of diverging (same pattern as inception_v3_int8._walk) — branch order and
# pool choices are written exactly once.
# ---------------------------------------------------------------------------


def _walk_stem(ops, x):
    x = ops.conv(x, "conv1_7x7_s2", stride=2, pad=3)
    x = ops.max_pool(x, 3, 2, ceil=True)
    x = ops.conv(x, "conv2_3x3_reduce")
    x = ops.conv(x, "conv2_3x3", pad=1)
    return ops.max_pool(x, 3, 2, ceil=True)


def _entry_names(name: str, c1) -> list:
    """A module's branch-ENTRY convs: the 1x1s that all consume the module
    input (same tensor, same input scales) — fusible into one conv."""
    return (([f"{name}_1x1"] if c1 is not None else [])
            + [f"{name}_3x3_reduce", f"{name}_double_3x3_reduce"])


def _walk_trunk(ops, x):
    for (name, c1, _c3r, _c3, _d3r, _d31, _d32, _proj, pool, stride) \
            in _INCEPTION_CFG:
        heads = ops.entry(x, name, _entry_names(name, c1))
        branches = list(heads[:1]) if c1 is not None else []
        i = 1 if c1 is not None else 0
        b3 = ops.conv(heads[i], f"{name}_3x3", stride=stride, pad=1)
        branches.append(b3)
        bd = ops.conv(heads[i + 1], f"{name}_double_3x3_1", pad=1)
        bd = ops.conv(bd, f"{name}_double_3x3_2", stride=stride, pad=1)
        branches.append(bd)
        if stride == 1:
            bp = (ops.avg_pool(x, 3, 1, 1) if pool == "avg"
                  else ops.max_pool(x, 3, 1, pad=1))
            branches.append(ops.conv(bp, f"{name}_pool_proj"))
        else:
            # stride-2 modules: passthrough ceil-mode max pool branch
            branches.append(ops.max_pool(x, 3, 2, ceil=True))
        x = ops.concat(branches)
    return x


class _EntryDefault:
    """Default branch-entry behavior: the entry convs run separately.

    The e2e runtime face overrides this with ONE fused conv per module (see
    ``_E2EOps.entry``); the calibration/scale faces keep per-conv walks so
    every conv still gets its own recorded max / qe entry."""

    def entry(self, x, module, names):
        return [self.conv(x, n) for n in names]


class _PerLayerOps(_EntryDefault):
    """bf16 activations, per-layer int8 convs.

    Runtime face (optionally with static ``act_scales``) and both traced
    calibration faces: ``input_maxes``/``output_maxes`` dicts, when given,
    record each conv's input |max| (per-layer static-scale calibration) /
    post-ReLU output max (e2e scale calibration).
    """

    def __init__(self, q: QuantizedParams, act_scales: Dict[str, Any] = None,
                 input_maxes: Dict[str, jnp.ndarray] = None,
                 output_maxes: Dict[str, jnp.ndarray] = None):
        self.q = q
        self.s = act_scales or {}
        self.input_maxes = input_maxes
        self.output_maxes = output_maxes

    def conv(self, x, name, stride=1, pad=0):
        if self.input_maxes is not None:
            self.input_maxes[name] = jnp.max(jnp.abs(x)).astype(jnp.float32)
        out = _conv_int8(x, self.q[name], stride=stride, pad=pad,
                         sx=self.s.get(name))
        if self.output_maxes is not None:
            # post-ReLU, so max == |max|
            self.output_maxes[name] = jnp.max(out).astype(jnp.float32)
        return out

    def max_pool(self, x, kernel, stride, ceil=False, pad=0):
        return _max_pool(x, kernel, stride, ceil=ceil, pad=pad)

    def avg_pool(self, x, kernel, stride, pad):
        return _avg_pool_include_pad(x, kernel, stride, pad)

    def concat(self, parts):
        return jnp.concatenate(parts, axis=-1)


def bninception_int8_features(q: QuantizedParams, x: jnp.ndarray,
                              act_scales: Dict[str, Any] = None) -> jnp.ndarray:
    """(N, H, W, C) normalized frames -> (N, 1024) features, int8 convs.

    ``act_scales``: optional per-layer static activation scales from
    :func:`calibrate_activation_scales`.
    """
    ops = _PerLayerOps(q, act_scales=act_scales)
    x = _walk_trunk(ops, _walk_stem(ops, x.astype(jnp.bfloat16)))
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# int8 END-TO-END activations
#
# The per-layer path above dequantizes every conv output to bf16 and
# requantizes at the next conv: each activation tensor crosses HBM as
# bf16 write + bf16 read + int8 write + int8 read = 6 bytes/element. Keeping
# activations int8 end-to-end cuts that to 2 bytes/element; measured 36.1 vs
# 37.8 ms per 640-image step on one v5e (scripts/int8e2e_probe.py).
#
# Scale design (better than a shared per-module scale): every conv requantizes
# its own post-ReLU output to a per-conv scale from calibration, and a
# CONSUMER absorbs its input scales into weight quantization — for input
# channel i with scale sx_i, w'[:, :, i, :] = w[:, :, i, :] * sx_i before the
# per-output-channel int8 rounding. A concat of branches with different
# scales therefore needs NO requantization (the next conv's folded weights
# carry the per-channel scales), and the stride-2 passthrough max-pool branch
# rides through untouched. int8 max pools and s32 avg pools are
# scale-preserving per channel.
# ---------------------------------------------------------------------------


def _max_pool_i8(x: jnp.ndarray, kernel: int, stride: int, ceil: bool = False,
                 pad: int = 0) -> jnp.ndarray:
    from .bn_inception import _ceil_pool_padding

    if ceil:
        padding = [(0, 0), _ceil_pool_padding(x.shape[1], kernel, stride),
                   _ceil_pool_padding(x.shape[2], kernel, stride), (0, 0)]
    else:
        padding = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    return jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                                 (1, kernel, kernel, 1),
                                 (1, stride, stride, 1), padding)


def _avg_pool_i8_include_pad(x: jnp.ndarray, kernel: int, stride: int,
                             pad: int) -> jnp.ndarray:
    """count_include_pad avg pool in s32, rounded back to the input's scale.

    (raw reduce_window+add is fine here: the int8 path is inference-only, so
    the jax-0.9 avg-pool AD restriction doesn't apply.)"""
    s = jax.lax.reduce_window(x.astype(jnp.int32), jnp.int32(0), jax.lax.add,
                              (1, kernel, kernel, 1), (1, stride, stride, 1),
                              [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return jnp.clip(jnp.round(s.astype(jnp.float32) / (kernel * kernel)),
                    -128, 127).astype(jnp.int8)


def _conv_i8_e2e(xq: jnp.ndarray, layer: dict, stride: int = 1,
                 pad: int = 0) -> jnp.ndarray:
    """s8 x s8 -> s32 conv with a fused requantizing epilogue.

    ``layer["m"]`` already contains sw/so (weight scales over the conv's own
    output scale) and ``layer["bq"]`` = bias/so, so the epilogue is one
    multiply-add + ReLU + round — the output goes back to HBM as int8.
    """
    y = jax.lax.conv_general_dilated(
        xq, layer["wq"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * layer["m"] + layer["bq"]
    return jnp.clip(jnp.round(jnp.maximum(out, 0.0)), 0.0, 127.0) \
        .astype(jnp.int8)


def quantize_backbone_e2e(params: dict, batch_stats: dict,
                          out_maxes: Dict[str, float],
                          hybrid_stem: bool = True,
                          folded: dict = None) -> QuantizedParams:
    """BN-fold + int8-quantize with input-scale folding for e2e activations.

    ``out_maxes``: {"input": max|normalized input|, conv_name: max post-ReLU
    conv output} from :func:`_e2e_output_maxes` on calibration frames.

    Walks the topology tracking each tensor's per-channel activation scale
    vector; every conv's weights absorb its input scales (see module
    comment), then quantize per-output-channel. Returns the conv dicts plus
    ``__input_scale__`` (scalar) and ``__feat_scale__`` ((1024,): the final
    concat's per-channel scales, applied after global average pooling).

    ``hybrid_stem``: keep conv1..conv2_3x3 in bf16 (folded weights under
    ``__stem__``) and quantize once at the stem output. The C=3 7x7 stem conv
    can't fill the MXU in any dtype, so its int8 quant/requant round-trips
    cost more than int8 saves there — backbone forward measured 28.7 (hybrid)
    vs 29.7 (all-int8) ms per 640-image batch in the same process on one v5e
    (scripts/int8_stage_probe.py), and the bf16 stem is also the more
    accurate one (features vs all-int8: cosine 0.99998).
    """
    folded = folded if folded is not None else fold_bn(params, batch_stats)
    s = {k: max(float(v), 1e-8) / 127.0 for k, v in out_maxes.items()}
    qe: QuantizedParams = {}
    ops = _ScaleOps(folded, s, qe)

    if hybrid_stem:
        qe["__stem__"] = {
            name: {"kernel": jnp.asarray(folded[name]["kernel"],
                                         jnp.bfloat16),
                   "bias": jnp.asarray(folded[name]["bias"], jnp.bfloat16)}
            for name in ("conv1_7x7_s2", "conv2_3x3_reduce", "conv2_3x3")}
        qe["__stem_scale__"] = jnp.asarray(s["conv2_3x3"], jnp.float32)
        sx = np.full(folded["conv2_3x3"]["kernel"].shape[3], s["conv2_3x3"])
    else:
        sx = _walk_stem(ops, np.asarray(s["input"]))
    sx = _walk_trunk(ops, sx)

    qe["__input_scale__"] = jnp.asarray(s["input"], jnp.float32)
    qe["__feat_scale__"] = jnp.asarray(sx, jnp.float32)
    qe["__entry__"] = _fuse_entry_convs(qe, (
        (name, _entry_names(name, c1))
        for (name, c1, *_r) in _INCEPTION_CFG))
    return qe


def _fuse_entry_convs(qe: QuantizedParams, groups) -> Dict[str, dict]:
    """Concat each module's entry-conv tensors along the output-channel axis.

    Exact by construction: the entry convs share the input (hence the same
    folded input scales), accumulate in s32, and the requantizing epilogue is
    already per output channel — so conv+split is bit-identical to the
    separate convs. The runtime face uses these when present
    (``_E2EOps.entry``); split points are recomputed from the per-conv
    ``wq`` shapes, so the fused tree carries only arrays (device_put-safe).

    The per-conv entry tensors deliberately STAY in the tree alongside the
    fused copies (ADVICE r4): they carry the split shapes, serve the
    non-fused fallback face, and the duplication is a few MB of 1x1-conv
    int8 weights — shipped once per process, dwarfed by activations in HBM.
    Revisit only if device variables ever become a measured cost."""
    return {
        module: {
            "wq": jnp.concatenate([qe[n]["wq"] for n in names], axis=3),
            "m": jnp.concatenate([qe[n]["m"] for n in names]),
            "bq": jnp.concatenate([qe[n]["bq"] for n in names]),
        }
        for module, names in groups}


class _ScaleOps(_EntryDefault):
    """Host scale algebra: 'tensors' are per-channel activation scale vectors.

    ``conv`` absorbs its input scales into the weights, int8-quantizes them
    per output channel into ``out``, and returns the conv's own (uniform)
    output scale vector; pools are scale-preserving per channel, so the
    stride-2 passthrough branch just carries its input scales into the
    concat.
    """

    def __init__(self, folded: dict, s: Dict[str, float],
                 out: QuantizedParams):
        self.folded = folded
        self.s = s
        self.out = out

    def conv(self, sx, name, stride=1, pad=0):
        w = np.asarray(self.folded[name]["kernel"], np.float64)
        sx_vec = np.broadcast_to(np.asarray(sx, np.float64), (w.shape[2],))
        w = w * sx_vec[None, None, :, None]
        sw = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        sw = np.where(sw == 0, 1.0, sw)
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        so = self.s[name]
        self.out[name] = {"wq": jnp.asarray(wq),
                          "m": jnp.asarray(sw / so, jnp.float32),
                          "bq": jnp.asarray(
                              np.asarray(self.folded[name]["bias"],
                                         np.float64) / so, jnp.float32)}
        return np.full(w.shape[3], so)

    def max_pool(self, sx, kernel, stride, ceil=False, pad=0):
        return sx

    def avg_pool(self, sx, kernel, stride, pad):
        return sx

    def concat(self, parts):
        return np.concatenate([np.atleast_1d(p) for p in parts])


class _E2EOps(_EntryDefault):
    """int8 activations end-to-end (the deployed runtime face)."""

    def __init__(self, qe: QuantizedParams):
        self.qe = qe

    def conv(self, xq, name, stride=1, pad=0):
        return _conv_i8_e2e(xq, self.qe[name], stride=stride, pad=pad)

    def entry(self, xq, module, names):
        # Branch-entry fusion: the module's entry 1x1s share the input AND
        # its per-channel scale folding, and the epilogue is per-output-
        # channel, so one conv over the concatenated weights is BIT-IDENTICAL
        # to the separate convs (s32 accumulation is exact) while tiling the
        # MXU with 192..736-wide outputs instead of 64..352 and reading the
        # module input once instead of 3x. Measured 26.6 -> 24.8 ms on the
        # headline shared-stem step (scripts/entryfuse_probe.py; the
        # no-concat escalation measured there lost 1.7x and was rejected).
        fz = self.qe.get("__entry__")
        if fz is None or module not in fz:
            return super().entry(xq, module, names)
        y = _conv_i8_e2e(xq, fz[module])
        splits = np.cumsum(
            [int(self.qe[n]["wq"].shape[3]) for n in names])[:-1]
        return jnp.split(y, splits, axis=-1)

    def max_pool(self, x, kernel, stride, ceil=False, pad=0):
        return _max_pool_i8(x, kernel, stride, ceil=ceil, pad=pad)

    def avg_pool(self, x, kernel, stride, pad):
        return _avg_pool_i8_include_pad(x, kernel, stride, pad)

    def concat(self, parts):
        return jnp.concatenate(parts, axis=-1)


class _StemBf16Ops:
    """bf16 folded-weight stem (hybrid runtime + hybrid calibration face).

    ``output_maxes``, when given, records each stem conv's post-ReLU max —
    the hybrid calibration needs conv2_3x3's max to be measured on the SAME
    bf16 tensor the runtime quantizes (an int8-proxy stem under-estimated it
    enough to saturate detections; see _e2e_output_maxes).
    """

    def __init__(self, stem: dict, output_maxes: Dict[str, jnp.ndarray] = None):
        self.stem = stem
        self.output_maxes = output_maxes

    def conv(self, h, name, stride=1, pad=0):
        f = self.stem[name]
        y = jax.lax.conv_general_dilated(
            h, jnp.asarray(f["kernel"], jnp.bfloat16), (stride, stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jnp.maximum(y + jnp.asarray(f["bias"], jnp.bfloat16), 0)
        if self.output_maxes is not None:
            self.output_maxes[name] = jnp.max(out).astype(jnp.float32)
        return out

    def max_pool(self, x, kernel, stride, ceil=False, pad=0):
        return _max_pool(x, kernel, stride, ceil=ceil, pad=pad)


def _e2e_stem_quantized(qe: QuantizedParams, x: jnp.ndarray) -> jnp.ndarray:
    """Normalized frames -> int8 trunk input, at ANY spatial size.

    Hybrid qe: bf16 folded stem, one quantization at the stem output.
    All-int8 qe: input quantization + int8 stem convs."""
    if "__stem__" in qe:
        h = _walk_stem(_StemBf16Ops(qe["__stem__"]), x.astype(jnp.bfloat16))
        return jnp.clip(jnp.round(h.astype(jnp.float32) / qe["__stem_scale__"]),
                        0, 127).astype(jnp.int8)
    sin = qe["__input_scale__"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sin), -127, 127) \
        .astype(jnp.int8)
    return _walk_stem(_E2EOps(qe), xq)


def _e2e_trunk(qe: QuantizedParams, h: jnp.ndarray) -> jnp.ndarray:
    """int8 trunk input (N, h, w, 192) -> (N, 1024) f32 features."""
    h = _walk_trunk(_E2EOps(qe), h)
    return jnp.mean(h.astype(jnp.float32), axis=(1, 2)) * qe["__feat_scale__"]


def bninception_int8_e2e_features(qe: QuantizedParams,
                                  x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) normalized frames -> (N, 1024) features, int8 end-to-end.

    Activations stay int8 from the (first) quantization to the final concat;
    the only float work per conv is the fused s32->int8 epilogue. Dequantize
    happens once, after global average pooling (49-way averaging also averages
    the final requant rounding error down).

    With a hybrid-stem ``qe`` (the default from :func:`quantize_backbone_e2e`)
    the stem runs in bf16 on the folded weights and the single quantization
    point is the stem output."""
    return _e2e_trunk(qe, _e2e_stem_quantized(qe, x))


def bninception_int8_e2e_features_sharedstem(
        qe: QuantizedParams, xn: jnp.ndarray, flip_src: jnp.ndarray,
        crop_size: int) -> jnp.ndarray:
    """Shared-stem 10-crop features: the stem runs once per FRAME (+ once per
    flipped frame) instead of once per crop, and the 10 crop windows are
    sliced from the stride-8 trunk-input feature grid.

    The 10 test crops of one frame overlap heavily (10x224^2 crop pixels vs
    ~2x256x340 frame pixels = 2.9x), so sharing the stem removes ~2/3 of the
    stem's conv work. Approximate by construction — like int8 itself, and
    bounded the same way (tests/test_sharedstem.py, end-to-end mAP delta):

    * crop offsets snap to the stride-8 grid (<=4px shift on THUMOS's
      340x256 -> 224 geometry; exact when offsets are multiples of 8);
    * window cells near a crop border see real neighboring pixels instead of
      the per-crop zero padding (the snapped interior cells are otherwise
      bit-identical: conv/pool windows align when offsets are 8-aligned).

    Flipped crops are sliced from a flipped-FRAME stem pass — ceil-mode
    pooling pads only right/bottom, so flipping stem outputs is NOT
    equivalent; Flow's plane inversion rides in ``flip_src`` exactly as in
    ``device_oversample_normed``.

    Args:
      qe: e2e-quantized params (hybrid or all-int8).
      xn: (N, H, W, C) NORMALIZED scale-size frames.
      flip_src: normalized frames to flip for the flipped crops (== xn except
        Flow, where flow-x planes are inverted).
      crop_size: square crop side in pixels.

    Returns (10*N, 1024) f32 features, crop-major in exactly
    ``device_oversample_normed``'s crop order (load-bearing for
    binary_test's per-crop score pickle; pinned in tests/test_sharedstem.py).
    """
    from .bn_inception import stem_feature_hw
    from .quantize import sharedstem_crop_windows

    h = sharedstem_crop_windows(lambda x: _e2e_stem_quantized(qe, x),
                                stem_feature_hw, xn, flip_src, crop_size)
    return _e2e_trunk(qe, h)


def _e2e_output_maxes(q: QuantizedParams, x: jnp.ndarray,
                      stem_folded: dict = None) -> Dict[str, jnp.ndarray]:
    """Traced calibration pass: each conv's post-ReLU OUTPUT max (+ input max).

    Runs the per-layer dynamic-scale int8 forward (closer to the quantized
    network's activations than the f32 forward) through the same topology and
    records the maxima the e2e scale assignment needs. One jittable function
    -> one remote compile, one bulk fetch.

    ``stem_folded``: when given (hybrid-stem calibration), the stem runs in
    bf16 on these folded weights instead of the int8 proxy, matching the
    hybrid runtime — the conv2_3x3 max then reflects the actual tensor the
    runtime quantizes (an int8-proxy stem under-estimated it enough to
    saturate detections: combined-score delta 0.148 vs the 0.12 bound)."""
    maxes: Dict[str, jnp.ndarray] = {
        "input": jnp.max(jnp.abs(x)).astype(jnp.float32)}
    ops = _PerLayerOps(q, output_maxes=maxes)
    h = x.astype(jnp.bfloat16)
    if stem_folded is not None:
        h = _walk_stem(_StemBf16Ops(stem_folded, output_maxes=maxes), h)
    else:
        h = _walk_stem(ops, h)
    _walk_trunk(ops, h)
    return maxes


def calibrate_e2e(params: dict, batch_stats: dict,
                  sample_frames: jnp.ndarray,
                  hybrid_stem: bool = True) -> QuantizedParams:
    """Calibrate + build the e2e-quantized backbone in one step.

    ``sample_frames``: representative NORMALIZED frames (multi-video spread —
    max-abs calibration from one video under-covers the rest; an activation
    exceeding its calibrated max at runtime saturates at 127)."""
    folded = fold_bn(params, batch_stats)      # folded once, shared below
    q0 = quantize_backbone(params, batch_stats, folded=folded)
    stem_folded = None
    if hybrid_stem:
        stem_folded = {k: jax.tree_util.tree_map(jnp.asarray, folded[k])
                       for k in ("conv1_7x7_s2", "conv2_3x3_reduce",
                                 "conv2_3x3")}
    maxes = jax.device_get(jax.jit(_e2e_output_maxes)(
        q0, sample_frames, stem_folded))
    return quantize_backbone_e2e(params, batch_stats, maxes,
                                 hybrid_stem=hybrid_stem, folded=folded)


def quantization_report(backbone, variables, frames,
                        fused_kernel=None, fused_bias=None,
                        layout=None, mode: str = "perlayer") -> Dict[str, float]:
    """Quantify int8-vs-float divergence on real inputs.

    Run this with a *converted reference checkpoint* before enabling
    ``--int8`` in production: it reports feature-level cosine similarity and
    relative RMS, and (when the fused test FC is given) fused-score relative
    RMS — the quantity that actually moves mAP. With ``layout``
    (a ``ReorganizedScoreLayout``) the score error is additionally broken out
    per head block: ``act_rel_rms`` / ``comp_rel_rms`` / ``reg_rel_rms``.
    """
    ref = np.asarray(backbone.apply(variables, frames)).astype(np.float64)
    if mode == "e2e":
        qe = calibrate_e2e(variables["params"], variables.get("batch_stats", {}),
                           frames)
        got = np.asarray(bninception_int8_e2e_features(qe, frames)) \
            .astype(np.float64)
    else:
        q = quantize_backbone(variables["params"],
                              variables.get("batch_stats", {}))
        scales = calibrate_activation_scales(q, frames)
        got = np.asarray(bninception_int8_features(q, frames,
                                                   act_scales=scales)) \
            .astype(np.float64)
    cos = float(np.mean([
        np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-12)
        for r, g in zip(ref, got)]))
    rel = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12))
    report = {"feature_cosine": cos, "feature_rel_rms": rel}
    if fused_kernel is not None:
        sref = ref @ np.asarray(fused_kernel) + np.asarray(fused_bias)
        sgot = got @ np.asarray(fused_kernel) + np.asarray(fused_bias)

        def rel_rms(a, b):
            return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))

        report["score_rel_rms"] = rel_rms(sgot, sref)
        if layout is not None:
            from ...ops.stpp import reorganized_score_slices

            for name, sl in zip(("act", "comp", "reg"),
                                reorganized_score_slices(layout)):
                if sl is not None:
                    report[f"{name}_rel_rms"] = rel_rms(sgot[:, sl], sref[:, sl])
    return report


def _calibration_maxes(q: QuantizedParams,
                       sample_frames: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Traced dynamic-scale forward returning each conv input's |max|.

    One jittable function so the whole calibration pass is a single remote
    compile (the previous eager version fetched a host float per conv —
    dozens of tiny remote programs through the tunnel)."""
    maxes: Dict[str, jnp.ndarray] = {}
    ops = _PerLayerOps(q, input_maxes=maxes)
    _walk_trunk(ops, _walk_stem(ops, sample_frames.astype(jnp.bfloat16)))
    return maxes


def calibrate_activation_scales(q: QuantizedParams,
                                sample_frames: jnp.ndarray) -> Dict[str, Any]:
    """One calibration pass recording each conv's input max -> static scales.

    ``sample_frames``: a representative normalized batch. Returns
    {layer: scalar f32 scale} to pass as ``act_scales``. Static scales remove
    the per-layer dynamic max reduction (a net win at 640-image steps,
    measured r1 and kept).
    """
    # one compiled pass + ONE bulk fetch (per-scalar float() would be a
    # tunnel round-trip per conv layer)
    maxes = jax.device_get(jax.jit(_calibration_maxes)(q, sample_frames))
    return {name: jnp.asarray(max(float(m), 1e-8) / 127.0, jnp.float32)
            for name, m in maxes.items()}
