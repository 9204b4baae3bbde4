"""Int8 end-to-end InceptionV3 inference path.

Same scale design as the BNInception e2e path (bn_inception_int8.py): every
conv requantizes its own post-ReLU output to a calibrated per-conv scale in
the fused epilogue, and each consumer absorbs its per-input-channel
activation scales into weight quantization, so branch concats (including
MixedE's nested concat) and pool branches need no requantization.

Structure: the IV3 topology is written ONCE as a walker over an ops
interface and interpreted three ways —

* ``_CalibOps``   — float forward with BN-folded weights, recording each
                    conv's post-ReLU output max (one traced function);
* ``_ScaleOps``   — host-side numpy scale algebra: "tensors" are per-channel
                    activation-scale vectors; convs quantize their weights
                    (absorbing input scales) and emit their output scale;
* ``_ForwardOps`` — the int8 runtime forward.

This keeps the three faces structurally incapable of diverging from each
other (the walker is the single source of topology truth).

IV3-specific differences from BNInception handled here: bias-free convs
with BN eps=1e-3 (tensorflow-model-zoo port, inception_v3.py:25-32), VALID
convs/pools (no Caffe ceil-mode — consistent at any spatial size), and
count_include_pad=False SAME avg pools (position-dependent divisor,
precomputed as a traced constant).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

QuantizedParams = Dict[str, Any]

_SAME3 = ((1, 1), (1, 1))
_NOPAD = ((0, 0), (0, 0))


def fold_bn_iv3(params: dict, batch_stats: dict,
                eps: float = 1e-3) -> Dict[str, dict]:
    """Fold frozen BN into each bias-free conv.

    IV3 names convs ``<x>_conv`` with sibling ``<x>_bn`` (flat in the
    backbone scope or inside a ``Mixed_*`` submodule scope). Returns
    {"scope/x": {"kernel", "bias"}} with b = beta - mean * g/sqrt(v+eps).
    """
    out: Dict[str, dict] = {}

    def collect(p_node, s_node, prefix):
        for name, leaf in p_node.items():
            if isinstance(leaf, dict) and "kernel" in leaf and \
                    name.endswith("_conv"):
                base = name[:-5]
                bn = p_node.get(base + "_bn")
                stats = (s_node or {}).get(base + "_bn")
                if bn is None or stats is None:
                    continue
                g = np.asarray(bn["scale"])
                beta = np.asarray(bn["bias"])
                m = np.asarray(stats["mean"])
                v = np.asarray(stats["var"])
                inv = g / np.sqrt(v + eps)
                out[prefix + base] = {
                    "kernel": np.asarray(leaf["kernel"]) * inv,
                    "bias": beta - m * inv,
                }
            elif isinstance(leaf, dict) and not name.endswith("_bn"):
                collect(leaf, (s_node or {}).get(name, {}), prefix + name + "/")

    collect(params, batch_stats, "")
    return out


_STEM_CONVS = ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
               "Conv2d_3b_1x1", "Conv2d_4a_3x3")


def _walk_stem(ops, x):
    """IV3 stem (inception_v3.py:178-184): input -> (35x35, 192)."""
    x = ops.conv(x, "Conv2d_1a_3x3", stride=2)
    x = ops.conv(x, "Conv2d_2a_3x3")
    x = ops.conv(x, "Conv2d_2b_3x3", pad=_SAME3)
    x = ops.max_pool(x)
    x = ops.conv(x, "Conv2d_3b_1x1")
    x = ops.conv(x, "Conv2d_4a_3x3")
    return ops.max_pool(x)


def _entry_names(name: str) -> list:
    """A Mixed module's branch-ENTRY convs: the 1x1 stride-1 convs that all
    consume the module input (same tensor, same input scales) — fusible into
    one conv.  Mixed_6a has none (its entries differ in kernel/stride)."""
    if name.startswith(("Mixed_5",)):
        return [f"{name}/branch1x1", f"{name}/branch5x5_1",
                f"{name}/branch3x3dbl_1"]
    if name == "Mixed_7a":
        return [f"{name}/branch3x3_1", f"{name}/branch7x7x3_1"]
    if name.startswith("Mixed_7"):
        return [f"{name}/branch1x1", f"{name}/branch3x3_1",
                f"{name}/branch3x3dbl_1"]
    return [f"{name}/branch1x1", f"{name}/branch7x7_1",
            f"{name}/branch7x7dbl_1"]


def _walk_trunk(ops, x):
    """IV3 Mixed modules (inception_v3.py:185-207): (35x35, 192) -> features."""
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):     # 35x35 modules
        b0, b1, b2 = ops.entry(x, name, _entry_names(name))
        b1 = ops.conv(b1, f"{name}/branch5x5_2", pad=((2, 2), (2, 2)))
        b2 = ops.conv(b2, f"{name}/branch3x3dbl_2", pad=_SAME3)
        b2 = ops.conv(b2, f"{name}/branch3x3dbl_3", pad=_SAME3)
        b3 = ops.conv(ops.avg_pool_same(x), f"{name}/branch_pool")
        x = ops.concat([b0, b1, b2, b3])

    b0 = ops.conv(x, "Mixed_6a/branch3x3", stride=2)      # 17x17 downsample
    b1 = ops.conv(x, "Mixed_6a/branch3x3dbl_1")
    b1 = ops.conv(b1, "Mixed_6a/branch3x3dbl_2", pad=_SAME3)
    b1 = ops.conv(b1, "Mixed_6a/branch3x3dbl_3", stride=2)
    x = ops.concat([b0, b1, ops.max_pool(x)])

    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        b0, b1, b2 = ops.entry(x, name, _entry_names(name))
        b1 = ops.conv(b1, f"{name}/branch7x7_2", pad=((0, 0), (3, 3)))
        b1 = ops.conv(b1, f"{name}/branch7x7_3", pad=((3, 3), (0, 0)))
        b2 = ops.conv(b2, f"{name}/branch7x7dbl_2", pad=((3, 3), (0, 0)))
        b2 = ops.conv(b2, f"{name}/branch7x7dbl_3", pad=((0, 0), (3, 3)))
        b2 = ops.conv(b2, f"{name}/branch7x7dbl_4", pad=((3, 3), (0, 0)))
        b2 = ops.conv(b2, f"{name}/branch7x7dbl_5", pad=((0, 0), (3, 3)))
        b3 = ops.conv(ops.avg_pool_same(x), f"{name}/branch_pool")
        x = ops.concat([b0, b1, b2, b3])

    b0, b1 = ops.entry(x, "Mixed_7a", _entry_names("Mixed_7a"))
    b0 = ops.conv(b0, "Mixed_7a/branch3x3_2", stride=2)   # 8x8 downsample
    b1 = ops.conv(b1, "Mixed_7a/branch7x7x3_2", pad=((0, 0), (3, 3)))
    b1 = ops.conv(b1, "Mixed_7a/branch7x7x3_3", pad=((3, 3), (0, 0)))
    b1 = ops.conv(b1, "Mixed_7a/branch7x7x3_4", stride=2)
    x = ops.concat([b0, b1, ops.max_pool(x)])

    for name in ("Mixed_7b", "Mixed_7c"):                 # 8x8 expanded
        b0, b1, b2 = ops.entry(x, name, _entry_names(name))
        b1a = ops.conv(b1, f"{name}/branch3x3_2a", pad=((0, 0), (1, 1)))
        b1b = ops.conv(b1, f"{name}/branch3x3_2b", pad=((1, 1), (0, 0)))
        b1 = ops.concat([b1a, b1b])                       # nested concat
        b2 = ops.conv(b2, f"{name}/branch3x3dbl_2", pad=_SAME3)
        b2a = ops.conv(b2, f"{name}/branch3x3dbl_3a", pad=((0, 0), (1, 1)))
        b2b = ops.conv(b2, f"{name}/branch3x3dbl_3b", pad=((1, 1), (0, 0)))
        b2 = ops.concat([b2a, b2b])
        b3 = ops.conv(ops.avg_pool_same(x), f"{name}/branch_pool")
        x = ops.concat([b0, b1, b2, b3])

    return ops.finish(x)


_ENTRY_MODULES = ("Mixed_5b", "Mixed_5c", "Mixed_5d",
                  "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                  "Mixed_7a", "Mixed_7b", "Mixed_7c")


def _walk(ops, x):
    """The full IV3 topology, over an ops interface."""
    return _walk_trunk(ops, _walk_stem(ops, x))


# --------------------------- calibration face ------------------------------


class _EntryDefault:
    """Default branch-entry behavior: the entry convs run separately (the
    runtime face fuses them — see ``_ForwardOps.entry``; same design as
    bn_inception_int8._EntryDefault)."""

    def entry(self, x, module, names):
        return [self.conv(x, n) for n in names]


class _CalibOps(_EntryDefault):
    """Float forward with folded weights, recording post-ReLU output maxes."""

    def __init__(self, folded):
        self.folded = folded
        self.maxes: Dict[str, jnp.ndarray] = {}

    def conv(self, x, name, stride=1, pad=_NOPAD):
        f = self.folded[name]
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(f["kernel"], x.dtype), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y + jnp.asarray(f["bias"], x.dtype), 0)
        self.maxes[name] = jnp.max(y).astype(jnp.float32)
        return y

    def max_pool(self, x):
        return jax.lax.reduce_window(x, jnp.asarray(-jnp.inf, x.dtype),
                                     jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                                     [(0, 0), (0, 0), (0, 0), (0, 0)])

    def avg_pool_same(self, x):
        s = jax.lax.reduce_window(x, jnp.asarray(0, x.dtype), jax.lax.add,
                                  (1, 3, 3, 1), (1, 1, 1, 1),
                                  [(0, 0), (1, 1), (1, 1), (0, 0)])
        return s / _same_pool_counts(x.shape[1], x.shape[2], x.dtype)

    def concat(self, parts):
        return jnp.concatenate(parts, axis=-1)

    def finish(self, x):
        return x


def _same_pool_counts(H, W, dtype):
    """(1, H, W, 1) window counts of a 3x3/1 SAME pool (include_pad=False).

    A traced constant — XLA folds it; edges/corners divide by 6/4 instead
    of 9 (inception_v3.py:40-42 parity)."""
    ones = jnp.ones((1, H, W, 1), dtype)
    return jax.lax.reduce_window(ones, jnp.asarray(0, dtype), jax.lax.add,
                                 (1, 3, 3, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])


# --------------------------- quantization face -----------------------------


class _ScaleOps(_EntryDefault):
    """Host numpy scale algebra: a 'tensor' is a per-channel scale vector."""

    def __init__(self, folded, scales, out: QuantizedParams):
        self.folded = folded
        self.s = scales
        self.out = out

    def conv(self, sx_vec, name, stride=1, pad=_NOPAD):
        f = self.folded[name]
        w = np.asarray(f["kernel"], np.float64)
        sx = np.broadcast_to(np.asarray(sx_vec, np.float64), (w.shape[2],))
        w = w * sx[None, None, :, None]
        sw = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        sw = np.where(sw == 0, 1.0, sw)
        so = self.s[name]
        self.out[name] = {
            "wq": jnp.asarray(np.clip(np.round(w / sw), -127, 127)
                              .astype(np.int8)),
            "m": jnp.asarray(sw / so, jnp.float32),
            "bq": jnp.asarray(np.asarray(f["bias"], np.float64) / so,
                              jnp.float32),
        }
        return np.full(w.shape[3], so)

    def max_pool(self, sx_vec):
        return sx_vec

    def avg_pool_same(self, sx_vec):
        return sx_vec

    def concat(self, parts):
        return np.concatenate(parts)

    def finish(self, sx_vec):
        self.out["__feat_scale__"] = jnp.asarray(sx_vec, jnp.float32)
        return self.out


# --------------------------- runtime face ----------------------------------


class _ForwardOps(_EntryDefault):
    """The int8 runtime: int8 tensors, fused requantizing conv epilogues."""

    def __init__(self, qe):
        self.qe = qe

    def entry(self, xq, module, names):
        # Branch-entry fusion, bit-identical by construction (shared input
        # scales, s32 accumulation, per-output-channel epilogue) — see
        # bn_inception_int8._E2EOps.entry for the measured rationale.
        fz = self.qe.get("__entry__")
        if fz is None or module not in fz:
            return super().entry(xq, module, names)
        y = self._conv_layer(xq, fz[module], 1, _NOPAD)
        splits = np.cumsum(
            [int(self.qe[n]["wq"].shape[3]) for n in names])[:-1]
        return jnp.split(y, splits, axis=-1)

    def _conv_layer(self, xq, layer, stride, pad):
        y = jax.lax.conv_general_dilated(
            xq, layer["wq"], (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * layer["m"] + layer["bq"]
        return jnp.clip(jnp.round(jnp.maximum(out, 0.0)), 0.0, 127.0) \
            .astype(jnp.int8)

    def conv(self, xq, name, stride=1, pad=_NOPAD):
        return self._conv_layer(xq, self.qe[name], stride, pad)

    def max_pool(self, x):
        return jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                                     (1, 3, 3, 1), (1, 2, 2, 1),
                                     [(0, 0), (0, 0), (0, 0), (0, 0)])

    def avg_pool_same(self, x):
        s = jax.lax.reduce_window(x.astype(jnp.int32), jnp.int32(0),
                                  jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                  [(0, 0), (1, 1), (1, 1), (0, 0)])
        counts = _same_pool_counts(x.shape[1], x.shape[2], jnp.float32)
        return jnp.clip(jnp.round(s.astype(jnp.float32) / counts),
                        -128, 127).astype(jnp.int8)

    def concat(self, parts):
        return jnp.concatenate(parts, axis=-1)

    def finish(self, x):
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2)) \
            * self.qe["__feat_scale__"]


class _StemBf16Ops:
    """bf16 runtime for the hybrid stem: folded conv + bias + ReLU."""

    def __init__(self, stem):
        self.stem = stem

    def conv(self, x, name, stride=1, pad=_NOPAD):
        f = self.stem[name]
        y = jax.lax.conv_general_dilated(
            x, f["kernel"], (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y + f["bias"], 0)

    def max_pool(self, x):
        return jax.lax.reduce_window(x, jnp.asarray(-jnp.inf, x.dtype),
                                     jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                                     [(0, 0), (0, 0), (0, 0), (0, 0)])


# --------------------------- public API ------------------------------------


def _calibration_maxes_iv3(folded, x):
    ops = _CalibOps(folded)
    ops.maxes["input"] = jnp.max(jnp.abs(x)).astype(jnp.float32)
    _walk(ops, x.astype(jnp.bfloat16))
    return ops.maxes


def calibrate_e2e_iv3(params: dict, batch_stats: dict,
                      sample_frames: jnp.ndarray,
                      hybrid_stem: bool = True) -> QuantizedParams:
    """Calibrate + build the e2e-quantized IV3 backbone.

    ``sample_frames``: representative NORMALIZED crop-shaped frames (any
    spatial size works for IV3 — VALID semantics, no ceil-mode).

    ``hybrid_stem``: keep Conv2d_1a..Conv2d_4a in bf16 (folded weights under
    ``__stem__``) and quantize once at the stem output. The IV3 calibration
    face is already the float forward, so its Conv2d_4a_3x3 max is exactly
    the tensor the hybrid runtime quantizes (max pool preserves the max).
    Default ON: 81.7 vs 85.7 ms per 640-image 299^2 step on one v5e
    (scripts/iv3_probe.py), and the bf16 stem is exact."""
    folded = fold_bn_iv3(params, batch_stats)
    # folded weights ride as jit ARGUMENTS: embedded-constant executables
    # degrade the process's transfers (infer/scorer.py:_score_chunk_impl)
    maxes = jax.device_get(jax.jit(_calibration_maxes_iv3)(
        jax.tree_util.tree_map(jnp.asarray, folded), sample_frames))
    scales = {k: max(float(v), 1e-8) / 127.0 for k, v in maxes.items()}
    qe: QuantizedParams = {"__input_scale__": jnp.asarray(scales["input"],
                                                          jnp.float32)}
    if hybrid_stem:
        qe["__stem__"] = {
            n: {"kernel": jnp.asarray(folded[n]["kernel"], jnp.bfloat16),
                "bias": jnp.asarray(folded[n]["bias"], jnp.bfloat16)}
            for n in _STEM_CONVS}
        s4a = scales["Conv2d_4a_3x3"]
        qe["__stem_scale__"] = jnp.asarray(s4a, jnp.float32)
        cin_trunk = folded["Conv2d_4a_3x3"]["kernel"].shape[3]    # 192
        _walk_trunk(_ScaleOps(folded, scales, qe), np.full(cin_trunk, s4a))
    else:
        # input channel count from the stem conv's kernel (3 RGB / 10 Flow)
        cin = folded["Conv2d_1a_3x3"]["kernel"].shape[2]
        _walk(_ScaleOps(folded, scales, qe), np.full(cin, scales["input"]))
    qe["__entry__"] = {
        module: {
            "wq": jnp.concatenate(
                [qe[n]["wq"] for n in _entry_names(module)], axis=3),
            "m": jnp.concatenate(
                [qe[n]["m"] for n in _entry_names(module)]),
            "bq": jnp.concatenate(
                [qe[n]["bq"] for n in _entry_names(module)]),
        }
        for module in _ENTRY_MODULES}
    return qe


def _iv3_stem_quantized(qe: QuantizedParams, x: jnp.ndarray) -> jnp.ndarray:
    """Normalized frames -> int8 trunk input (35x35@299), any spatial size."""
    if "__stem__" in qe:
        h = _walk_stem(_StemBf16Ops(qe["__stem__"]), x.astype(jnp.bfloat16))
        return jnp.clip(jnp.round(h.astype(jnp.float32) / qe["__stem_scale__"]),
                        0, 127).astype(jnp.int8)
    sin = qe["__input_scale__"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sin), -127, 127) \
        .astype(jnp.int8)
    return _walk_stem(_ForwardOps(qe), xq)


def inception_v3_int8_e2e_features(qe: QuantizedParams,
                                   x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) normalized frames -> (N, 2048) features, int8 end-to-end."""
    return _walk_trunk(_ForwardOps(qe), _iv3_stem_quantized(qe, x))


def iv3_stem_feature_hw(size: int) -> int:
    """Trunk-input spatial size of the IV3 stem for one input dim.

    Conv2d_1a 3x3 s2 VALID -> 2a 3x3 VALID -> 2b SAME -> pool 3x3 s2 VALID
    -> 3b/4a (1x1, 3x3 VALID) -> pool 3x3 s2 VALID; overall stride 8
    (299 -> 35)."""
    n = (size - 3) // 2 + 1
    n = n - 2
    n = (n - 3) // 2 + 1
    n = n - 2
    n = (n - 3) // 2 + 1
    return n


def inception_v3_int8_e2e_features_sharedstem(
        qe: QuantizedParams, xn: jnp.ndarray, flip_src: jnp.ndarray,
        crop_size: int) -> jnp.ndarray:
    """Shared-stem 10-crop IV3 features: stem once per frame+flip, crop
    windows sliced on the stride-8 trunk-input grid.

    Same contract as the BNInception version
    (bn_inception_int8.bninception_int8_e2e_features_sharedstem). IV3's
    VALID conv/pool semantics make this nearly exact: 8-aligned interior
    windows are bit-identical except the border ring of the one SAME conv
    (Conv2d_2b); only the offset snap (<=4px) approximates beyond that.

    Returns (10*N, 2048) f32 features, crop-major.
    """
    from .quantize import sharedstem_crop_windows

    h = sharedstem_crop_windows(lambda x: _iv3_stem_quantized(qe, x),
                                iv3_stem_feature_hw, xn, flip_src, crop_size)
    return _walk_trunk(_ForwardOps(qe), h)
