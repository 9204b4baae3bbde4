"""Backbone-agnostic entry points for int8 quantized inference.

The scorer and test CLIs go through this dispatcher so adding an int8 path
for a backbone is local to its ``<backbone>_int8`` module. Modes:

* ``e2e``      — int8 activations end-to-end (the default fast path;
                 detection-metric delta bounded in tests/test_int8.py)
* ``perlayer`` — dequant/requant around each conv (BNInception only; the
                 round-2 path, kept for comparison)
"""

from __future__ import annotations

from typing import Any, Dict

_INT8_MODES = {
    "BNInception": ("e2e", "perlayer"),
    "InceptionV3": ("e2e",),
}


def supports_int8(arch: str, mode: str = "e2e") -> bool:
    return mode in _INT8_MODES.get(arch, ())


def int8_support_error(arch: str, mode: str = "e2e") -> str:
    return (f"int8 mode {mode!r} is not available for backbone {arch!r} "
            f"(supported: { {a: list(m) for a, m in _INT8_MODES.items()} })")


def calibrate_e2e_backbone(arch: str, params: dict, batch_stats: dict,
                           sample_frames) -> Dict[str, Any]:
    """Calibrate + build the e2e-quantized backbone from NORMALIZED frames."""
    if arch == "BNInception":
        from .bn_inception_int8 import calibrate_e2e

        return calibrate_e2e(params, batch_stats, sample_frames)
    if arch == "InceptionV3":
        from .inception_v3_int8 import calibrate_e2e_iv3

        return calibrate_e2e_iv3(params, batch_stats, sample_frames)
    raise ValueError(int8_support_error(arch))


def int8_e2e_features(arch: str, qe: Dict[str, Any], x):
    """Normalized frames -> features through the arch's int8-e2e forward."""
    if arch == "BNInception":
        from .bn_inception_int8 import bninception_int8_e2e_features

        return bninception_int8_e2e_features(qe, x)
    if arch == "InceptionV3":
        from .inception_v3_int8 import inception_v3_int8_e2e_features

        return inception_v3_int8_e2e_features(qe, x)
    raise ValueError(int8_support_error(arch))


def supports_shared_stem(arch: str) -> bool:
    """Shared-stem 10-crop scoring (stem per frame+flip, windows sliced on
    the stride-8 trunk-input grid) is wired for both int8-e2e backbones."""
    return arch in ("BNInception", "InceptionV3")


def sharedstem_crop_windows(stem_fn, feature_hw, xn, flip_src,
                            crop_size: int):
    """Run ``stem_fn`` once per frame (+ once per flipped frame) and slice
    the 10 oversample crop windows on the stride-8 trunk-input grid.

    The crop-grid geometry shared by both backbones' shared-stem paths
    (single source — a change to the snap rule or mirror formula cannot
    diverge per backbone):

    * offsets snap to the stride-8 grid: ``snap(o) = round(o / 8)`` clamped
      to the window range (<=4 px shift at production 340x256 -> 224);
    * flipped crops slice a flipped-FRAME stem pass at the mirrored offset
      (``flip(crop(x, o)) == crop(flip(x), W - crop - o)``) — stems with
      asymmetric padding (ceil-mode pools pad right/bottom only) are not
      flip-equivariant, so flipping stem outputs would be wrong;
    * Flow's plane inversion rides in ``flip_src``.

    ``feature_hw``: pixel dim -> trunk-input dim for the backbone's stem.
    Returns ``(10*N, fc, fc, C)`` trunk inputs, crop-major in EXACTLY
    ``device_oversample_normed``'s [o0, o0-flip, o1, o1-flip, ...] order —
    load-bearing for binary_test's per-crop score pickle (the scorer's
    crop-mean wouldn't care, but the per-crop layout does; pinned in
    tests/test_sharedstem.py::test_sharedstem_percrop_layout).
    """
    import jax.numpy as jnp

    from ...data.transforms import fill_fix_offset

    N, H, W, _ = xn.shape
    fh, fw = feature_hw(H), feature_hw(W)
    fc = feature_hw(crop_size)

    def snap(o: int, lim: int) -> int:
        return min(max(int(o / 8 + 0.5), 0), lim)

    stem = stem_fn(jnp.concatenate([xn, jnp.flip(flip_src, axis=2)], axis=0))
    sn, sf = stem[:N], stem[N:]
    windows = []
    for o_w, o_h in fill_fix_offset(False, W, H, crop_size, crop_size):
        fx, fy = snap(o_w, fw - fc), snap(o_h, fh - fc)
        windows.append(sn[:, fy:fy + fc, fx:fx + fc, :])
        mx = snap(W - crop_size - o_w, fw - fc)
        windows.append(sf[:, fy:fy + fc, mx:mx + fc, :])
    return jnp.stack(windows, axis=0).reshape(
        (10 * N, fc, fc, stem.shape[-1]))


def int8_e2e_features_sharedstem(arch: str, qe: Dict[str, Any], xn, flip_src,
                                 crop_size: int):
    """Normalized FRAMES (+ flip source) -> (10*N, F) 10-crop features with
    the stem shared per frame instead of per crop. See
    bn_inception_int8.bninception_int8_e2e_features_sharedstem."""
    if arch == "BNInception":
        from .bn_inception_int8 import (
            bninception_int8_e2e_features_sharedstem)

        return bninception_int8_e2e_features_sharedstem(qe, xn, flip_src,
                                                        crop_size)
    if arch == "InceptionV3":
        from .inception_v3_int8 import (
            inception_v3_int8_e2e_features_sharedstem)

        return inception_v3_int8_e2e_features_sharedstem(qe, xn, flip_src,
                                                         crop_size)
    raise ValueError(f"shared-stem is not available for backbone {arch!r}")
