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
