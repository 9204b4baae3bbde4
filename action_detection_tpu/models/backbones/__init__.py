"""Backbone registry: 2D CNN feature extractors selectable by name.

Mirrors the surface of /root/reference/ssn_models.py:107-154 (backbone pick +
per-backbone input statistics) with flax implementations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import jax.numpy as jnp

from .bn_inception import BNInception, FEATURE_DIM as BNINCEPTION_DIM


@dataclasses.dataclass(frozen=True)
class InputSpec:
    """Per-backbone input pipeline facts (crop size, normalization, channel order)."""
    input_size: int
    mean: tuple
    std: tuple
    bgr: bool          # Caffe-ported nets take BGR channel order
    div255: bool       # torchvision-style nets take [0,1] inputs

    @property
    def scale_size(self) -> int:
        return self.input_size * 256 // 224


def get_backbone(name: str, modality: str = "RGB", new_length: Optional[int] = None,
                 bn_mode: str = "frozen", dtype: Any = jnp.float32,
                 remat: bool = False):
    """Build a backbone module + its feature dim + input spec.

    Args:
      name: one of 'BNInception', 'InceptionV3' (more to come).
      modality: 'RGB' | 'Flow' | 'RGBDiff' — decides input channel count and
        normalization statistics (ssn_models.py:115-144).
      new_length: frames stacked per segment (1 for RGB, 5 for Flow/RGBDiff).
    """
    if new_length is None:
        new_length = 1 if modality == "RGB" else 5

    if modality == "RGB":
        in_channels = 3 * new_length
    elif modality == "Flow":
        in_channels = 2 * new_length
    elif modality == "RGBDiff":
        in_channels = 3 * new_length
    else:
        raise ValueError(f"unknown modality {modality}")

    def maybe_remat(cls):
        # remat is applied at the call site (models/ssn.py) via a
        # function-target nn.remat so `train` stays a static closure value;
        # the `remat` flag here is accepted for API symmetry only
        return cls

    if name == "BNInception":
        module = maybe_remat(BNInception)(in_channels=in_channels,
                                          bn_mode=bn_mode, dtype=dtype)
        feature_dim = BNINCEPTION_DIM
        if modality == "Flow":
            spec = InputSpec(224, (128.0,), (1.0,), bgr=False, div255=False)
        else:
            spec = InputSpec(224, (104.0, 117.0, 128.0), (1.0,), bgr=True, div255=False)
        return module, feature_dim, spec

    if name == "TinyConv":
        # minimal backbone for unit tests and sharding dry-runs: same API,
        # trivially small compile
        from .tiny import TinyConv, FEATURE_DIM as TINY_DIM

        module = maybe_remat(TinyConv)(in_channels=in_channels,
                                       bn_mode=bn_mode, dtype=dtype)
        spec = InputSpec(32, (104.0, 117.0, 128.0) if modality != "Flow" else (128.0,),
                         (1.0,), bgr=(modality != "Flow"), div255=False)
        return module, TINY_DIM, spec

    if name.startswith("resnet") or name.startswith("vgg"):
        # torchvision-style stats shared by both families (ssn_models.py:108-117)
        if modality == "Flow":
            spec = InputSpec(224, (0.5,), (0.226,), bgr=False, div255=True)
        else:
            spec = InputSpec(224, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
                             bgr=False, div255=True)

        if name.startswith("vgg"):
            from .vgg import VGG, FEATURE_DIM as VGG_DIM, _arch_cfg

            _arch_cfg(name)  # validates the arch name
            module = maybe_remat(VGG)(arch=name, in_channels=in_channels,
                                      bn_mode=bn_mode, dtype=dtype)
            return module, VGG_DIM, spec

        from .resnet import ResNet, _STAGES, feature_dim

        if name not in _STAGES:
            raise ValueError(f"Unknown base model: {name}")
        module = maybe_remat(ResNet)(arch=name, in_channels=in_channels,
                                     bn_mode=bn_mode, dtype=dtype)
        return module, feature_dim(name), spec

    if name == "InceptionV3":
        from .inception_v3 import InceptionV3, FEATURE_DIM as IV3_DIM

        module = maybe_remat(InceptionV3)(in_channels=in_channels,
                                          bn_mode=bn_mode, dtype=dtype)
        if modality == "Flow":
            spec = InputSpec(299, (128.0,), (1.0,), bgr=False, div255=False)
        else:
            spec = InputSpec(299, (104.0, 117.0, 128.0), (1.0,), bgr=True, div255=False)
        return module, IV3_DIM, spec

    raise ValueError(f"Unknown base model: {name}")
