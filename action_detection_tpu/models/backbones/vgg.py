"""VGG family (11/13/16/19, plain and _bn) in flax, NHWC.

The reference accepts any torchvision vgg by name
(/root/reference/ssn_models.py:108-113) — though its vgg path was never
executed there (it sets ``last_layer_name='fc'``, an attribute torchvision
VGG does not have). Here the family actually works: features are the 4096-d
fc7 activations (the classifier minus its final 1000-way layer), which is
what the heads attach to.

Layer scopes carry the torchvision ``features.<idx>`` indices
(``features_<idx>``; BN layers get a ``_bn`` suffix so the optimizer's
frozen-BN labeling sees them) — checkpoint conversion is a pure rename.
Flatten order before fc6 is CHW to match torch's ``(N, C*7*7)`` layout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.pooling import max_pool_2d

FEATURE_DIM = 4096

# torchvision configs: A=vgg11, B=vgg13, D=vgg16, E=vgg19
_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


def _arch_cfg(arch: str) -> Tuple[Tuple, bool]:
    base = arch[:-3] if arch.endswith("_bn") else arch
    if base not in _CFGS:
        raise ValueError(f"Unknown base model: {arch}")
    return _CFGS[base], arch.endswith("_bn")


def torch_layer_plan(arch: str) -> List[Tuple[str, str, int]]:
    """[('conv'|'bn'|'pool', flax_scope_name, out_channels)] in forward order,
    with scope names carrying the torchvision ``features.<idx>`` index."""
    cfg, with_bn = _arch_cfg(arch)
    plan, idx = [], 0
    for v in cfg:
        if v == "M":
            plan.append(("pool", "", 0))
            idx += 1
            continue
        plan.append(("conv", f"features_{idx}", v))
        idx += 1
        if with_bn:
            plan.append(("bn", f"features_{idx}_bn", v))
            idx += 1
        idx += 1  # the ReLU slot
    return plan


def torch_scope_map(arch: str) -> Dict[str, str]:
    """torchvision layer name -> our flax scope (for checkpoint conversion)."""
    out = {}
    for kind, scope, _ in torch_layer_plan(arch):
        if kind in ("conv", "bn"):
            torch_idx = scope.split("_")[1]
            out[f"features.{torch_idx}"] = scope
    out["classifier.0"] = "classifier_0"
    out["classifier.3"] = "classifier_3"
    return out


class VGG(nn.Module):
    """Torchvision-compatible VGG feature extractor ending at fc7 (4096-d)."""

    arch: str = "vgg16"
    in_channels: int = 3
    dtype: Any = jnp.float32
    bn_mode: str = "frozen"
    classifier_dropout: float = 0.5

    def _bn_train(self, train: bool, idx: int) -> bool:
        if not train or self.bn_mode == "frozen":
            return False
        if self.bn_mode == "partial":
            return idx == 0
        return self.bn_mode == "full"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = x.astype(d)
        bn_idx = 0
        for kind, scope, ch in torch_layer_plan(self.arch):
            if kind == "pool":
                x = max_pool_2d(x, 2, 2, ((0, 0), (0, 0)))  # plain AD (pooling.py)
            elif kind == "conv":
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                            dtype=d, name=scope)(x)
                if not self.arch.endswith("_bn"):
                    x = nn.relu(x)
            else:  # bn (followed by the relu the conv skipped)
                x = nn.BatchNorm(use_running_average=not self._bn_train(train, bn_idx),
                                 momentum=0.9, epsilon=1e-5, dtype=d,
                                 name=scope)(x)
                x = nn.relu(x)
                bn_idx += 1

        # torchvision adaptive-avg-pools to 7x7 before the classifier; at the
        # native 224 input the grid is already 7x7
        h, w = x.shape[1], x.shape[2]
        if (h, w) != (7, 7):
            if h % 7 or w % 7:
                raise ValueError(
                    f"VGG input must give a 7-divisible feature grid, got {h}x{w}")
            x = nn.avg_pool(x, (h // 7, w // 7), strides=(h // 7, w // 7))

        # flatten CHW to match the torch fc6 kernel layout
        n = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(n, -1).astype(jnp.float32)

        det = not train
        x = nn.relu(nn.Dense(4096, name="classifier_0")(x))
        x = nn.Dropout(self.classifier_dropout, name="dropout_0")(x, deterministic=det)
        x = nn.relu(nn.Dense(4096, name="classifier_3")(x))
        x = nn.Dropout(self.classifier_dropout, name="dropout_1")(x, deterministic=det)
        return x
