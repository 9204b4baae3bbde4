"""BN-Inception (GoogLeNet with Batch Normalization) in flax, NHWC.

The reference consumes this backbone from the external ``model_zoo`` submodule
(a Caffe->torch port selected at /root/reference/ssn_models.py:121-127:
224x224 BGR inputs, mean [104,117,128], std 1, feature dim 1024). This is a
from-scratch JAX implementation of the same architecture (Ioffe & Szegedy,
2015 — inception modules with double-3x3 towers), laid out TPU-first:

* NHWC layout and bf16-friendly compute dtype (params stay f32),
* Caffe-style ceil-mode pooling expressed as explicit right/bottom padding so
  all shapes stay static for XLA,
* layer names match the Caffe port's blob names (``conv1_7x7_s2``,
  ``inception_3a_1x1``, ...) so reference checkpoints convert 1:1,
* BN freezing (SSN trains with frozen BN, ssn_models.py:156-174) is just
  ``use_running_average=True`` — no mutable state update, nothing to "shut
  down".
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.pooling import max_pool_2d

# (name, out_channels per branch, pool kind, stride)
# branches: 1x1 | 3x3_reduce->3x3 | double_3x3_reduce->double_3x3_1->double_3x3_2 | pool_proj
# stride-2 modules drop the 1x1 branch and use an unprojected max pool.
_INCEPTION_CFG: Sequence[Tuple[str, Optional[int], int, int, int, int, int,
                               Optional[int], str, int]] = (
    # name,      1x1, 3r,  3x3, d3r, d31, d32, proj, pool,  stride
    ("inception_3a", 64,  64,  64,  64,  96,  96, 32,  "avg", 1),
    ("inception_3b", 64,  64,  96,  64,  96,  96, 64,  "avg", 1),
    ("inception_3c", None, 128, 160, 64,  96,  96, None, "max", 2),
    ("inception_4a", 224, 64,  96,  96, 128, 128, 128, "avg", 1),
    ("inception_4b", 192, 96, 128,  96, 128, 128, 128, "avg", 1),
    ("inception_4c", 160, 128, 160, 128, 160, 160, 128, "avg", 1),
    ("inception_4d", 96, 128, 192, 160, 192, 192, 128, "avg", 1),
    ("inception_4e", None, 128, 192, 192, 256, 256, None, "max", 2),
    ("inception_5a", 352, 192, 320, 160, 224, 224, 128, "avg", 1),
    ("inception_5b", 352, 192, 320, 192, 224, 224, 128, "max", 1),
)

FEATURE_DIM = 1024


def _ceil_pool_padding(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """Right/bottom padding reproducing Caffe ceil-mode pooling statically."""
    out = -(-(size - kernel) // stride) + 1  # ceil division
    pad = max((out - 1) * stride + kernel - size, 0)
    return (0, pad)


def stem_feature_hw(size: int) -> int:
    """Spatial size of the stem output (the trunk input) for one input dim.

    conv1 7x7 s2 pad3 -> ceil 3x3 s2 max pool -> conv2 (size-preserving)
    -> ceil 3x3 s2 max pool; overall stride 8 (224 -> 28, 256 -> 32,
    340 -> 42). Used by the shared-stem scorer path to slice crop windows
    on the trunk-input grid."""
    n = (size + 2 * 3 - 7) // 2 + 1
    n = -(-(n - 3) // 2) + 1
    n = -(-(n - 3) // 2) + 1
    return n


def _max_pool(x: jnp.ndarray, kernel: int, stride: int, ceil: bool = False,
              pad: int = 0) -> jnp.ndarray:
    """Max pool; forward == nn.max_pool, backward = plain AD
    (SelectAndScatter) by default. Routed through ops/pooling.py so the
    eq-mask VJP lever stays opt-in measurable — it was REJECTED r5 on a
    measured A/B (321.9 vs 262.7 ms fwd+bwd at the recipe batch; see
    ops/pooling.py module docstring)."""
    if ceil:
        padding = [_ceil_pool_padding(x.shape[1], kernel, stride),
                   _ceil_pool_padding(x.shape[2], kernel, stride)]
    else:
        padding = [(pad, pad), (pad, pad)]
    return max_pool_2d(x, kernel, stride, padding)


def _avg_pool_include_pad(x: jnp.ndarray, kernel: int, stride: int, pad: int) -> jnp.ndarray:
    """Average pooling with count_include_pad=True (Caffe/torch-port behavior).

    nn.avg_pool is used (not raw lax.reduce_window + add) because this jax
    version only linearizes the blessed avg-pool formulation under jit.
    """
    return nn.avg_pool(x, (kernel, kernel), strides=(stride, stride),
                       padding=[(pad, pad), (pad, pad)],
                       count_include_pad=True)


def conv_bn(parent_scope_x: jnp.ndarray, features: int, kernel: Tuple[int, int],
            name: str, stride: int = 1, pad: int = 0, train_bn: bool = False,
            dtype: Any = jnp.float32) -> jnp.ndarray:
    """Conv -> BatchNorm -> ReLU, declared flat in the caller's scope so param
    names match the Caffe port's blob names exactly."""
    x = nn.Conv(features, kernel, strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                use_bias=True, dtype=dtype, name=name)(parent_scope_x)
    x = nn.BatchNorm(use_running_average=not train_bn, momentum=0.9,
                     epsilon=1e-5, dtype=dtype, name=name + "_bn")(x)
    return nn.relu(x)


class InceptionModule(nn.Module):
    """4-branch (or 2-branch downsampling) inception module with double-3x3."""
    name_prefix: str
    c1x1: Optional[int]
    c3r: int
    c3: int
    cd3r: int
    cd31: int
    cd32: int
    cproj: Optional[int]
    pool: str
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train_bn: bool = False) -> jnp.ndarray:
        p = self.name_prefix
        branches = []
        if self.c1x1 is not None:
            branches.append(conv_bn(x, self.c1x1, (1, 1), f"{p}_1x1",
                                    train_bn=train_bn, dtype=self.dtype))

        b3 = conv_bn(x, self.c3r, (1, 1), f"{p}_3x3_reduce",
                     train_bn=train_bn, dtype=self.dtype)
        b3 = conv_bn(b3, self.c3, (3, 3), f"{p}_3x3", stride=self.stride, pad=1,
                     train_bn=train_bn, dtype=self.dtype)
        branches.append(b3)

        bd = conv_bn(x, self.cd3r, (1, 1), f"{p}_double_3x3_reduce",
                     train_bn=train_bn, dtype=self.dtype)
        bd = conv_bn(bd, self.cd31, (3, 3), f"{p}_double_3x3_1", pad=1,
                     train_bn=train_bn, dtype=self.dtype)
        bd = conv_bn(bd, self.cd32, (3, 3), f"{p}_double_3x3_2",
                     stride=self.stride, pad=1, train_bn=train_bn,
                     dtype=self.dtype)
        branches.append(bd)

        if self.stride == 1:
            if self.pool == "avg":
                bp = _avg_pool_include_pad(x, 3, 1, 1)
            else:
                bp = _max_pool(x, 3, 1, pad=1)
            bp = conv_bn(bp, self.cproj, (1, 1), f"{p}_pool_proj",
                         train_bn=train_bn, dtype=self.dtype)
            branches.append(bp)
        else:
            # downsampling module: unprojected ceil-mode max pool pass-through
            branches.append(_max_pool(x, 3, 2, ceil=True))

        return jnp.concatenate(branches, axis=-1)


class BNInception(nn.Module):
    """BN-Inception feature extractor: (N, 224, 224, C) -> (N, 1024)."""
    in_channels: int = 3
    num_classes: Optional[int] = None  # adds an ImageNet-style fc head if set
    dtype: Any = jnp.float32

    # SSN BN-freeze policy: 'frozen' freezes every BN, 'partial' trains only
    # the first, 'full' trains all (ssn_models.py:95-105). BN "training" here
    # means using batch stats; running stats are updated via mutable
    # collections by the caller.
    bn_mode: str = "frozen"

    def _bn_train(self, train: bool, bn_index: int) -> bool:
        if not train or self.bn_mode == "frozen":
            return False
        if self.bn_mode == "partial":
            return bn_index == 0
        if self.bn_mode == "full":
            return True
        raise ValueError(f"unknown bn mode {self.bn_mode}")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = conv_bn(x, 64, (7, 7), "conv1_7x7_s2", stride=2, pad=3,
                    train_bn=self._bn_train(train, 0), dtype=self.dtype)
        x = _max_pool(x, 3, 2, ceil=True)
        x = conv_bn(x, 64, (1, 1), "conv2_3x3_reduce",
                    train_bn=self._bn_train(train, 1), dtype=self.dtype)
        x = conv_bn(x, 192, (3, 3), "conv2_3x3", pad=1,
                    train_bn=self._bn_train(train, 2), dtype=self.dtype)
        x = _max_pool(x, 3, 2, ceil=True)

        bn_index = 3
        for (name, c1, c3r, c3, cd3r, cd31, cd32, cproj, pool, stride) in _INCEPTION_CFG:
            x = InceptionModule(name_prefix=name, c1x1=c1, c3r=c3r, c3=c3,
                                cd3r=cd3r, cd31=cd31, cd32=cd32, cproj=cproj,
                                pool=pool, stride=stride, dtype=self.dtype,
                                name=name)(x, self._bn_train(train, bn_index))
            bn_index += 1

        # global average pool -> (N, 1024) features in f32
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_classes is not None:
            feats = nn.Dense(self.num_classes, name="fc")(feats)
        return feats
