"""Inception V3 in flax, NHWC (299x299 -> 2048 features).

The reference selects this backbone from the tensorflow-model-zoo.torch
submodule (/root/reference/ssn_models.py:133-139: input 299, Caffe-style
mean [104,117,128], std 1, last layer ``top_cls_fc``). This is a from-scratch
implementation of the standard Inception V3 topology (Szegedy et al., 2015,
"Rethinking the Inception Architecture") with TF-slim module naming
(Conv2d_1a_3x3 ... Mixed_7c) for checkpoint conversion.

Same TPU-first conventions as bn_inception.py: static shapes, frozen-BN via
use_running_average, bf16-friendly compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.pooling import max_pool_2d

FEATURE_DIM = 2048


def _conv_bn(x, features: int, kernel: Tuple[int, int], name: str,
             stride: int = 1, pad=((0, 0), (0, 0)), train_bn: bool = False,
             dtype=jnp.float32):
    x = nn.Conv(features, kernel, strides=(stride, stride), padding=pad,
                use_bias=False, dtype=dtype, name=name + "_conv")(x)
    x = nn.BatchNorm(use_running_average=not train_bn, momentum=0.9,
                     epsilon=1e-3, dtype=dtype, name=name + "_bn")(x)
    return nn.relu(x)


def _same(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = k // 2
    return ((p, p), (p, p))


def _avg_pool_same(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_same(3),
                       count_include_pad=False)


def _max_pool(x, kernel: int = 3, stride: int = 2):
    # forward == nn.max_pool VALID; backward = plain AD by default (the
    # eq-mask lever stays opt-in via ops/pooling.py — rejected r5 on A/B).
    return max_pool_2d(x, kernel, stride, ((0, 0), (0, 0)))


class MixedA(nn.Module):
    """35x35 module: 1x1 | 5x5 | double 3x3 | avg-pool proj."""
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        d = self.dtype
        b0 = _conv_bn(x, 64, (1, 1), "branch1x1", train_bn=train_bn, dtype=d)
        b1 = _conv_bn(x, 48, (1, 1), "branch5x5_1", train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, 64, (5, 5), "branch5x5_2", pad=_same(5),
                      train_bn=train_bn, dtype=d)
        b2 = _conv_bn(x, 64, (1, 1), "branch3x3dbl_1", train_bn=train_bn, dtype=d)
        b2 = _conv_bn(b2, 96, (3, 3), "branch3x3dbl_2", pad=_same(3),
                      train_bn=train_bn, dtype=d)
        b2 = _conv_bn(b2, 96, (3, 3), "branch3x3dbl_3", pad=_same(3),
                      train_bn=train_bn, dtype=d)
        b3 = _conv_bn(_avg_pool_same(x), self.pool_features, (1, 1),
                      "branch_pool", train_bn=train_bn, dtype=d)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class MixedB(nn.Module):
    """17x17 downsample: 3x3/2 | double 3x3/2 | max-pool."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        d = self.dtype
        b0 = _conv_bn(x, 384, (3, 3), "branch3x3", stride=2,
                      train_bn=train_bn, dtype=d)
        b1 = _conv_bn(x, 64, (1, 1), "branch3x3dbl_1", train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, 96, (3, 3), "branch3x3dbl_2", pad=_same(3),
                      train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, 96, (3, 3), "branch3x3dbl_3", stride=2,
                      train_bn=train_bn, dtype=d)
        return jnp.concatenate([b0, b1, _max_pool(x)], axis=-1)


class MixedC(nn.Module):
    """17x17 module with factorized 7x7 convolutions."""
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        d, c7 = self.dtype, self.c7
        b0 = _conv_bn(x, 192, (1, 1), "branch1x1", train_bn=train_bn, dtype=d)
        b1 = _conv_bn(x, c7, (1, 1), "branch7x7_1", train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, c7, (1, 7), "branch7x7_2", pad=((0, 0), (3, 3)),
                      train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, 192, (7, 1), "branch7x7_3", pad=((3, 3), (0, 0)),
                      train_bn=train_bn, dtype=d)
        b2 = _conv_bn(x, c7, (1, 1), "branch7x7dbl_1", train_bn=train_bn, dtype=d)
        b2 = _conv_bn(b2, c7, (7, 1), "branch7x7dbl_2", pad=((3, 3), (0, 0)),
                      train_bn=train_bn, dtype=d)
        b2 = _conv_bn(b2, c7, (1, 7), "branch7x7dbl_3", pad=((0, 0), (3, 3)),
                      train_bn=train_bn, dtype=d)
        b2 = _conv_bn(b2, c7, (7, 1), "branch7x7dbl_4", pad=((3, 3), (0, 0)),
                      train_bn=train_bn, dtype=d)
        b2 = _conv_bn(b2, 192, (1, 7), "branch7x7dbl_5", pad=((0, 0), (3, 3)),
                      train_bn=train_bn, dtype=d)
        b3 = _conv_bn(_avg_pool_same(x), 192, (1, 1), "branch_pool",
                      train_bn=train_bn, dtype=d)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class MixedD(nn.Module):
    """8x8 downsample: 1x1->3x3/2 | 1x1->1x7->7x1->3x3/2 | max-pool."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        d = self.dtype
        b0 = _conv_bn(x, 192, (1, 1), "branch3x3_1", train_bn=train_bn, dtype=d)
        b0 = _conv_bn(b0, 320, (3, 3), "branch3x3_2", stride=2,
                      train_bn=train_bn, dtype=d)
        b1 = _conv_bn(x, 192, (1, 1), "branch7x7x3_1", train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, 192, (1, 7), "branch7x7x3_2", pad=((0, 0), (3, 3)),
                      train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, 192, (7, 1), "branch7x7x3_3", pad=((3, 3), (0, 0)),
                      train_bn=train_bn, dtype=d)
        b1 = _conv_bn(b1, 192, (3, 3), "branch7x7x3_4", stride=2,
                      train_bn=train_bn, dtype=d)
        return jnp.concatenate([b0, b1, _max_pool(x)], axis=-1)


class MixedE(nn.Module):
    """8x8 module with expanded filter-bank outputs."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        d = self.dtype
        b0 = _conv_bn(x, 320, (1, 1), "branch1x1", train_bn=train_bn, dtype=d)
        b1 = _conv_bn(x, 384, (1, 1), "branch3x3_1", train_bn=train_bn, dtype=d)
        b1a = _conv_bn(b1, 384, (1, 3), "branch3x3_2a", pad=((0, 0), (1, 1)),
                       train_bn=train_bn, dtype=d)
        b1b = _conv_bn(b1, 384, (3, 1), "branch3x3_2b", pad=((1, 1), (0, 0)),
                       train_bn=train_bn, dtype=d)
        b1 = jnp.concatenate([b1a, b1b], axis=-1)
        b2 = _conv_bn(x, 448, (1, 1), "branch3x3dbl_1", train_bn=train_bn, dtype=d)
        b2 = _conv_bn(b2, 384, (3, 3), "branch3x3dbl_2", pad=_same(3),
                      train_bn=train_bn, dtype=d)
        b2a = _conv_bn(b2, 384, (1, 3), "branch3x3dbl_3a", pad=((0, 0), (1, 1)),
                       train_bn=train_bn, dtype=d)
        b2b = _conv_bn(b2, 384, (3, 1), "branch3x3dbl_3b", pad=((1, 1), (0, 0)),
                       train_bn=train_bn, dtype=d)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        b3 = _conv_bn(_avg_pool_same(x), 192, (1, 1), "branch_pool",
                      train_bn=train_bn, dtype=d)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """Inception V3 feature extractor: (N, 299, 299, C) -> (N, 2048)."""
    in_channels: int = 3
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32
    bn_mode: str = "frozen"

    def _bn(self, train: bool, idx: int) -> bool:
        if not train or self.bn_mode == "frozen":
            return False
        if self.bn_mode == "partial":
            return idx == 0
        return self.bn_mode == "full"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = x.astype(d)
        x = _conv_bn(x, 32, (3, 3), "Conv2d_1a_3x3", stride=2,
                     train_bn=self._bn(train, 0), dtype=d)
        x = _conv_bn(x, 32, (3, 3), "Conv2d_2a_3x3",
                     train_bn=self._bn(train, 1), dtype=d)
        x = _conv_bn(x, 64, (3, 3), "Conv2d_2b_3x3", pad=_same(3),
                     train_bn=self._bn(train, 1), dtype=d)
        x = _max_pool(x)
        x = _conv_bn(x, 80, (1, 1), "Conv2d_3b_1x1",
                     train_bn=self._bn(train, 1), dtype=d)
        x = _conv_bn(x, 192, (3, 3), "Conv2d_4a_3x3",
                     train_bn=self._bn(train, 1), dtype=d)
        x = _max_pool(x)

        x = MixedA(pool_features=32, dtype=d, name="Mixed_5b")(x, self._bn(train, 2))
        x = MixedA(pool_features=64, dtype=d, name="Mixed_5c")(x, self._bn(train, 2))
        x = MixedA(pool_features=64, dtype=d, name="Mixed_5d")(x, self._bn(train, 2))
        x = MixedB(dtype=d, name="Mixed_6a")(x, self._bn(train, 2))
        x = MixedC(c7=128, dtype=d, name="Mixed_6b")(x, self._bn(train, 2))
        x = MixedC(c7=160, dtype=d, name="Mixed_6c")(x, self._bn(train, 2))
        x = MixedC(c7=160, dtype=d, name="Mixed_6d")(x, self._bn(train, 2))
        x = MixedC(c7=192, dtype=d, name="Mixed_6e")(x, self._bn(train, 2))
        x = MixedD(dtype=d, name="Mixed_7a")(x, self._bn(train, 2))
        x = MixedE(dtype=d, name="Mixed_7b")(x, self._bn(train, 2))
        x = MixedE(dtype=d, name="Mixed_7c")(x, self._bn(train, 2))

        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_classes is not None:
            feats = nn.Dense(self.num_classes, name="top_cls_fc")(feats)
        return feats
