"""ResNet v1 family in flax, NHWC (the reference's torchvision backbones).

The reference supports any torchvision resnet/vgg by name
(/root/reference/ssn_models.py:108-113; default arch is resnet101 at :14).
This implements ResNet-18/34/50/101/152 with torchvision layer naming
(layer1.0.conv1 ...) flattened to flax scopes for checkpoint conversion.
Input spec: 224², RGB [0,1] normalized by ImageNet mean/std (div255=True).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.pooling import max_pool_2d

_STAGES = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def feature_dim(arch: str) -> int:
    block, _ = _STAGES[arch]
    return 512 if block == "basic" else 2048


def _conv(x, features, kernel, name, stride=1, dtype=jnp.float32):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   dtype=dtype, name=name)(x)


def _bn(x, name, train_bn=False, dtype=jnp.float32):
    return nn.BatchNorm(use_running_average=not train_bn, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn=False):
        d = self.dtype
        identity = x
        out = _conv(x, self.features, 3, "conv1", self.stride, d)
        out = nn.relu(_bn(out, "bn1", train_bn, d))
        out = _conv(out, self.features, 3, "conv2", 1, d)
        out = _bn(out, "bn2", train_bn, d)
        if self.downsample:
            identity = _conv(x, self.features, 1, "downsample_conv",
                             self.stride, d)
            identity = _bn(identity, "downsample_bn", train_bn, d)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int       # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn=False):
        d = self.dtype
        identity = x
        out = _conv(x, self.features, 1, "conv1", 1, d)
        out = nn.relu(_bn(out, "bn1", train_bn, d))
        out = _conv(out, self.features, 3, "conv2", self.stride, d)
        out = nn.relu(_bn(out, "bn2", train_bn, d))
        out = _conv(out, self.features * 4, 1, "conv3", 1, d)
        out = _bn(out, "bn3", train_bn, d)
        if self.downsample:
            identity = _conv(x, self.features * 4, 1, "downsample_conv",
                             self.stride, d)
            identity = _bn(identity, "downsample_bn", train_bn, d)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    arch: str = "resnet101"
    in_channels: int = 3
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32
    bn_mode: str = "frozen"

    def _bn_train(self, train: bool, idx: int) -> bool:
        if not train or self.bn_mode == "frozen":
            return False
        if self.bn_mode == "partial":
            return idx == 0
        return self.bn_mode == "full"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_kind, stage_sizes = _STAGES[self.arch]
        Block = BasicBlock if block_kind == "basic" else Bottleneck
        d = self.dtype
        x = x.astype(d)
        x = _conv(x, 64, 7, "conv1", 2, d)
        x = nn.relu(_bn(x, "bn1", self._bn_train(train, 0), d))
        x = max_pool_2d(x, 3, 2, ((1, 1), (1, 1)))  # plain AD (pooling.py)

        for stage, n_blocks in enumerate(stage_sizes):
            features = 64 * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                downsample = (b == 0 and (stride != 1 or stage == 0
                                          and block_kind == "bottleneck"))
                x = Block(features=features, stride=stride,
                          downsample=downsample, dtype=d,
                          name=f"layer{stage + 1}_{b}")(
                              x, self._bn_train(train, 1))

        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_classes is not None:
            feats = nn.Dense(self.num_classes, name="fc")(feats)
        return feats
