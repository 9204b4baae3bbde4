"""TinyConv: a minimal conv backbone for tests and sharding dry-runs.

Shares the real backbones' API (conv+BN naming, frozen-BN policy, global
average pooled features) at a compile cost of milliseconds, so trainer and
mesh logic can be exercised on virtual CPU devices.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

FEATURE_DIM = 32


class TinyConv(nn.Module):
    in_channels: int = 3
    bn_mode: str = "frozen"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        train_bn = train and self.bn_mode == "full"
        x = x.astype(self.dtype)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME",
                    name="conv1_7x7_s2")(x)
        x = nn.BatchNorm(use_running_average=not train_bn, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name="conv1_7x7_s2_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(FEATURE_DIM, (3, 3), strides=(2, 2), padding="SAME",
                    name="conv2_3x3")(x)
        x = nn.BatchNorm(use_running_average=not train_bn, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="conv2_3x3_bn")(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
