"""Binary actionness classifier (fg vs bg) used by TAG proposal generation.

Capability parity target: /root/reference/binary_model.py (BinaryClassifier):
a TSN-style classifier that averages the features of the course segments of a
proposal and applies one linear head. At test time the head applies per frame
directly (prepare_test_fc is the identity reorganization,
binary_model.py:245-254), producing dense per-frame actionness scores.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones import get_backbone


class BinaryClassifier(nn.Module):
    """Course-segment-mean TSN binary classifier."""
    num_class: int = 2
    course_segment: int = 5
    modality: str = "RGB"
    base_model: str = "BNInception"
    new_length: Optional[int] = None
    dropout: float = 0.8
    bn_mode: str = "frozen"
    dtype: Any = jnp.float32

    def setup(self):
        backbone, feature_dim, _ = get_backbone(
            self.base_model, self.modality, self.new_length,
            bn_mode=self.bn_mode, dtype=self.dtype)
        self.backbone = backbone
        self.feature_dim = feature_dim
        self.classifier_fc = nn.Dense(
            self.num_class, kernel_init=nn.initializers.normal(stddev=0.001),
            precision=jax.lax.Precision.HIGHEST, name="classifier_fc")
        self.head_dropout = nn.Dropout(rate=self.dropout, name="head_dropout")

    def features(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.backbone(frames, train)
        if self.dropout > 0:
            feats = self.head_dropout(feats, deterministic=not train)
        return feats

    def __call__(self, frames: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """Training forward: ``(P, S, H, W, C)`` -> ``(P, 2)`` logits."""
        P, S = frames.shape[0], frames.shape[1]
        flat = frames.reshape((P * S,) + frames.shape[2:])
        feats = self.features(flat, train=train).reshape(P, S, self.feature_dim)
        course_ft = feats.mean(axis=1)
        return self.classifier_fc(course_ft)

    def score_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Dense inference: per-frame actionness logits ``(N, 2)``.

        The head is linear, so per-frame scores need no reorganization — this
        is the fused test FC of the reference.
        """
        feats = self.features(frames, train=False)
        return self.classifier_fc(feats)
