"""SSN: structured segment network over sparse-sampled proposal segments.

Capability parity target: /root/reference/ssn_models.py (class SSN). The
forward path here is a clean function of static shapes:

  frames (P, S, H, W, C) -> backbone (batched over P*S) -> dropout ->
  STPP (one pooling matmul) -> activity / completeness / regression heads.

Unlike the reference, proposal-type subset selection (activity loss sees
fg+bg, completeness sees fg+incomplete, regression sees fg) is *not* done
with data-dependent gathers inside the model — the per-video proposal layout
is static (1 fg, 6 incomplete, 1 bg by config), so the trainer slices
statically (see train/trainer.py). That keeps every shape known to XLA.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.stpp import StppConfig, stpp_train_pool
from .backbones import get_backbone


class SSN(nn.Module):
    """Three-head SSN classifier over STPP-pooled segment features."""
    num_class: int
    starting_segment: int = 2
    course_segment: int = 5
    ending_segment: int = 2
    modality: str = "RGB"
    base_model: str = "BNInception"
    new_length: Optional[int] = None
    dropout: float = 0.8
    with_regression: bool = True
    stpp_cfg: Tuple = (1, 1, 1)
    bn_mode: str = "frozen"
    dtype: Any = jnp.float32
    # rematerialize backbone activations in the backward pass (memory for
    # large training batches; SURVEY §7 "jax.checkpoint to trade FLOPs")
    remat: bool = False
    # standalone activity classifier: activity head sees the plain course
    # mean, not the pyramid (reference always passes True, ssn_models.py:76)
    standalone_classifier: bool = True

    @property
    def num_segments(self) -> int:
        return self.starting_segment + self.course_segment + self.ending_segment

    @property
    def resolved_new_length(self) -> int:
        if self.new_length is None:
            return 1 if self.modality == "RGB" else 5
        return self.new_length

    @property
    def seg_split(self) -> Tuple[int, int, int]:
        return (self.starting_segment,
                self.starting_segment + self.course_segment,
                self.num_segments)

    def setup(self):
        self.stpp = StppConfig.from_raw(self.stpp_cfg)
        backbone, feature_dim, _ = get_backbone(
            self.base_model, self.modality, self.new_length,
            bn_mode=self.bn_mode, dtype=self.dtype, remat=self.remat)
        self.backbone = backbone
        self.feature_dim = feature_dim

        init = nn.initializers.normal(stddev=0.001)
        # full-precision head matmuls: score parity with converted checkpoints
        # matters more than the negligible FLOPs here
        prec = jax.lax.Precision.HIGHEST
        self.activity_fc = nn.Dense(self.num_class + 1, kernel_init=init,
                                    precision=prec, name="activity_fc")
        self.completeness_fc = nn.Dense(self.num_class, kernel_init=init,
                                        precision=prec, name="completeness_fc")
        if self.with_regression:
            self.regressor_fc = nn.Dense(2 * self.num_class, kernel_init=init,
                                         precision=prec, name="regressor_fc")
        self.head_dropout = nn.Dropout(rate=self.dropout, name="head_dropout")

    def features(self, frames: jnp.ndarray, train: bool = False,
                 deterministic: Optional[bool] = None) -> jnp.ndarray:
        """Backbone features with the reference's head dropout applied.

        frames: ``(N, H, W, C)`` normalized inputs; returns ``(N, D)``.
        """
        if self.remat:
            # function-target remat: `train` is closed over (static), only
            # activations of the backbone are rematerialized in backward
            feats = nn.remat(lambda mdl, x: mdl(x, train))(self.backbone, frames)
        else:
            feats = self.backbone(frames, train)
        det = (not train) if deterministic is None else deterministic
        if self.dropout > 0:
            feats = self.head_dropout(feats, deterministic=det)
        return feats

    def __call__(self, frames: jnp.ndarray, scaling: jnp.ndarray,
                 train: bool = True):
        """Training/validation forward over proposals.

        Args:
          frames: ``(P, S, H, W, C)`` normalized segment frames.
          scaling: ``(P, 2)`` start/end stage validity scalings.
          train: enables dropout (and batch-stat BN when bn_mode allows).

        Returns:
          (activity_logits (P, K+1), completeness (P, K),
           regression (P, K, 2) or None)
        """
        P, S = frames.shape[0], frames.shape[1]
        flat = frames.reshape((P * S,) + frames.shape[2:])
        feats = self.features(flat, train=train)
        feats = feats.reshape(P, S, self.feature_dim)

        act_ft, comp_ft = stpp_train_pool(
            feats, scaling, self.seg_split, self.stpp,
            standalone_classifier=self.standalone_classifier)

        act = self.activity_fc(act_ft)
        comp = self.completeness_fc(comp_ft)
        reg = None
        if self.with_regression:
            reg = self.regressor_fc(comp_ft).reshape(P, self.num_class, 2)
        return act, comp, reg

    def score_frames(self, frames: jnp.ndarray, test_kernel: jnp.ndarray,
                     test_bias: jnp.ndarray) -> jnp.ndarray:
        """Inference scorer: per-frame fused test-FC scores.

        ``test_kernel/test_bias`` come from :func:`fuse_test_heads`; the model
        must be applied with ``method=SSN.score_frames`` and test params.
        """
        feats = self.features(frames, train=False)
        return jnp.matmul(feats, test_kernel,
                          precision=jax.lax.Precision.HIGHEST) + test_bias


def fuse_test_heads(params, num_class: int, stpp_cfg=(1, 1, 1),
                    with_regression: bool = True,
                    standalone_classifier: bool = True):
    """Reorganize the three linear heads into one fused per-frame test FC.

    Because the heads are linear, ``head(pool(features)) == pool(head(features))``
    — so inference runs the CNN once per sampled frame and pools *scores* per
    proposal (the reorganized test of /root/reference/ssn_models.py:176-201).
    Column layout: ``[activity | completeness part-major | regression part-major]``;
    each part block carries ``bias / feat_multiplier`` so the pooled sum
    reproduces the bias once.

    Args:
      params: the SSN param pytree (``params['activity_fc']['kernel']`` etc.,
        flax Dense kernels of shape (in, out)).

    Returns:
      (kernel (D, total_cols), bias (total_cols,))
    """
    cfg = StppConfig.from_raw(stpp_cfg)
    J = cfg.feat_multiplier

    act_k = params["activity_fc"]["kernel"]          # (D or J*D, K+1)
    act_b = params["activity_fc"]["bias"]
    comp_k = params["completeness_fc"]["kernel"]     # (J*D, K)
    comp_b = params["completeness_fc"]["bias"]

    feat_dim = comp_k.shape[0] // J
    K = num_class

    if not standalone_classifier:
        # activity kernel is itself part-major over J blocks
        act_parts = act_k.reshape(J, feat_dim, K + 1)
        kernels = [act_parts[j] for j in range(J)]
        biases = [jnp.broadcast_to(act_b / J, (J, K + 1)).reshape(-1)]
        act_cols = [jnp.concatenate(kernels, axis=1)]
    else:
        act_cols = [act_k]
        biases = [act_b]

    comp_parts = comp_k.reshape(J, feat_dim, K)
    cols = act_cols + [comp_parts[j] for j in range(J)]
    biases.append(jnp.tile(comp_b / J, (J,)))

    if with_regression:
        reg_k = params["regressor_fc"]["kernel"]     # (J*D, 2K)
        reg_b = params["regressor_fc"]["bias"]
        reg_parts = reg_k.reshape(J, feat_dim, 2 * K)
        cols.extend(reg_parts[j] for j in range(J))
        biases.append(jnp.tile(reg_b / J, (J,)))

    return jnp.concatenate(cols, axis=1), jnp.concatenate(biases)
