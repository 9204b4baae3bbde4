"""SSN losses: activity CE, OHEM hinge completeness, class-wise regression.

Semantics parity targets (reference, behavior only):
  OHEM hinge          /root/reference/ops/ssn_ops.py:173-213
  CompletenessLoss    /root/reference/ops/ssn_ops.py:216-239
  ClassWiseRegression /root/reference/ops/ssn_ops.py:242-258

The reference implements OHEM with a hand-written ``autograd.Function``
backward (Python loops over kept indices). Here the same selection is
closed-form: per-group ``lax.top_k`` over hinge losses plus a mask — gradients
flow only through kept, margin-violating samples automatically, so no custom
VJP is needed. Tie-breaking among equal losses follows top_k's index order
(documented deviation; the reference uses torch.sort order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ohem_hinge_loss(pred: jnp.ndarray, labels: jnp.ndarray, is_positive: int,
                    ohem_ratio: float, group_size: int) -> jnp.ndarray:
    """Class-wise hinge loss with online hard example mining.

    Args:
      pred: ``(N, K)`` raw completeness scores, N a multiple of group_size.
      labels: ``(N,)`` int labels in ``1..K`` (the GT-class column is used).
      is_positive: +1 for positive groups, -1 for negatives.
      ohem_ratio: fraction of each group kept (hardest examples).
      group_size: samples per mining group.

    Returns:
      Scalar sum of kept hinge losses (not yet normalized).
    """
    n = pred.shape[0]
    cls_score = jnp.take_along_axis(pred, (labels - 1)[:, None], axis=1)[:, 0]
    margin = 1.0 - is_positive * cls_score
    losses = jnp.where(margin > 0, margin, 0.0)          # clean 0-gradient at margin
    losses = losses.reshape(n // group_size, group_size)
    keep_num = int(group_size * ohem_ratio)
    kept, _ = jax.lax.top_k(losses, keep_num)            # differentiable selection
    return kept.sum()


def completeness_loss(pred: jnp.ndarray, labels: jnp.ndarray,
                      sample_split: int, sample_group_size: int,
                      ohem_ratio: float = 0.17) -> jnp.ndarray:
    """OHEM completeness loss over per-video groups.

    Each group of ``sample_group_size`` proposals holds ``sample_split``
    positives (complete fg) followed by negatives (incomplete). Positives all
    contribute; only the hardest ``ohem_ratio`` fraction of negatives do. The
    sum is normalized by the number of contributing samples.
    """
    pred_dim = pred.shape[1]
    pred_g = pred.reshape(-1, sample_group_size, pred_dim)
    labels_g = labels.reshape(-1, sample_group_size)

    pos_pred = pred_g[:, :sample_split, :].reshape(-1, pred_dim)
    neg_pred = pred_g[:, sample_split:, :].reshape(-1, pred_dim)
    pos_ls = ohem_hinge_loss(pos_pred, labels_g[:, :sample_split].reshape(-1),
                             1, 1.0, sample_split)
    neg_group = sample_group_size - sample_split
    neg_ls = ohem_hinge_loss(neg_pred, labels_g[:, sample_split:].reshape(-1),
                             -1, ohem_ratio, neg_group)
    pos_cnt = pos_pred.shape[0]
    neg_cnt = int(neg_pred.shape[0] * ohem_ratio)
    return (pos_ls + neg_ls) / float(pos_cnt + neg_cnt)


def classwise_regression_loss(pred: jnp.ndarray, labels: jnp.ndarray,
                              targets: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 on the GT-class (center shift, log duration) pair, doubled.

    Args:
      pred: ``(N, K, 2)`` per-class regression outputs.
      labels: ``(N,)`` int labels in ``1..K``.
      targets: ``(N, 2)`` normalized regression targets.
    """
    idx = (labels - 1)[:, None, None]
    class_pred = jnp.take_along_axis(pred, jnp.broadcast_to(idx, (pred.shape[0], 1, 2)),
                                     axis=1)[:, 0, :]
    diff = class_pred - targets
    adiff = jnp.abs(diff)
    elem = jnp.where(adiff < 1.0, 0.5 * diff * diff, adiff - 0.5)
    return elem.mean() * 2.0


def activity_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels (activity head)."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Top-1 accuracy in percent (training diagnostics)."""
    return (jnp.argmax(logits, axis=-1) == labels).mean() * 100.0
