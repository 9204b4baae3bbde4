"""Loss tests: OHEM hinge (values + gradient routing), class-wise smooth-L1,
activity CE — against loop oracles of /root/reference/ops/ssn_ops.py:173-258."""

import numpy as np
import jax
import jax.numpy as jnp

from action_detection_tpu.ops.losses import (
    ohem_hinge_loss, completeness_loss, classwise_regression_loss,
    activity_cross_entropy, accuracy,
)


def oracle_ohem(pred, labels, is_positive, ohem_ratio, group_size):
    """Loop oracle: per-sample hinge, sort per group, keep top ratio."""
    n = pred.shape[0]
    losses = np.zeros(n)
    for i in range(n):
        losses[i] = max(0.0, 1.0 - is_positive * pred[i, labels[i] - 1])
    losses = losses.reshape(-1, group_size)
    keep_num = int(group_size * ohem_ratio)
    total = 0.0
    for g in range(losses.shape[0]):
        total += np.sort(losses[g])[::-1][:keep_num].sum()
    return total


def test_ohem_hinge_matches_oracle():
    rng = np.random.RandomState(0)
    for is_pos in (1, -1):
        for ratio, gsize in ((1.0, 7), (0.17, 6), (0.5, 4)):
            n_group = 5
            pred = rng.randn(n_group * gsize, 9).astype(np.float32)
            labels = rng.randint(1, 10, size=n_group * gsize)
            got = ohem_hinge_loss(jnp.asarray(pred), jnp.asarray(labels),
                                  is_pos, ratio, gsize)
            want = oracle_ohem(pred, labels, is_pos, ratio, gsize)
            assert abs(float(got) - want) < 1e-4


def test_ohem_gradient_routing():
    """Gradients flow only through kept, margin-violating samples, with slope
    -is_positive on the label column (reference backward, ssn_ops.py:203-213)."""
    pred = jnp.asarray([
        [0.5, 0.0],    # hinge 0.5 (label 1, pos)
        [2.0, 0.0],    # hinge 0   -> no grad
        [-1.0, 0.0],   # hinge 2.0 (hardest)
        [0.9, 0.0],    # hinge 0.1
    ])
    labels = jnp.asarray([1, 1, 1, 1])
    # one group of 4, keep top 2 -> rows 2 and 0 kept
    grad = jax.grad(lambda p: ohem_hinge_loss(p, labels, 1, 0.5, 4))(pred)
    expect = np.zeros((4, 2))
    expect[2, 0] = -1.0
    expect[0, 0] = -1.0
    np.testing.assert_allclose(np.asarray(grad), expect, atol=1e-6)


def test_completeness_loss_normalization():
    rng = np.random.RandomState(1)
    group, split, K = 7, 1, 4
    n_group = 3
    pred = rng.randn(n_group * group, K).astype(np.float32)
    labels = rng.randint(1, K + 1, size=n_group * group)
    got = completeness_loss(jnp.asarray(pred), jnp.asarray(labels), split, group,
                            ohem_ratio=0.17)

    pred_g = pred.reshape(n_group, group, K)
    labels_g = labels.reshape(n_group, group)
    pos = oracle_ohem(pred_g[:, :split].reshape(-1, K),
                      labels_g[:, :split].reshape(-1), 1, 1.0, split)
    neg = oracle_ohem(pred_g[:, split:].reshape(-1, K),
                      labels_g[:, split:].reshape(-1), -1, 0.17, group - split)
    pos_cnt = n_group * split
    neg_cnt = int(n_group * (group - split) * 0.17)
    want = (pos + neg) / float(pos_cnt + neg_cnt)
    assert abs(float(got) - want) < 1e-4


def test_classwise_regression_loss():
    rng = np.random.RandomState(2)
    N, K = 10, 5
    pred = rng.randn(N, K, 2).astype(np.float32)
    labels = rng.randint(1, K + 1, size=N)
    targets = rng.randn(N, 2).astype(np.float32)
    got = float(classwise_regression_loss(jnp.asarray(pred), jnp.asarray(labels),
                                          jnp.asarray(targets)))

    sel = np.stack([pred[i, labels[i] - 1] for i in range(N)])
    d = (sel - targets).ravel()
    sl1 = np.where(np.abs(d) < 1, 0.5 * d * d, np.abs(d) - 0.5).mean() * 2
    assert abs(got - sl1) < 1e-5


def test_activity_ce_and_accuracy():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0], [10.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    ce = float(activity_cross_entropy(logits, labels))
    assert ce > 0
    assert abs(float(accuracy(logits, labels)) - 200.0 / 3.0) < 1e-4
