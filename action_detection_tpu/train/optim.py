"""Optimizer: SGD with the reference's five parameter-group policy.

Behavioral parity target: /root/reference/ssn_models.py:203-251
(get_optim_policies) + /root/reference/ssn_train.py:391-398 (step-decay LR
scaled by per-group lr_mult, weight decay scaled by decay_mult):

  group              lr_mult  decay_mult
  first_conv_weight     1         1
  first_conv_bias       2         0
  normal_weight         1         1
  normal_bias           2         0
  bn (scale/shift)      frozen — the reference never passes BatchNorm2d
                        params to the optimizer, so they are never updated
                        regardless of bn_mode; we preserve that.

Implemented as ``optax.multi_transform`` over a path-derived label tree, with
``optax.MultiSteps`` providing ``--iter_size`` gradient accumulation.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
import optax

GROUPS = ("first_conv_weight", "first_conv_bias", "normal_weight",
          "normal_bias", "bn_frozen")

# the first convolution of each supported backbone (cross-modality finetuning
# gives it its own lr/decay multipliers): BNInception, InceptionV3, ResNet, VGG
FIRST_CONV_NAMES = ("conv1_7x7_s2", "Conv2d_1a_3x3_conv", "conv1", "features_0")


def label_params(params) -> dict:
    """Label every param leaf with its optimization group by tree path."""

    def label_one(path) -> str:
        keys = [p.key for p in path if hasattr(p, "key")]
        leaf = keys[-1] if keys else ""
        if any(k.endswith("_bn") or k == "bn" or k.startswith("bn") for k in keys[:-1]):
            return "bn_frozen"
        # first conv only at the backbone's top level ('conv1' also names
        # convs inside ResNet blocks — those are normal weights)
        layer_path = keys[:-1]
        is_first_conv = (len(layer_path) >= 1
                         and layer_path[-1] in FIRST_CONV_NAMES
                         and (len(layer_path) == 1
                              or layer_path[-2] == "backbone"))
        if leaf == "kernel":
            return "first_conv_weight" if is_first_conv else "normal_weight"
        if leaf == "bias":
            return "first_conv_bias" if is_first_conv else "normal_bias"
        # scale/bias of non-"_bn"-named normalization layers
        if leaf in ("scale", "mean", "var"):
            return "bn_frozen"
        return "normal_weight"

    return jax.tree_util.tree_map_with_path(lambda path, _: label_one(path), params)


def step_decay_schedule(base_lr: float, lr_steps: Sequence[float],
                        steps_per_epoch: int) -> Callable:
    """lr = base * 0.1^(#epoch boundaries passed) (ssn_train.py:391-398)."""
    boundaries = np.asarray(sorted(lr_steps), dtype=np.float64) * steps_per_epoch

    def schedule(count):
        import jax.numpy as jnp

        decays = jnp.sum(count >= jnp.asarray(boundaries))
        return base_lr * (0.1 ** decays)

    return schedule


def make_optimizer(base_lr: float, lr_steps: Sequence[float],
                   steps_per_epoch: int, momentum: float = 0.9,
                   weight_decay: float = 5e-4,
                   clip_gradient: Optional[float] = None,
                   iter_size: int = 1,
                   start_epoch: int = 0) -> optax.GradientTransformation:
    """The SSN training optimizer over labeled parameter groups.

    ``start_epoch`` offsets the step-decay schedule for --resume: the
    reference derives the LR from the ABSOLUTE epoch (ssn_train.py:391-398),
    so resuming at epoch 25 with lr_steps [20, 40] must start decayed
    (optax's update count alone would restart the schedule at zero).
    """
    # under MultiSteps the inner chain's count advances once per APPLIED
    # update, so express epoch boundaries in effective updates
    effective_steps = max(steps_per_epoch // max(iter_size, 1), 1)
    schedule = step_decay_schedule(base_lr, lr_steps, effective_steps)
    start_count = start_epoch * effective_steps

    def sgd_group(lr_mult: float, decay_mult: float) -> optax.GradientTransformation:
        chain = []
        if weight_decay and decay_mult:
            chain.append(optax.add_decayed_weights(weight_decay * decay_mult))
        chain.append(optax.trace(decay=momentum, nesterov=False))
        chain.append(optax.scale_by_schedule(
            lambda c: -lr_mult * schedule(c + start_count)))
        return optax.chain(*chain)

    transforms = {
        "first_conv_weight": sgd_group(1.0, 1.0),
        "first_conv_bias": sgd_group(2.0, 0.0),
        "normal_weight": sgd_group(1.0, 1.0),
        "normal_bias": sgd_group(2.0, 0.0),
        "bn_frozen": optax.set_to_zero(),
    }
    # labels derive from the real param tree at tx.init time
    tx = optax.multi_transform(transforms, label_params)
    if clip_gradient is not None:
        # frozen-BN params never reach the reference optimizer
        # (ssn_models.py:166-174 sets requires_grad=False), so its
        # clip_grad_norm global norm excludes them — zero those grads BEFORE
        # the clip here too, or the norm is systematically inflated
        def bn_mask(params):
            labels = label_params(params)
            return jax.tree_util.tree_map(lambda l: l == "bn_frozen", labels)

        tx = optax.chain(optax.masked(optax.set_to_zero(), bn_mask),
                         optax.clip_by_global_norm(clip_gradient), tx)
    if iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=iter_size)
    return tx
