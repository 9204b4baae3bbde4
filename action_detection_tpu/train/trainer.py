"""SSN trainer: jitted data-parallel train/eval steps over a device mesh.

Behavioral parity target: /root/reference/ssn_train.py (loss composition,
proposal-type subset selection, accuracy meters). Key TPU-first differences:

* Proposal subsets (activity: fg+bg, completeness: fg+incomplete, regression:
  fg) are **static slices** of the per-video proposal layout
  ``[fg | incomplete | bg]`` — no data-dependent gathers
  (the reference's dynamic ``nonzero()`` indexing at ssn_models.py:275-286).
* One jitted step; the batch is sharded over the mesh's ``data`` axis and the
  gradient all-reduce is inserted by XLA (vs DataParallel scatter/gather).
* BN stays frozen via ``use_running_average`` — no state to shut down.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import SamplingConfig
from ..data.transforms import preprocess_frames
from ..models.backbones import InputSpec
from ..ops.losses import (activity_cross_entropy, classwise_regression_loss,
                          completeness_loss, accuracy)
from ..parallel.mesh import make_mesh, replicate, shard_batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class LossWeights:
    comp: float = 0.1     # --comp_loss_weight
    reg: float = 0.1      # --reg_loss_weight
    ohem_ratio: float = 0.17


def subset_slices(sampling: SamplingConfig):
    """Static per-video row ranges for the three heads' training subsets."""
    fg = sampling.fg_per_video
    inc = sampling.incomplete_per_video
    p = sampling.prop_per_video
    return {
        "act": ((0, fg), (fg + inc, p)),   # fg rows + bg rows
        "comp": (0, fg + inc),             # fg + incomplete rows
        "reg": (0, fg),                    # fg rows
    }


def select_head_subsets(per_video: jnp.ndarray, sampling: SamplingConfig,
                        head: str) -> jnp.ndarray:
    """Slice (B, P, ...) per-video-layout arrays to a head's subset, flattened."""
    sl = subset_slices(sampling)
    if head == "act":
        (a0, a1), (b0, b1) = sl["act"]
        sub = jnp.concatenate([per_video[:, a0:a1], per_video[:, b0:b1]], axis=1)
    elif head == "comp":
        lo, hi = sl["comp"]
        sub = per_video[:, lo:hi]
    elif head == "reg":
        lo, hi = sl["reg"]
        sub = per_video[:, lo:hi]
    else:
        raise ValueError(head)
    return sub.reshape((-1,) + sub.shape[2:])


def make_loss_fn(model, sampling: SamplingConfig, input_spec: InputSpec,
                 weights: LossWeights = LossWeights(),
                 modality: str = "RGB"):
    """Build the full SSN loss over one uint8 batch (preprocessing on device)."""
    P = sampling.prop_per_video
    new_length = model.resolved_new_length

    def loss_fn(params, batch_stats, batch, dropout_rng, train: bool = True):
        frames = preprocess_frames(batch["frames"], input_spec, modality,
                                   new_length)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats is not None) else False
        out = model.apply(variables, frames, batch["scaling"], train=train,
                          rngs={"dropout": dropout_rng} if train else None,
                          mutable=mutable)
        if mutable:
            (act, comp, reg), new_vars = out
            new_stats = new_vars.get("batch_stats", batch_stats)
        else:
            act, comp, reg = out
            new_stats = batch_stats

        B = act.shape[0] // P
        labels = batch["labels"].reshape(B, P)
        act_v = act.reshape(B, P, -1)
        comp_v = comp.reshape(B, P, -1)

        act_out = select_head_subsets(act_v, sampling, "act")
        act_target = select_head_subsets(labels, sampling, "act")
        comp_out = select_head_subsets(comp_v, sampling, "comp")
        comp_target = select_head_subsets(labels, sampling, "comp")

        act_loss = activity_cross_entropy(act_out, act_target)
        comp_loss = completeness_loss(
            comp_out, comp_target,
            sample_split=sampling.fg_per_video,
            sample_group_size=sampling.fg_per_video + sampling.incomplete_per_video,
            ohem_ratio=weights.ohem_ratio)
        total = act_loss + weights.comp * comp_loss

        metrics = {"act_loss": act_loss, "comp_loss": comp_loss}
        if reg is not None:
            reg_v = reg.reshape(B, P, reg.shape[-2], 2)
            reg_out = select_head_subsets(reg_v, sampling, "reg")
            reg_target = select_head_subsets(
                batch["reg_targets"].reshape(B, P, 2), sampling, "reg")
            reg_labels = select_head_subsets(labels, sampling, "reg")
            reg_loss = classwise_regression_loss(reg_out, reg_labels, reg_target)
            total = total + weights.reg * reg_loss
            metrics["reg_loss"] = reg_loss

        # fg/bg accuracy meters exploiting the [fg..., bg...] act layout
        # (ssn_train.py:226-233): act subset rows per video are fg then bg
        n_fg = sampling.fg_per_video
        n_actsub = n_fg + sampling.bg_per_video
        act_g = act_out.reshape(B, n_actsub, -1)
        tgt_g = act_target.reshape(B, n_actsub)
        metrics["act_acc"] = accuracy(act_out, act_target)
        metrics["fg_acc"] = accuracy(act_g[:, :n_fg].reshape(-1, act_g.shape[-1]),
                                     tgt_g[:, :n_fg].reshape(-1))
        metrics["bg_acc"] = accuracy(act_g[:, n_fg:].reshape(-1, act_g.shape[-1]),
                                     tgt_g[:, n_fg:].reshape(-1))
        metrics["loss"] = total
        return total, (metrics, new_stats)

    return loss_fn


def make_train_step(model, tx, sampling: SamplingConfig, input_spec: InputSpec,
                    weights: LossWeights = LossWeights(),
                    modality: str = "RGB", donate: bool = True):
    """One SGD step, jitted; run it on batches sharded over the mesh."""
    loss_fn = make_loss_fn(model, sampling, input_spec, weights, modality)

    def train_step(state: TrainState, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, True)
        # observability stand-in for the reference's unused grad hook
        # (/root/reference/ops/utils.py:20-32): one fused reduction, ~free
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, sampling: SamplingConfig, input_spec: InputSpec,
                   weights: LossWeights = LossWeights(),
                   modality: str = "RGB"):
    loss_fn = make_loss_fn(model, sampling, input_spec, weights, modality)

    def eval_step(state: TrainState, batch):
        _, (metrics, _) = loss_fn(state.params, state.batch_stats, batch,
                                  jax.random.PRNGKey(0), False)
        return metrics

    return jax.jit(eval_step)


def create_train_state(model, tx, sample_batch, input_spec: InputSpec,
                       seed: int = 0,
                       modality: str = "RGB") -> TrainState:
    """Initialize params/batch_stats/optimizer from one host batch."""
    from ..models import jitted_init

    frames = preprocess_frames(jnp.asarray(sample_batch["frames"][:1]),
                               input_spec, modality, model.resolved_new_length)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(seed)},
                            frames, jnp.asarray(sample_batch["scaling"][:1]),
                            train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)
