"""Trainer tests: optimizer group labeling, LR schedule, loss composition,
an overfit-tiny end-to-end training run, data-parallel sharding over the
8-virtual-device mesh, and checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from action_detection_tpu.config import SamplingConfig
from action_detection_tpu.data.pipeline import SyntheticFrameProvider, assemble_train_batch
from action_detection_tpu.data.ssn_dataset import SSNDataset
from action_detection_tpu.data.transforms import get_train_augmentation
from action_detection_tpu.models import SSN
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.parallel import make_mesh, shard_batch, replicate
from action_detection_tpu.train import (
    make_optimizer, label_params, step_decay_schedule, LossWeights,
    make_train_step, make_eval_step, create_train_state,
    save_checkpoint, load_checkpoint, checkpoint_name,
)
from tests.test_datasets import write_proposal_list


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    prop_file = write_proposal_list(tmp_path_factory.mktemp("d") / "p.txt")
    sampling = SamplingConfig()
    ds = SSNDataset(prop_file, sampling)
    provider = SyntheticFrameProvider(width=48, height=40)
    aug = get_train_augmentation(32, "RGB")
    model = SSN(num_class=3, base_model="TinyConv", dropout=0.0)
    _, _, spec = get_backbone("TinyConv", "RGB")
    rng = np.random.RandomState(0)
    batch = assemble_train_batch(ds, [0, 1], provider, aug, rng)
    return ds, sampling, provider, aug, model, spec, batch


def test_label_params_groups(setup):
    _, _, _, _, model, spec, batch = setup
    frames = jnp.asarray(batch["frames"][:1], jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, frames,
                           jnp.asarray(batch["scaling"][:1]), train=False)
    labels = label_params(variables["params"])
    flat = {"/".join(str(k.key) for k in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert flat["backbone/conv1_7x7_s2/kernel"] == "first_conv_weight"
    assert flat["backbone/conv1_7x7_s2/bias"] == "first_conv_bias"
    assert flat["backbone/conv2_3x3/kernel"] == "normal_weight"
    assert flat["activity_fc/kernel"] == "normal_weight"
    assert flat["activity_fc/bias"] == "normal_bias"
    assert flat["backbone/conv1_7x7_s2_bn/scale"] == "bn_frozen"
    assert flat["backbone/conv2_3x3_bn/bias"] == "bn_frozen"


def test_step_decay_schedule():
    sched = step_decay_schedule(0.1, [2, 4], steps_per_epoch=10)
    assert abs(float(sched(0)) - 0.1) < 1e-8
    assert abs(float(sched(19)) - 0.1) < 1e-8
    assert abs(float(sched(20)) - 0.01) < 1e-8
    assert abs(float(sched(40)) - 0.001) < 1e-8


def test_resume_start_epoch_offsets_lr_schedule():
    """--resume past an lr_steps boundary must start at the decayed LR
    (the reference derives LR from the ABSOLUTE epoch, ssn_train.py:391-398)."""
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3)}

    def first_update(start_epoch):
        tx = make_optimizer(base_lr=0.1, lr_steps=[2], steps_per_epoch=4,
                            weight_decay=0.0, momentum=0.0,
                            start_epoch=start_epoch)
        upd, _ = tx.update(grads, tx.init(params), params)
        return float(upd["w"][0])

    assert abs(first_update(0) + 0.1) < 1e-7       # fresh run: base lr
    assert abs(first_update(3) + 0.01) < 1e-7      # resumed past boundary


def test_clip_global_norm_excludes_frozen_bn():
    """Frozen-BN grads never reach the reference's clip_grad_norm
    (requires_grad=False, ssn_models.py:166-174) — a huge BN grad must not
    shrink the trained params' updates."""
    params = {"backbone": {"conv2_3x3": {"kernel": jnp.ones(4)},
                           "conv2_3x3_bn": {"scale": jnp.ones(4)}}}
    grads = {"backbone": {"conv2_3x3": {"kernel": jnp.full(4, 0.1)},
                          "conv2_3x3_bn": {"scale": jnp.full(4, 1e3)}}}
    tx = make_optimizer(base_lr=1.0, lr_steps=[100], steps_per_epoch=1,
                        weight_decay=0.0, momentum=0.0, clip_gradient=10.0)
    upd, _ = tx.update(grads, tx.init(params), params)
    # conv grad norm 0.2 << clip 10 -> update = -lr * grad exactly
    np.testing.assert_allclose(
        np.asarray(upd["backbone"]["conv2_3x3"]["kernel"]), -0.1, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upd["backbone"]["conv2_3x3_bn"]["scale"]), 0.0, atol=0)


def test_train_step_decreases_loss_and_freezes_bn(setup):
    ds, sampling, provider, aug, model, spec, batch = setup
    tx = make_optimizer(base_lr=0.001, lr_steps=[100], steps_per_epoch=1,
                        weight_decay=0.0)
    state = create_train_state(model, tx, batch, spec)
    bn_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                             state.params["backbone"]["conv1_7x7_s2_bn"])
    train_step = make_train_step(model, tx, sampling, spec, donate=False)
    dev_batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)

    losses = []
    for _ in range(12):
        state, metrics = train_step(state, dev_batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfit-tiny on the SAME batch: loss must drop
    assert losses[-1] < losses[0], losses
    # BN params never move (reference behavior: excluded from the optimizer)
    bn_after = state.params["backbone"]["conv1_7x7_s2_bn"]
    for k in ("scale", "bias"):
        np.testing.assert_array_equal(bn_before[k], np.asarray(bn_after[k]))
    # accuracy metrics exist and are percentages
    for k in ("act_acc", "fg_acc", "bg_acc"):
        assert 0.0 <= float(metrics[k]) <= 100.0
    # gradient-norm diagnostic (stand-in for ops/utils.py:20-32's grad hook)
    assert float(metrics["grad_norm"]) > 0.0
    assert np.isfinite(float(metrics["grad_norm"]))


def test_eval_step_deterministic(setup):
    ds, sampling, provider, aug, model, spec, batch = setup
    tx = make_optimizer(base_lr=0.1, lr_steps=[100], steps_per_epoch=1)
    state = create_train_state(model, tx, batch, spec)
    eval_step = make_eval_step(model, sampling, spec)
    dev_batch = jax.tree.map(jnp.asarray, batch)
    m1 = eval_step(state, dev_batch)
    m2 = eval_step(state, dev_batch)
    assert float(m1["loss"]) == float(m2["loss"])


def test_data_parallel_sharded_step_matches_single_device(setup):
    """The jitted step over an 8-device mesh must produce the same loss and
    updated params as the single-device run (GSPMD all-reduce correctness)."""
    ds, sampling, provider, aug, model, spec, batch = setup
    rng = np.random.RandomState(1)
    big_batch = assemble_train_batch(ds, list(range(8)) , provider, aug, rng)

    tx = make_optimizer(base_lr=0.05, lr_steps=[100], steps_per_epoch=1)
    state = create_train_state(model, tx, big_batch, spec)
    train_step = make_train_step(model, tx, sampling, spec, donate=False)
    key = jax.random.PRNGKey(0)

    # single device
    s1, m1 = train_step(state, jax.tree.map(jnp.asarray, big_batch), key)

    # 8-device mesh: shard batch, replicate state
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = shard_batch(big_batch, mesh)
    rep_state = replicate(state, mesh)
    s8, m8 = train_step(rep_state, sharded, key)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     s1.params, s8.params)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_checkpoint_roundtrip(tmp_path, setup):
    ds, sampling, provider, aug, model, spec, batch = setup
    tx = make_optimizer(base_lr=0.1, lr_steps=[100], steps_per_epoch=1)
    state = create_train_state(model, tx, batch, spec)
    path = str(tmp_path / checkpoint_name("t", "thumos14", "TinyConv", "RGB"))
    save_checkpoint(path, state.params, ds.stats,
                    batch_stats=state.batch_stats, epoch=3, arch="TinyConv",
                    best_loss=1.5, is_best=True)
    ck = load_checkpoint(path)
    assert ck["epoch"] == 3
    assert ck["arch"] == "TinyConv"
    np.testing.assert_allclose(ck["reg_stats"], ds.stats)
    k0 = np.asarray(state.params["activity_fc"]["kernel"])
    np.testing.assert_allclose(ck["params"]["activity_fc"]["kernel"], k0)
    import os
    head, tail = os.path.split(path)
    assert os.path.exists(os.path.join(head, tail.replace("checkpoint",
                                                          "model_best")))


def test_best_copy_of_arbitrary_checkpoint_name(tmp_path):
    """is_best with a path not containing 'checkpoint' must suffix the best
    copy, not shutil-copy a file onto itself (SameFileError)."""
    import os

    path = str(tmp_path / "run1.msgpack")
    save_checkpoint(path, {"w": np.ones(2, np.float32)},
                    np.zeros((2, 2), np.float32), is_best=True)
    assert os.path.exists(str(tmp_path / "run1_model_best.msgpack"))


def test_orbax_checkpoint_roundtrip(tmp_path, setup):
    pytest.importorskip("orbax.checkpoint")
    from action_detection_tpu.train.checkpoint import (save_checkpoint_orbax,
                                                       load_checkpoint)

    ds, sampling, provider, aug, model, spec, batch = setup
    tx = make_optimizer(base_lr=0.1, lr_steps=[100], steps_per_epoch=1)
    state = create_train_state(model, tx, batch, spec)
    d = str(tmp_path / "ocp_ckpt")
    save_checkpoint_orbax(d, jax.device_get(state.params), ds.stats,
                          batch_stats=jax.device_get(state.batch_stats),
                          epoch=2, arch="TinyConv", best_loss=0.5)
    ck = load_checkpoint(d)   # directory dispatches to the orbax backend
    assert ck["epoch"] == 2 and ck["arch"] == "TinyConv"
    np.testing.assert_allclose(ck["reg_stats"], ds.stats)
    np.testing.assert_allclose(
        np.asarray(ck["params"]["activity_fc"]["kernel"]),
        np.asarray(state.params["activity_fc"]["kernel"]))


def test_remat_training_matches_no_remat(setup):
    """remat=True must give identical losses/grads (only memory differs)."""
    ds, sampling, provider, aug, model, spec, batch = setup
    model_r = SSN(num_class=3, base_model="TinyConv", dropout=0.0, remat=True)
    tx = make_optimizer(base_lr=0.001, lr_steps=[100], steps_per_epoch=1,
                        weight_decay=0.0)
    state = create_train_state(model, tx, batch, spec)
    state_r = create_train_state(model_r, tx, batch, spec)
    # same seed -> identical params
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params, state_r.params)
    assert max(jax.tree.leaves(d)) == 0.0

    step = make_train_step(model, tx, sampling, spec, donate=False)
    step_r = make_train_step(model_r, tx, sampling, spec, donate=False)
    dev_batch = jax.tree.map(jnp.asarray, batch)
    key = jax.random.PRNGKey(0)
    _, m1 = step(state, dev_batch, key)
    _, m2 = step_r(state_r, dev_batch, key)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
