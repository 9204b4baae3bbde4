"""Every family the reference trains has a working jitted train step.

The reference's trainer accepts --arch BNInception/InceptionV3 and
--modality RGB/Flow (/root/reference/ssn_train.py:33-36; the Flow input
surgery at /root/reference/ssn_models.py:318-343 widens conv1 to
2*new_length channels). bench.py's per-family training arms
(bench_train_family) build exactly these steps at the recipe batch on the
TPU; these tests pin the same construction at CI-affordable shapes (B=1
video, 96^2 frames, real backbones) so a shape/normalization regression in
a non-headline family surfaces in the suite instead of blanking a
BENCH row. BNInception RGB is covered end-to-end elsewhere
(test_trainer.py, test_train_eval_loop.py); the two arms here are the ones
nothing else exercises.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from action_detection_tpu.config import SamplingConfig
from action_detection_tpu.models import SSN
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.train import (create_train_state, make_optimizer,
                                        make_train_step)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("arch,modality",
                         [("InceptionV3", "RGB"), ("BNInception", "Flow")])
def test_train_step_runs_for_family(arch, modality):
    rng = np.random.RandomState(0)
    sampling = SamplingConfig()
    _, _, tspec = get_backbone(arch, modality, dtype=jnp.bfloat16)
    B, P, S, Himg = 1, sampling.prop_per_video, 9, 96
    model = SSN(num_class=20, base_model=arch, modality=modality,
                dropout=0.8, dtype=jnp.bfloat16)
    C = 3 if modality == "RGB" else 2 * model.resolved_new_length
    batch = {
        "frames": rng.randint(0, 256, size=(B * P, S, Himg, Himg, C),
                              dtype=np.uint8),
        "scaling": rng.rand(B * P, 2).astype(np.float32),
        "labels": np.tile([1] + [2] * 6 + [0], B).astype(np.int64),
        "reg_targets": rng.randn(B * P, 2).astype(np.float32),
        "prop_type": np.tile([0] + [1] * 6 + [2], B).astype(np.int64),
    }
    tx = make_optimizer(base_lr=0.001, lr_steps=[20, 40],
                        steps_per_epoch=125, iter_size=1)
    state = create_train_state(model, tx, batch, tspec, modality=modality)
    step = make_train_step(model, tx, sampling, tspec, modality=modality,
                           donate=True)
    state, m = step(state, jax.device_put(batch), jax.random.PRNGKey(0))
    loss0 = float(m["loss"])
    assert np.isfinite(loss0)
    # a second step on the same batch must also run (donated buffers) and
    # move the loss — the optimizer actually updated the params
    state, m = step(state, jax.device_put(batch), jax.random.PRNGKey(0))
    loss1 = float(m["loss"])
    assert np.isfinite(loss1)
    assert loss1 != loss0
