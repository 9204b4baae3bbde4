#!/usr/bin/env python
"""Training throughput benchmark at the reference recipe shape.

Measures the REAL jitted train step (forward + 3 losses + backward + 5-group
SGD) on one chip at the THUMOS14 recipe batch: 16 videos x 8 proposals x
9 segments = 1,152 images/step at 224^2 (reference README.md:250,
ssn_train.py:238-253). ``--iter_size`` exercises optax MultiSteps gradient
accumulation; ``--bf16`` the mixed-precision backbone; ``--remat`` backbone
activation rematerialization.

Host->device transfer of the uint8 batch is inside the measured loop.

Prints steps/sec, images/sec, and the projected 45-epoch THUMOS14 wall clock
(train set = 200 videos x10 epoch multiplier / batch 16 = 125 steps/epoch).

Usage (real TPU, default env):  python scripts/train_bench.py [--steps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_videos", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--iter_size", type=int, default=1)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--arch", default="BNInception")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.train import (create_train_state, make_optimizer,
                                            make_train_step)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    sampling = SamplingConfig()            # 8 props/video [1 fg | 6 inc | 1 bg]
    K = 20
    model = SSN(num_class=K, base_model=args.arch, dropout=0.8, dtype=dtype,
                remat=args.remat)
    _, _, spec = get_backbone(args.arch, "RGB", dtype=dtype)
    H = spec.input_size

    B, P, S = args.batch_videos, sampling.prop_per_video, 9
    n_img = B * P * S
    print(f"devices: {jax.devices()}  batch: {B} videos x {P} props x {S} segs"
          f" = {n_img} images @{H}^2  dtype={dtype.__name__}"
          f" iter_size={args.iter_size} remat={args.remat}", flush=True)

    rng = np.random.RandomState(0)
    batch = {
        "frames": rng.randint(0, 256, size=(B * P, S, H, H, 3), dtype=np.uint8),
        "scaling": rng.rand(B * P, 2).astype(np.float32),
        "labels": np.tile([1] + [2] * 6 + [0], B).astype(np.int64),
        "reg_targets": rng.randn(B * P, 2).astype(np.float32),
        "prop_type": np.tile([0] + [1] * 6 + [2], B).astype(np.int64),
    }

    # THUMOS recipe: lr 0.001, steps [20, 40], 45 epochs
    steps_per_epoch = max(2000 // B, 1)    # 200 videos x10 multiplier
    tx = make_optimizer(base_lr=0.001, lr_steps=[20, 40],
                        steps_per_epoch=steps_per_epoch,
                        iter_size=args.iter_size)
    t0 = time.time()
    state = create_train_state(model, tx, batch, spec)
    print(f"init: {time.time() - t0:.1f}s", flush=True)
    train_step = make_train_step(model, tx, sampling, spec, donate=True)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    state, metrics = train_step(state, jax.device_put(batch), key)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first-step: {time.time() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)

    for _ in range(args.warmup):
        state, metrics = train_step(state, jax.device_put(batch), key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = train_step(state, jax.device_put(batch), key)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0

    steps_per_sec = args.steps / dt
    img_per_sec = n_img * steps_per_sec
    total_steps = steps_per_epoch * 45 * args.iter_size
    wall_h = total_steps / steps_per_sec / 3600
    print(f"measured: {args.steps} steps in {dt:.2f}s -> "
          f"{steps_per_sec:.3f} steps/s, {img_per_sec:.0f} train img/s/chip "
          f"(loss={float(metrics['loss']):.4f})", flush=True)
    print(f"projected THUMOS14 45-epoch wall clock "
          f"({steps_per_epoch} steps/epoch x 45 x iter_size={args.iter_size}): "
          f"{wall_h:.2f} h on one chip", flush=True)


if __name__ == "__main__":
    main()
