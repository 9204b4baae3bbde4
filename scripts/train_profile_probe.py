#!/usr/bin/env python
"""Where does the SSN train step spend its time, and is max-pool backward
worth a lever?

r4 refreshed training throughput (0.263 s/step at the 1,152-image recipe
batch, scripts/train_bench.py) but the step was never decomposed. This probe
times, at the same recipe shape on one chip (hard-synced host fetch):

  fwd             loss value only (train=True, batch_stats mutable)
  fwd+bwd eq-mask value_and_grad with the REJECTED eq-mask VJP opted in on
                  the stride-2 pools (set_eq_mask(True); keeps the rejected
                  number reproducible)
  full step       the deployed make_train_step (grads + 5-group SGD update,
                  default plain-AD pools)
  fwd+bwd -tpool  max-pool BACKWARD disabled in the inception trunk only
                  (stop_gradient around trunk pools; forward identical) —
                  the timing ceiling of replacing SelectAndScatter there
  fwd+bwd -pool   max-pool backward disabled everywhere incl. the two stem
                  pools (112^2 x 64 and 56^2 x 192 at batch 1152 — the
                  largest scatters in the graph; NOTE this also prunes
                  conv1's weight-grad path, so it over-counts slightly)
  fwd+bwd sas     the deployed default AD path: plain max pool everywhere,
                  whose backward lowers to XLA SelectAndScatter

Max-pool backward on TPU lowers to SelectAndScatter, which XLA cannot fuse
the way it fuses the conv backward ops. Measured r4 (this probe): the -pool
arms showed pooling backward at ~83 ms of the 263 ms step (stem pools ~73 ms
of it) — motivating the eq-mask shift-based custom_vjp (ops/pooling.py).
Measured r5 (this probe, /tmp/r5_trainprof.log): with the eq-mask VJP opted
in on the stride-2 pools, fwd+bwd = 321.9 ms vs 262.7 ms on the plain
SelectAndScatter AD path (pool-free floor 180.0 ms) — the eq-mask backward
costs ~142 ms where SelectAndScatter costs ~83 ms, so the lever was
REJECTED and the default path is plain AD. The `fwd+bwd` arm below opts the
eq-mask lever IN (so the rejected number stays reproducible); the `sas` arm
is the deployed default.

Usage (real TPU, default env): python scripts/train_profile_probe.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_videos", type=int, default=16)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cpu-check", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.backbones import bn_inception as bni
    from action_detection_tpu.train import (create_train_state,
                                            make_optimizer)
    from action_detection_tpu.train.trainer import make_loss_fn, make_train_step

    if args.cpu_check:
        args.batch_videos = 1
        args.steps = 1

    print("devices:", jax.devices(), flush=True)
    dtype = jnp.bfloat16
    sampling = SamplingConfig()
    model = SSN(num_class=20, base_model="BNInception", dropout=0.8,
                dtype=dtype)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=dtype)

    BV, P, S = args.batch_videos, sampling.prop_per_video, 9
    H = spec.input_size
    rng = np.random.RandomState(0)
    batch = {
        "frames": rng.randint(0, 256, size=(BV * P, S, H, H, 3),
                              dtype=np.uint8),
        "scaling": rng.rand(BV * P, 2).astype(np.float32),
        "labels": np.tile([1] + [2] * 6 + [0], BV).astype(np.int64),
        "reg_targets": rng.randn(BV * P, 2).astype(np.float32),
        "prop_type": np.tile([0] + [1] * 6 + [2], BV).astype(np.int64),
    }
    n_img = BV * P * S
    print(f"batch: {BV} videos x {P} props x {S} segs = {n_img} images",
          flush=True)

    tx = make_optimizer(base_lr=0.001, lr_steps=[20, 40],
                        steps_per_epoch=max(2000 // BV, 1))
    state = create_train_state(model, tx, batch, spec, modality="RGB")
    key = jax.random.PRNGKey(0)
    dev_batch = jax.device_put(batch)

    def timed(nm, fn, *fargs, n=None):
        n = n or args.steps
        out = fn(*fargs)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        for _ in range(2):
            fn(*fargs)
        float(jax.tree_util.tree_leaves(fn(*fargs))[0].sum())
        t0 = time.time()
        for _ in range(n):
            out = fn(*fargs)
        float(jax.tree_util.tree_leaves(out)[0].sum())   # hard sync
        ms = (time.time() - t0) / n * 1e3
        print(f"{nm}: {ms:8.1f} ms/step", flush=True)
        return ms

    loss_fn = make_loss_fn(model, sampling, spec, modality="RGB")

    fwd = jax.jit(lambda p, bs, b, r: loss_fn(p, bs, b, r, True)[0])
    timed("fwd            ", fwd, state.params, state.batch_stats,
          dev_batch, key)

    # eq-mask arm: opt the rejected lever IN so its number stays reproducible
    # (tracing happens at first call inside timed, so the flag must stay set
    # through the timed call)
    from action_detection_tpu.ops import pooling

    prev = pooling.set_eq_mask(True)
    try:
        fb = jax.jit(lambda p, bs, b, r: jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, b, r, True)[1])
        timed("fwd+bwd eq-mask", fb, state.params, state.batch_stats,
              dev_batch, key)
    finally:
        pooling.set_eq_mask(prev)

    step = make_train_step(model, tx, sampling, spec, donate=False)
    timed("full step      ", lambda b: step(state, b, key)[1]["loss"],
          dev_batch)

    # --- max-pool backward disabled (stop_gradient; forward identical) ---
    orig = bni._max_pool

    def patched_trunk(x, kernel, stride, ceil=False, pad=0):
        y = orig(x, kernel, stride, ceil=ceil, pad=pad)
        if x.shape[1] <= 28 * (H // 224):     # trunk spatial (28/14/7 @ 224)
            y = jax.lax.stop_gradient(y)
        return y

    def patched_all(x, kernel, stride, ceil=False, pad=0):
        return jax.lax.stop_gradient(orig(x, kernel, stride, ceil=ceil,
                                          pad=pad))

    try:
        bni._max_pool = patched_trunk
        lf_t = make_loss_fn(model, sampling, spec, modality="RGB")
        fb_t = jax.jit(lambda p, bs, b, r: jax.value_and_grad(
            lf_t, has_aux=True)(p, bs, b, r, True)[1])
        timed("fwd+bwd -tpool ", fb_t, state.params, state.batch_stats,
              dev_batch, key)

        bni._max_pool = patched_all
        lf_a = make_loss_fn(model, sampling, spec, modality="RGB")
        fb_a = jax.jit(lambda p, bs, b, r: jax.value_and_grad(
            lf_a, has_aux=True)(p, bs, b, r, True)[1])
        timed("fwd+bwd -pool  ", fb_a, state.params, state.batch_stats,
              dev_batch, key)

        # Pre-r4 AD path: backward lowers to SelectAndScatter.
        from flax import linen as nn
        from action_detection_tpu.models.backbones.bn_inception import (
            _ceil_pool_padding)

        def patched_sas(x, kernel, stride, ceil=False, pad=0):
            padding = ([_ceil_pool_padding(x.shape[1], kernel, stride),
                        _ceil_pool_padding(x.shape[2], kernel, stride)]
                       if ceil else [(pad, pad), (pad, pad)])
            return nn.max_pool(x, (kernel, kernel),
                               strides=(stride, stride), padding=padding)

        bni._max_pool = patched_sas
        lf_s = make_loss_fn(model, sampling, spec, modality="RGB")
        fb_s = jax.jit(lambda p, bs, b, r: jax.value_and_grad(
            lf_s, has_aux=True)(p, bs, b, r, True)[1])
        timed("fwd+bwd sas    ", fb_s, state.params, state.batch_stats,
              dev_batch, key)
    finally:
        bni._max_pool = orig

    if args.cpu_check:
        print("cpu-check OK", flush=True)


if __name__ == "__main__":
    main()
