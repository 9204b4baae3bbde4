#!/usr/bin/env python
"""Is the Pallas max-pool backward faster than SelectAndScatter on chip?

The r5 adjudication left pool-backward as the largest non-matmul term of the
SSN train step: ~83 ms of 263 ms rides in XLA SelectAndScatter (stem pools
~73 ms), vs an HBM roofline of ~10 ms, and the XLA-elementwise eq-mask
reformulation measured SLOWER (ops/pooling.py). This probe adjudicates the
real fused kernel (ops/pool_bwd_pallas.py), same discipline as every lever:
bit-equality asserted BEFORE timing, hard-synced timings, one process.

Arms:
  1. correctness gate — per pool shape, small int-valued batch: Pallas dx
     must equal the SelectAndScatter AD dx EXACTLY (first-match semantics is
     a drop-in; integer values make the add order immaterial).
  2. isolated backward per BNInception pool shape at the 1,152-image recipe
     batch: SelectAndScatter vjp vs the Pallas kernel, ms + GB/s.
  3. full fwd+bwd through SSN/BNInception at the recipe batch:
     sas vs pallas mode (the number that decides adopt/reject).

Usage (real TPU, default env): python scripts/poolbwd_probe.py
CPU smoke:  ... JAX_PLATFORMS=cpu python scripts/poolbwd_probe.py --cpu-check
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1152)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cpu-check", action="store_true")
    p.add_argument("--skip-full", action="store_true",
                   help="only the isolated arms (faster turnaround)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.ops import pooling
    from action_detection_tpu.ops.pool_bwd_pallas import max_pool_bwd_pallas

    if args.cpu_check:
        args.batch, args.steps = 2, 1

    N = args.batch
    print("devices:", jax.devices(), flush=True)

    # BNInception max-pool shapes at 224^2 (ceil-mode pads (0,1)); C from the
    # module inputs the stride-2 pools actually see
    SHAPES = [
        ("stem pool1", (N, 112, 112, 64)),
        ("stem pool2", (N, 56, 56, 192)),
        ("3c pool   ", (N, 28, 28, 576)),
        ("4e pool   ", (N, 14, 14, 608)),
    ]
    K, S, PAD = (3, 3), (2, 2), ((0, 1), (0, 1))

    def sas_vjp(x, pad):
        from flax import linen as nn

        f = lambda x: nn.max_pool(x, K, strides=S, padding=list(pad))
        return jax.vjp(f, x)

    def timed(fn, *fargs, n=None):
        n = n or args.steps
        out = fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        for _ in range(2):
            fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(fn(*fargs))[0]
                          ).ravel()[0])
        t0 = time.time()
        for _ in range(n):
            out = fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return (time.time() - t0) / n * 1e3

    # --- 1. correctness gate (small, int-valued, exact; f32 rides the wide
    # kernel, bf16 the i32-packed one — int values/grads make both paths
    # bit-exact vs the SelectAndScatter AD dx) ---
    rng = np.random.RandomState(0)
    for dt in (jnp.float32, jnp.bfloat16):
        for name, (_, H, W, C) in SHAPES:
            xs = jnp.asarray(rng.randint(0, 64, size=(4, H, W, min(C, 64))
                                         ).astype(np.float32), dt)
            y, vjp = sas_vjp(xs, PAD)
            dy = jnp.asarray(rng.randint(1, 8, size=y.shape
                                         ).astype(np.float32), dt)
            dx_ref = vjp(dy)[0]
            dx_pal = max_pool_bwd_pallas(xs, y, dy, K, S, PAD)
            ok = bool(jnp.array_equal(dx_pal, dx_ref))
            print(f"correctness {dt.__name__:9} {name}: "
                  f"{'EXACT' if ok else 'MISMATCH'}", flush=True)
            if not ok:
                diff = jnp.abs(dx_pal.astype(jnp.float32)
                               - dx_ref.astype(jnp.float32))
                print(f"  max|diff|={float(diff.max()):.3g} "
                      f"n_mismatch={int((diff > 0).sum())}", flush=True)
                raise SystemExit(f"Pallas pool backward mismatch at {name}")

    # --- 2. isolated backward timings at the recipe batch ---
    for name, shape in SHAPES:
        Nn, H, W, C = shape
        x = jnp.asarray(rng.randint(0, 256, size=shape).astype(np.float32),
                        jnp.bfloat16)
        y, _ = sas_vjp(x, PAD)
        dy = jnp.ones_like(y)
        gb = (2 * x.nbytes + 2 * y.nbytes) / 1e9

        sas_fn = jax.jit(lambda x, dy: sas_vjp(x, PAD)[1](dy)[0])
        pal_fn = jax.jit(lambda x, y, dy: max_pool_bwd_pallas(
            x, y, dy, K, S, PAD))
        ms_sas = timed(sas_fn, x, dy)
        ms_pal = timed(pal_fn, x, y, dy)
        print(f"bwd {name} {str(shape):>22}: sas {ms_sas:7.2f} ms "
              f"({gb / ms_sas * 1e3:5.0f} GB/s)  pallas {ms_pal:7.2f} ms "
              f"({gb / ms_pal * 1e3:5.0f} GB/s)  {ms_sas / ms_pal:.2f}x",
              flush=True)

    if args.skip_full:
        return

    # --- 3. full fwd+bwd through SSN at the recipe shape ---
    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.models import SSN
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.train import create_train_state, make_optimizer
    from action_detection_tpu.train.trainer import make_loss_fn

    BV = max(N // 72, 1)                  # 16 videos -> 1,152 images
    sampling = SamplingConfig()
    model = SSN(num_class=20, base_model="BNInception", dropout=0.8,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    P, Simg, H = sampling.prop_per_video, 9, spec.input_size
    batch = {
        "frames": rng.randint(0, 256, size=(BV * P, Simg, H, H, 3),
                              dtype=np.uint8),
        "scaling": rng.rand(BV * P, 2).astype(np.float32),
        "labels": np.tile([1] + [2] * 6 + [0], BV).astype(np.int64),
        "reg_targets": rng.randn(BV * P, 2).astype(np.float32),
        "prop_type": np.tile([0] + [1] * 6 + [2], BV).astype(np.int64),
    }
    tx = make_optimizer(base_lr=0.001, lr_steps=[20, 40],
                        steps_per_epoch=125)
    state = create_train_state(model, tx, batch, spec, modality="RGB")
    key = jax.random.PRNGKey(0)
    dev_batch = jax.device_put(batch)

    for mode in ("sas", "pallas"):
        prev = pooling.set_pool_backward(mode)
        try:
            lf = make_loss_fn(model, sampling, spec, modality="RGB")
            fb = jax.jit(lambda p, bs, b, r: jax.value_and_grad(
                lf, has_aux=True)(p, bs, b, r, True)[1])
            ms = timed(fb, state.params, state.batch_stats, dev_batch, key)
            print(f"fwd+bwd {mode:7}: {ms:8.1f} ms/step", flush=True)
        finally:
            pooling.set_pool_backward(prev)

    if args.cpu_check:
        print("cpu-check OK", flush=True)


if __name__ == "__main__":
    main()
