#!/usr/bin/env python
"""Per-stage roofline profile of the BNInception scorer step on one TPU chip.

Times each stage (stem convs, every inception module, pool+FC, preprocessing)
in isolation at the real inference shapes (640-image step), each wrapped in a
``lax.fori_loop`` so one device dispatch amortizes N invocations — through the
axon tunnel a per-call Python loop would time dispatch, not compute. Every
timed region ends in a host scalar fetch (the only reliable sync here, see
DESIGN.md "measurement methodology").

Prints a table: stage, ms/step, GFLOPs/step, TFLOP/s, % of bf16 peak
(v5e ~197 TFLOP/s; the measured matmul control tops at ~108).

Usage: python scripts/layer_profile.py [--int8] [--iters N]
"""

import argparse
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

BATCH = 640          # 64 ticks x 10 crops
PEAK_TFLOPS = 197.0  # v5e bf16 peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=BATCH)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from action_detection_tpu.models.backbones.bn_inception import (
        _INCEPTION_CFG, InceptionModule, conv_bn, _max_pool)

    N = args.iters
    B = args.batch
    print(f"devices: {jax.devices()}  batch={B} iters={N}", flush=True)

    def timed(fn, params, x, n=N, repeats=3):
        """ms per invocation of fn(params, x), fori_loop-amortized."""
        def looped(params, x):
            def body(i, acc):
                out = fn(params, x * (1.0 + i.astype(x.dtype) * 1e-6))
                return acc + out.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(looped)
        float(jf(params, x))                      # compile + first run
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(jf(params, x))
            best = min(best, time.time() - t0)
        return best / n * 1e3

    results = []

    def record(name, ms, gflops):
        tflops = gflops / ms if ms > 0 else 0.0   # GFLOP / ms == TFLOP/s
        results.append((name, ms, gflops, tflops))
        print(f"{name:24s} {ms:8.3f} ms  {gflops:8.1f} GF  "
              f"{tflops:6.1f} TF/s  {100 * tflops / PEAK_TFLOPS:5.1f}%",
              flush=True)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def conv_flops(hw, cin, cout, k, n=B):
        return 2.0 * n * hw * hw * cin * cout * k * k / 1e9

    # ---- stage 1: stem ----
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = conv_bn(x, 64, (7, 7), "conv1", stride=2, pad=3,
                        dtype=jnp.bfloat16)
            x = _max_pool(x, 3, 2, ceil=True)
            x = conv_bn(x, 64, (1, 1), "conv2r", dtype=jnp.bfloat16)
            x = conv_bn(x, 192, (3, 3), "conv2", pad=1, dtype=jnp.bfloat16)
            return _max_pool(x, 3, 2, ceil=True)

    stem = Stem()
    x0 = jnp.asarray(rng.randn(B, 224, 224, 3), jnp.bfloat16)
    # jitted init: one remote compile per module, not per op (CLAUDE.md)
    v = jax.jit(stem.init)(key, x0)
    ms = timed(lambda p, x: stem.apply(p, x), v, x0)
    fl = (conv_flops(112, 3, 64, 7) + conv_flops(56, 64, 64, 1)
          + conv_flops(56, 64, 192, 3))
    record("stem(c1+pool+c2)", ms, fl)

    # ---- stage 2: each inception module at its true shape ----
    shapes = {  # input (hw, cin) per module at 224^2 input
        "inception_3a": (28, 192), "inception_3b": (28, 256),
        "inception_3c": (28, 320), "inception_4a": (14, 576),
        "inception_4b": (14, 576), "inception_4c": (14, 576),
        "inception_4d": (14, 608), "inception_4e": (14, 608),
        "inception_5a": (7, 1056), "inception_5b": (7, 1024),
    }
    for cfg in _INCEPTION_CFG:
        (name, c1, c3r, c3, cd3r, cd31, cd32, cproj, pool, stride) = cfg
        hw, cin = shapes[name]
        mod = InceptionModule(name_prefix=name, c1x1=c1, c3r=c3r, c3=c3,
                              cd3r=cd3r, cd31=cd31, cd32=cd32, cproj=cproj,
                              pool=pool, stride=stride, dtype=jnp.bfloat16)
        xi = jnp.asarray(rng.randn(B, hw, hw, cin), jnp.bfloat16)
        vi = jax.jit(mod.init)(key, xi)
        ms = timed(lambda p, x, m=mod: m.apply(p, x), vi, xi)
        hw_out = hw // stride
        fl = conv_flops(hw, cin, c3r, 1) + conv_flops(hw_out, c3r, c3, 3) \
            + conv_flops(hw, cin, cd3r, 1) + conv_flops(hw, cd3r, cd31, 3) \
            + conv_flops(hw_out, cd31, cd32, 3)
        if c1 is not None:
            fl += conv_flops(hw, cin, c1, 1)
        if cproj is not None:
            fl += conv_flops(hw, cin, cproj, 1)
        record(name, ms, fl)

    # ---- stage 3: global pool + fused FC (61-col head, K=20) ----
    D = 61

    def pool_fc(params, x):
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        feats = feats.reshape(10, B // 10, -1).mean(axis=0)
        return jnp.matmul(feats, params["k"],
                          precision=jax.lax.Precision.HIGHEST) + params["b"]

    x5 = jnp.asarray(rng.randn(B, 7, 7, 1024), jnp.bfloat16)
    pfc = {"k": jnp.asarray(rng.randn(1024, D), jnp.float32),
           "b": jnp.zeros(D, jnp.float32)}
    ms = timed(pool_fc, pfc, x5)
    record("gap+crop-mean+FC", ms, 2.0 * (B // 10) * 1024 * D / 1e9)

    # ---- stage 4: device oversample + normalize (uint8 -> crops) ----
    from action_detection_tpu.data.transforms import (device_oversample,
                                                      preprocess_frames)
    from action_detection_tpu.models.backbones import get_backbone

    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    xu = jnp.asarray(rng.randint(0, 256, (B // 10, 256, 340, 3)), jnp.float32)

    def prep(params, x):
        u8 = x.astype(jnp.uint8)
        crops = device_oversample(u8, 224, "RGB")
        return preprocess_frames(crops, spec, "RGB", 1)

    ms = timed(prep, {}, xu)
    record("oversample+normalize", ms, 0.0)

    total_ms = sum(r[1] for r in results)
    total_fl = sum(r[2] for r in results)
    print(f"{'SUM OF STAGES':24s} {total_ms:8.3f} ms  {total_fl:8.1f} GF  "
          f"{total_fl / total_ms:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
