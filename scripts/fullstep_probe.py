#!/usr/bin/env python
"""Probe the full scorer step: dispatch-loop vs device-loop timing, plus
preprocessing variants.

Hypotheses from scripts/layer_profile.py (r3): the sum of isolated stages is
~30.5 ms but the bench's dispatch-loop step is 42.5 ms — either the fused
full program is slower than its parts, or each dispatch through the tunnel
costs ~10 ms of non-overlapped host/RPC time. A ``lax.fori_loop`` over the
WHOLE step (chained so iteration i+1 depends on i's input transform, not on
its output) separates the two: it executes the identical program N times
device-side with ONE dispatch.

Also times a normalize-before-crop oversample variant (normalize runs on the
64 scale-size frames — 5.8x fewer pixels than the 640 crops, crops then slice
bf16) against the current crop-then-normalize.
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

TICKS = 64
CROPS = 10
B = TICKS * CROPS


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.data.transforms import (device_oversample,
                                                      fill_fix_offset,
                                                      preprocess_frames)
    from action_detection_tpu.models import SSN, jitted_init
    from action_detection_tpu.models.backbones import get_backbone

    print(f"devices: {jax.devices()}", flush=True)
    K = 20
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    t0 = time.time()
    frames0 = jnp.zeros((1, 9, 224, 224, 3), jnp.float32)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)}, frames0,
                            jnp.ones((1, 2)), train=False)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    from action_detection_tpu.models.ssn import fuse_test_heads

    kernel, bias = fuse_test_heads(variables["params"], K, (1, 1, 1))
    rng = np.random.RandomState(0)
    host_chunk = rng.randint(0, 256, (TICKS, 256, 340, 3)).astype(np.uint8)
    dev_chunk = jax.device_put(host_chunk)
    variables = jax.device_put(variables)
    kernel = jax.device_put(kernel)
    bias = jax.device_put(bias)

    def features(variables, x):
        return model.apply(variables, x, method=SSN.features)

    def step_current(variables, kernel, bias, frames_u8):
        crops = device_oversample(frames_u8, 224, "RGB")
        x = preprocess_frames(crops, spec, "RGB", 1)
        feats = features(variables, x)
        feats = feats.reshape(CROPS, TICKS, -1).mean(axis=0)
        return jnp.matmul(feats, kernel,
                          precision=jax.lax.Precision.HIGHEST) + bias

    def step_norm_first(variables, kernel, bias, frames_u8):
        # normalize/BGR on the 64 scale-size frames, THEN cut bf16 crops
        xs = preprocess_frames(frames_u8, spec, "RGB", 1, dtype=jnp.bfloat16)
        Hs, Ws = xs.shape[1], xs.shape[2]
        groups = []
        for o_w, o_h in fill_fix_offset(False, Ws, Hs, 224, 224):
            crop = xs[:, o_h:o_h + 224, o_w:o_w + 224, :]
            groups.extend((crop, crop[:, :, ::-1, :]))
        x = jnp.stack(groups, 0).reshape((-1, 224, 224, xs.shape[3]))
        feats = features(variables, x)
        feats = feats.reshape(CROPS, TICKS, -1).mean(axis=0)
        return jnp.matmul(feats, kernel,
                          precision=jax.lax.Precision.HIGHEST) + bias

    def time_dispatch_loop(fn, n=20):
        out = fn(variables, kernel, bias, dev_chunk)
        float(out[0, 0])                     # compile + settle
        for _ in range(3):
            fn(variables, kernel, bias, dev_chunk)
        float(fn(variables, kernel, bias, dev_chunk)[0, 0])
        t0 = time.time()
        for _ in range(n):
            out = fn(variables, kernel, bias, dev_chunk)
        float(out[0, 0])
        return (time.time() - t0) / n * 1e3

    def time_device_loop(fn, n=20):
        def looped(variables, kernel, bias, frames_u8):
            def body(i, acc):
                # vary the input so the loop body can't be hoisted; uint8
                # add wraps, cost is negligible vs the step
                out = fn(variables, kernel, bias,
                         frames_u8 + i.astype(jnp.uint8))
                return acc + out[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(looped)
        t0 = time.time()
        float(jf(variables, kernel, bias, dev_chunk))
        print(f"  (loop compile+first: {time.time() - t0:.1f}s)", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jf(variables, kernel, bias, dev_chunk))
            best = min(best, time.time() - t0)
        return best / n * 1e3

    for name, fn in (("current", jax.jit(step_current)),
                     ("norm-first", jax.jit(step_norm_first))):
        ms_d = time_dispatch_loop(fn)
        print(f"{name:12s} dispatch-loop: {ms_d:7.2f} ms/step "
              f"({B / ms_d * 1e3:7.0f} img/s)", flush=True)
        ms_l = time_device_loop(fn)
        print(f"{name:12s} device-loop:   {ms_l:7.2f} ms/step "
              f"({B / ms_l * 1e3:7.0f} img/s)", flush=True)

    # numerical check: the two preprocessing orders agree (bf16 rounding only)
    a = np.asarray(jax.jit(step_current)(variables, kernel, bias, dev_chunk))
    b = np.asarray(jax.jit(step_norm_first)(variables, kernel, bias, dev_chunk))
    print("norm-first max |delta|:", float(np.abs(a - b).max()), flush=True)


if __name__ == "__main__":
    main()
