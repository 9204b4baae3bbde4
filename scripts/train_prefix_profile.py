#!/usr/bin/env python
"""Cumulative-prefix timing of the BNInception TRAIN fwd+bwd (where does
the 180 ms pool-free floor go?).

scripts/train_profile_probe.py decomposed the 263 ms train step into
pools (~83 ms) vs everything else (~180 ms), and r5 closed the pool lever
(three formulations measured slower than SelectAndScatter). This probe
decomposes the REST: it times value_and_grad of cumulative prefixes of
the real backbone (device normalize -> stem -> inception 1..k) at the
1,152-image recipe batch in bf16, so consecutive deltas localize the
fwd+bwd cost per trunk stage in context (fusions and layout copies
included, exactly as the train step compiles them). The head/losses are
excluded (train_profile_probe measured fwd 82 / bwd 182 / opt 7 — the
SSN head+losses are a few ms); each prefix closes with a mean-square
scalar so gradients flow through every parameter.

Same discipline as scripts/prefix_profile.py (the inference twin):
fori_loop keeps n iterations inside one executable, the returned scalar
accumulator is fetched to the host (hard sync), input varied per
iteration to defeat CSE, best of 3.

Usage (real TPU, default env): python scripts/train_prefix_profile.py
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

N = 1152          # 16 videos x 8 props x 9 segs, the reference recipe batch


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from action_detection_tpu.data.transforms import preprocess_frames
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.backbones.bn_inception import (
        _INCEPTION_CFG, InceptionModule, conv_bn, _max_pool)

    print(f"devices: {jax.devices()}", flush=True)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)

    class Prefix(nn.Module):
        n_modules: int
        stem_stage: int = 5   # 1=+conv1 2=+pool1 3=+conv2(r+3x3) 4=+pool2

        @nn.compact
        def __call__(self, frames_u8):
            x = preprocess_frames(frames_u8, spec, "RGB", 1)
            x = x.astype(jnp.bfloat16)
            if self.stem_stage < 1:
                return (x.astype(jnp.float32) ** 2).mean()
            x = conv_bn(x, 64, (7, 7), "conv1_7x7_s2", stride=2, pad=3,
                        train_bn=True, dtype=jnp.bfloat16)
            if self.stem_stage < 2:
                return (x.astype(jnp.float32) ** 2).mean()
            x = _max_pool(x, 3, 2, ceil=True)
            if self.stem_stage < 3:
                return (x.astype(jnp.float32) ** 2).mean()
            x = conv_bn(x, 64, (1, 1), "conv2_3x3_reduce", train_bn=True,
                        dtype=jnp.bfloat16)
            x = conv_bn(x, 192, (3, 3), "conv2_3x3", pad=1, train_bn=True,
                        dtype=jnp.bfloat16)
            if self.stem_stage < 4:
                return (x.astype(jnp.float32) ** 2).mean()
            x = _max_pool(x, 3, 2, ceil=True)
            for cfg in _INCEPTION_CFG[:self.n_modules]:
                (name, c1, c3r, c3, cd3r, cd31, cd32, cproj, pool,
                 stride) = cfg
                x = InceptionModule(name_prefix=name, c1x1=c1, c3r=c3r,
                                    c3=c3, cd3r=cd3r, cd31=cd31, cd32=cd32,
                                    cproj=cproj, pool=pool, stride=stride,
                                    dtype=jnp.bfloat16,
                                    name=name)(x, train_bn=True)
            return (x.astype(jnp.float32) ** 2).mean()

    rng = np.random.RandomState(0)
    chunk = jax.device_put(
        rng.randint(0, 256, (N, 224, 224, 3)).astype(np.uint8))

    def timed(mod, n=5):
        t0 = time.time()
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), chunk)
        jax.tree_util.tree_leaves(v)[0].block_until_ready()
        init_s = time.time() - t0

        def fwd_bwd(params, mutable, frames_u8):
            def loss_fn(p):
                out, new_mut = mod.apply(
                    {"params": p, **mutable}, frames_u8,
                    mutable=["batch_stats"])
                return out
            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss + jax.tree_util.tree_leaves(grads)[0].astype(
                jnp.float32).ravel()[0]

        def looped(v, frames_u8):
            params = v["params"]
            mutable = {k: val for k, val in v.items() if k != "params"}

            def body(i, acc):
                return acc + fwd_bwd(params, mutable,
                                     frames_u8 + i.astype(jnp.uint8))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(looped)
        t0 = time.time()
        float(jf(v, chunk))
        print(f"    [init {init_s:.0f}s  compile+first {time.time() - t0:.0f}s]",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jf(v, chunk))
            best = min(best, time.time() - t0)
        return best / n * 1e3

    # compile points keep remote-compile wall time bounded; deltas are
    # per stage GROUP (the per-module split inside a group follows the
    # inference profile's proportions). --stem drills into the stem group
    # (the largest delta of the default run) instead.
    if "--stem" in sys.argv[1:]:
        # (a normalize-only point has no params to grad; its elementwise
        # cost folds into the first delta)
        points = [("norm+conv1", 0, 1), ("+pool1", 0, 2),
                  ("+conv2(r+3x3)", 0, 3), ("+pool2", 0, 4)]
    else:
        points = [("prep+stem", 0, 5), ("3a..3b", 2, 5), ("3c(s2)..4b", 5, 5),
                  ("4c..4e(s2)", 8, 5), ("5a..5b", 10, 5)]
    prev = 0.0
    for name, k, ss in points:
        ms = timed(Prefix(n_modules=k, stem_stage=ss))
        print(f"{name:14s} cum {ms:7.1f} ms   delta {ms - prev:6.1f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
