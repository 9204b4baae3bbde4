#!/usr/bin/env python
"""Cumulative-prefix timing of the real scorer program.

layer_profile.py times stages in ISOLATION (sum 30.5 ms); the full program
runs 43 ms — fullstep_probe.py showed that is genuine device time, not
dispatch. This script times cumulative prefixes of the exact program
(oversample+normalize -> stem -> inception 1..k -> gap/FC) so consecutive
deltas give each stage's cost IN CONTEXT, localizing where the fused program
loses the ~12 ms (layout copies at stage boundaries, lost fusions, ...).
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

TICKS = 64
CROPS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.data.transforms import (device_oversample,
                                                      preprocess_frames)
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.backbones.bn_inception import (
        _INCEPTION_CFG, InceptionModule, conv_bn, _max_pool)
    from flax import linen as nn

    print(f"devices: {jax.devices()}", flush=True)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)

    class Prefix(nn.Module):
        n_modules: int
        with_head: bool = False

        @nn.compact
        def __call__(self, frames_u8):
            crops = device_oversample(frames_u8, 224, "RGB")
            x = preprocess_frames(crops, spec, "RGB", 1)
            x = x.astype(jnp.bfloat16)
            x = conv_bn(x, 64, (7, 7), "conv1_7x7_s2", stride=2, pad=3,
                        dtype=jnp.bfloat16)
            x = _max_pool(x, 3, 2, ceil=True)
            x = conv_bn(x, 64, (1, 1), "conv2_3x3_reduce", dtype=jnp.bfloat16)
            x = conv_bn(x, 192, (3, 3), "conv2_3x3", pad=1, dtype=jnp.bfloat16)
            x = _max_pool(x, 3, 2, ceil=True)
            for cfg in _INCEPTION_CFG[:self.n_modules]:
                (name, c1, c3r, c3, cd3r, cd31, cd32, cproj, pool, stride) = cfg
                x = InceptionModule(name_prefix=name, c1x1=c1, c3r=c3r, c3=c3,
                                    cd3r=cd3r, cd31=cd31, cd32=cd32,
                                    cproj=cproj, pool=pool, stride=stride,
                                    dtype=jnp.bfloat16, name=name)(x)
            if self.with_head:
                feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
                feats = feats.reshape(CROPS, TICKS, -1).mean(axis=0)
                k = self.param("fk", nn.initializers.normal(), (1024, 61),
                               jnp.float32)
                return jnp.matmul(feats, k,
                                  precision=jax.lax.Precision.HIGHEST)
            return x

    rng = np.random.RandomState(0)
    chunk = jax.device_put(rng.randint(0, 256, (TICKS, 256, 340, 3))
                           .astype(np.uint8))

    def timed(mod, n=10):
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), chunk)

        def looped(v, frames_u8):
            def body(i, acc):
                out = mod.apply(v, frames_u8 + i.astype(jnp.uint8))
                return acc + out.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(looped)
        float(jf(v, chunk))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jf(v, chunk))
            best = min(best, time.time() - t0)
        return best / n * 1e3

    prev = 0.0
    points = [("prep+stem", Prefix(n_modules=0))]
    for k in range(1, 11):
        points.append((_INCEPTION_CFG[k - 1][0], Prefix(n_modules=k)))
    points.append(("(+gap/FC = full)", Prefix(n_modules=10, with_head=True)))

    for name, mod in points:
        ms = timed(mod)
        print(f"{name:20s} cum {ms:7.2f} ms   delta {ms - prev:6.2f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
