#!/usr/bin/env python
"""Does zero-padding inception concats to 128-lane multiples speed the step?

prefix_profile.py localized the fused program's losses to module boundaries
with non-128-multiple channel counts (stem out 192, 3b out 320, 3c-4d out
576/608, 4e out 1056). Zero-padding a module's output channels to the next
multiple of 128 is mathematically exact when consumers' extra input channels
see only zeros (zero activations x any weight = 0), so it is a legal layout
optimization. This probe measures the padded variant's full-step time with
random weights (values don't affect timing).
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
    from flax import linen as nn

    from action_detection_tpu.data.transforms import (device_oversample,
                                                      preprocess_frames)
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.backbones.bn_inception import (
        _INCEPTION_CFG, InceptionModule, conv_bn, _max_pool)

    print(f"devices: {jax.devices()}", flush=True)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)

    def pad128(x):
        c = x.shape[-1]
        pad = (-c) % 128
        if pad == 0:
            return x
        return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))

    class Padded(nn.Module):
        pad_points: tuple = ()   # which module outputs get padded

        @nn.compact
        def __call__(self, frames_u8):
            # norm-first preprocessing (bit-identical, fullstep_probe r3)
            xs = preprocess_frames(frames_u8, spec, "RGB", 1,
                                   dtype=jnp.bfloat16)
            from action_detection_tpu.data.transforms import fill_fix_offset

            Hs, Ws = xs.shape[1], xs.shape[2]
            groups = []
            for o_w, o_h in fill_fix_offset(False, Ws, Hs, 224, 224):
                crop = xs[:, o_h:o_h + 224, o_w:o_w + 224, :]
                groups.extend((crop, crop[:, :, ::-1, :]))
            x = jnp.stack(groups, 0).reshape((-1, 224, 224, xs.shape[3]))

            x = conv_bn(x, 64, (7, 7), "conv1_7x7_s2", stride=2, pad=3,
                        dtype=jnp.bfloat16)
            x = _max_pool(x, 3, 2, ceil=True)
            x = conv_bn(x, 64, (1, 1), "conv2_3x3_reduce", dtype=jnp.bfloat16)
            x = conv_bn(x, 192, (3, 3), "conv2_3x3", pad=1, dtype=jnp.bfloat16)
            x = _max_pool(x, 3, 2, ceil=True)
            if "stem" in self.pad_points:
                x = pad128(x)
            for cfg in _INCEPTION_CFG:
                (name, c1, c3r, c3, cd3r, cd31, cd32, cproj, pool, stride) = cfg
                x = InceptionModule(name_prefix=name, c1x1=c1, c3r=c3r, c3=c3,
                                    cd3r=cd3r, cd31=cd31, cd32=cd32,
                                    cproj=cproj, pool=pool, stride=stride,
                                    dtype=jnp.bfloat16, name=name)(x)
                if name in self.pad_points:
                    x = pad128(x)
            feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
            feats = feats.reshape(CROPS, TICKS, -1).mean(axis=0)
            k = self.param("fk", nn.initializers.normal(),
                           (feats.shape[-1], 61), jnp.float32)
            return jnp.matmul(feats, k, precision=jax.lax.Precision.HIGHEST)

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

    ALL = ("stem", "inception_3a", "inception_3b", "inception_3c",
           "inception_4a", "inception_4b", "inception_4c", "inception_4d",
           "inception_4e")
    for tag, pads in (("none (norm-first)", ()),
                      ("all boundaries", ALL),
                      ("stem+3b+3c", ("stem", "inception_3b", "inception_3c")),
                      ):
        ms = timed(Padded(pad_points=pads))
        print(f"pad={tag:20s} {ms:7.2f} ms/step "
              f"({TICKS * CROPS / ms * 1e3:7.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
