#!/usr/bin/env python
"""Probe: int8 END-TO-END activations vs the current int8 path.

The shipped int8 path (bn_inception_int8.py) dequantizes every conv output
to bf16 and requantizes before the next conv: per conv the activation tensor
crosses HBM as bf16 (write) + bf16 (read) + int8 (write) + int8 (read) = 6
bytes/element. Keeping activations in int8 end-to-end (requantize fused into
the conv epilogue; int8 max pools; s32 avg pools; int8 concats) cuts that to
2 bytes/element. BNInception's convs run far from the int8 MXU peak, so the
step is plausibly HBM-bound — this probe measures whether the traffic cut
pays (random weights; timing only).
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

    from action_detection_tpu.data.transforms import (fill_fix_offset,
                                                      preprocess_frames)
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.backbones.bn_inception import (
        _INCEPTION_CFG, _ceil_pool_padding)
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        bninception_int8_features)

    print(f"devices: {jax.devices()}", flush=True)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    # ---- fake quantized params (timing only) ----
    def qconv(cin, cout, k):
        return {"wq": jnp.asarray(rng.randint(-127, 128, (k, k, cin, cout)),
                                  jnp.int8),
                "sw": jnp.asarray(0.01 + rng.rand(cout) * 0.01, jnp.float32),
                "bias": jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)}

    q = {"conv1_7x7_s2": qconv(3, 64, 7), "conv2_3x3_reduce": qconv(64, 64, 1),
         "conv2_3x3": qconv(64, 192, 3)}
    cin = 192
    for (name, c1, c3r, c3, cd3r, cd31, cd32, cproj, pool, stride) in _INCEPTION_CFG:
        if c1 is not None:
            q[f"{name}_1x1"] = qconv(cin, c1, 1)
        q[f"{name}_3x3_reduce"] = qconv(cin, c3r, 1)
        q[f"{name}_3x3"] = qconv(c3r, c3, 3)
        q[f"{name}_double_3x3_reduce"] = qconv(cin, cd3r, 1)
        q[f"{name}_double_3x3_1"] = qconv(cd3r, cd31, 3)
        q[f"{name}_double_3x3_2"] = qconv(cd31, cd32, 3)
        if stride == 1:
            q[f"{name}_pool_proj"] = qconv(cin, cproj, 1)
            cin = c1 + c3 + cd32 + cproj
        else:
            cin = c3 + cd32 + cin
    scales = {name: jnp.asarray(1.0, jnp.float32) for name in q}

    # ---- int8-e2e forward: activations stay int8 between convs ----
    def conv_i8(xq, layer, sx, s_out, stride=1, pad=0):
        y = jax.lax.conv_general_dilated(
            xq, layer["wq"], (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (sx * layer["sw"] / s_out) \
            + layer["bias"] / s_out
        return jnp.clip(jnp.round(jnp.maximum(out, 0.0)), 0, 127) \
            .astype(jnp.int8)

    def max_pool_i8(x, k, stride, ceil=False, pad=0):
        if ceil:
            padding = [(0, 0),
                       _ceil_pool_padding(x.shape[1], k, stride),
                       _ceil_pool_padding(x.shape[2], k, stride), (0, 0)]
        else:
            padding = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
        return jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                                     (1, k, k, 1), (1, stride, stride, 1),
                                     padding)

    def avg_pool_i8(x, k, stride, pad):
        s = jax.lax.reduce_window(x.astype(jnp.int32), jnp.int32(0),
                                  jax.lax.add, (1, k, k, 1),
                                  (1, stride, stride, 1),
                                  [(0, 0), (pad, pad), (pad, pad), (0, 0)])
        return jnp.clip(jnp.round(s.astype(jnp.float32) / (k * k)),
                        -128, 127).astype(jnp.int8)

    def features_i8e2e(q, scales, x_u8_norm):
        # input: normalized frames, scale 1.0 (pixel-integer domain)
        xq = jnp.clip(jnp.round(x_u8_norm), -128, 127).astype(jnp.int8)
        s = scales
        x = conv_i8(xq, q["conv1_7x7_s2"], 1.0, s["conv1_7x7_s2"], 2, 3)
        x = max_pool_i8(x, 3, 2, ceil=True)
        x = conv_i8(x, q["conv2_3x3_reduce"], s["conv1_7x7_s2"],
                    s["conv2_3x3_reduce"])
        x = conv_i8(x, q["conv2_3x3"], s["conv2_3x3_reduce"], s["conv2_3x3"],
                    pad=1)
        x = max_pool_i8(x, 3, 2, ceil=True)
        sx = s["conv2_3x3"]
        for (name, c1, *_r, pool, stride) in [
                (c[0],) + tuple(c[1:]) for c in _INCEPTION_CFG]:
            # one shared output scale per module keeps the concat pure int8
            so = s[f"{name}_3x3"]
            branches = []
            if c1 is not None:
                branches.append(conv_i8(x, q[f"{name}_1x1"], sx, so))
            b3 = conv_i8(x, q[f"{name}_3x3_reduce"], sx,
                         s[f"{name}_3x3_reduce"])
            b3 = conv_i8(b3, q[f"{name}_3x3"], s[f"{name}_3x3_reduce"], so,
                         stride, 1)
            branches.append(b3)
            bd = conv_i8(x, q[f"{name}_double_3x3_reduce"], sx,
                         s[f"{name}_double_3x3_reduce"])
            bd = conv_i8(bd, q[f"{name}_double_3x3_1"],
                         s[f"{name}_double_3x3_reduce"],
                         s[f"{name}_double_3x3_1"], pad=1)
            bd = conv_i8(bd, q[f"{name}_double_3x3_2"],
                         s[f"{name}_double_3x3_1"], so, stride, 1)
            branches.append(bd)
            if stride == 1:
                bp = (avg_pool_i8(x, 3, 1, 1) if pool == "avg"
                      else max_pool_i8(x, 3, 1, pad=1))
                branches.append(conv_i8(bp, q[f"{name}_pool_proj"], sx, so))
            else:
                # passthrough branch: requantize sx -> so (elementwise)
                pt = max_pool_i8(x, 3, 2, ceil=True)
                pt = jnp.clip(jnp.round(pt.astype(jnp.float32) * (sx / so)),
                              -128, 127).astype(jnp.int8)
                branches.append(pt)
            x = jnp.concatenate(branches, axis=-1)
            sx = so
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2)) * sx

    # ---- harness: norm-first prep + features + fused FC ----
    fk = jnp.asarray(rng.randn(1024, 61) * 0.01, jnp.float32)
    fb = jnp.zeros(61, jnp.float32)

    def prep(frames_u8):
        xs = preprocess_frames(frames_u8, spec, "RGB", 1, dtype=jnp.float32)
        Hs, Ws = xs.shape[1], xs.shape[2]
        groups = []
        for o_w, o_h in fill_fix_offset(False, Ws, Hs, 224, 224):
            crop = xs[:, o_h:o_h + 224, o_w:o_w + 224, :]
            groups.extend((crop, crop[:, :, ::-1, :]))
        return jnp.stack(groups, 0).reshape((-1, 224, 224, xs.shape[3]))

    def step_e2e(q, scales, fk, fb, frames_u8):
        feats = features_i8e2e(q, scales, prep(frames_u8))
        feats = feats.reshape(CROPS, TICKS, -1).mean(axis=0)
        return jnp.matmul(feats, fk,
                          precision=jax.lax.Precision.HIGHEST) + fb

    def step_current(q, scales, fk, fb, frames_u8):
        feats = bninception_int8_features(q, prep(frames_u8),
                                          act_scales=scales)
        feats = feats.reshape(CROPS, TICKS, -1).mean(axis=0)
        return jnp.matmul(feats, fk,
                          precision=jax.lax.Precision.HIGHEST) + fb

    chunk = jax.device_put(rng.randint(0, 256, (TICKS, 256, 340, 3))
                           .astype(np.uint8))
    q = jax.device_put(q)

    def timed(fn, n=10):
        def looped(q, scales, fk, fb, frames_u8):
            def body(i, acc):
                out = fn(q, scales, fk, fb, frames_u8 + i.astype(jnp.uint8))
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(looped)
        t0 = time.time()
        float(jf(q, scales, fk, fb, chunk))
        print(f"  (compile+first: {time.time() - t0:.1f}s)", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jf(q, scales, fk, fb, chunk))
            best = min(best, time.time() - t0)
        return best / n * 1e3

    for name, fn in (("int8-current+normfirst", step_current),
                     ("int8-e2e  +normfirst", step_e2e)):
        ms = timed(fn)
        print(f"{name:24s} {ms:7.2f} ms/step "
              f"({TICKS * CROPS / ms * 1e3:7.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
