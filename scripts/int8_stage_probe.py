#!/usr/bin/env python
"""Stage accounting for the int8-e2e BNInception step + a bf16-stem hybrid.

Answers two questions the bf16 layer profile (scripts/layer_profile.py)
leaves open for the shipped int8-e2e path:

1. Where does the 34 ms int8-e2e step spend its time?  (input-quant+stem vs
   inception trunk, isolated fori_loop timings at the true 640-image batch)
2. Does a HYBRID — stem in bf16, quantize once at the stem output, trunk in
   int8 — beat the all-int8 step?  The stem's 7x7 C=3 conv can't fill the
   MXU in any dtype (29% MFU bf16, layer_profile), so its int8 epilogue
   round-trips may cost more than int8 saves there.

Timing discipline: every timed region is a jitted lax.fori_loop ending in a
host scalar fetch (DESIGN.md "measurement methodology").

Usage: python scripts/int8_stage_probe.py [--iters N] [--batch B]
"""

import argparse
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=640)
    args = ap.parse_args()
    N, B = args.iters, args.batch

    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.backbones.bn_inception import _INCEPTION_CFG, _max_pool
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        _avg_pool_i8_include_pad, _conv_i8_e2e, _e2e_output_maxes, _max_pool_i8,
        bninception_int8_e2e_features, fold_bn, quantize_backbone,
        quantize_backbone_e2e)

    print(f"devices: {jax.devices()}  batch={B} iters={N}", flush=True)

    backbone, _, _ = get_backbone("BNInception", "RGB")
    # jitted init: ONE remote compile instead of hundreds of per-op compiles
    # (CLAUDE.md environment rules — eager init can degrade the service)
    variables = jax.jit(backbone.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.RandomState(0)
    # normalized-crop-scale inputs (what _score_chunk feeds the backbone)
    x_cal = jnp.asarray(rng.rand(8, 224, 224, 3).astype(np.float32) * 255 - 117)
    q0 = quantize_backbone(params, batch_stats)
    maxes = jax.device_get(jax.jit(_e2e_output_maxes)(q0, x_cal))
    qe = quantize_backbone_e2e(params, batch_stats, maxes, hybrid_stem=False)
    qe_h = quantize_backbone_e2e(params, batch_stats, maxes)  # shipped hybrid
    folded = jax.tree_util.tree_map(
        jnp.asarray, fold_bn(params, batch_stats))

    x = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32) * 255 - 117)

    def timed(fn, weights, xin, n=N, repeats=3):
        def looped(weights, xin):
            def body(i, acc):
                if jnp.issubdtype(xin.dtype, jnp.integer):
                    # value-perturb without dtype promotion (int8 stays int8)
                    xp = jnp.bitwise_xor(xin, (i & 1).astype(xin.dtype))
                else:
                    xp = xin * (1.0 + i.astype(xin.dtype) * 1e-6)
                out = fn(weights, xp)
                return acc + out.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(looped)
        t0 = time.time()
        float(jf(weights, xin))
        print(f"  (compile+first: {time.time() - t0:.1f}s)", flush=True)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(jf(weights, xin))
            best = min(best, time.time() - t0)
        return best / n * 1e3

    def report(name, ms):
        print(f"{name:28s} {ms:8.3f} ms/step  "
              f"({B / ms * 1e3:8.0f} img/s)", flush=True)

    # ---- int8 stem: input quant + conv1..pool2 ----
    def i8_stem(qe, xf):
        sin = qe["__input_scale__"]
        xq = jnp.clip(jnp.round(xf / sin), -127, 127).astype(jnp.int8)
        h = _conv_i8_e2e(xq, qe["conv1_7x7_s2"], stride=2, pad=3)
        h = _max_pool_i8(h, 3, 2, ceil=True)
        h = _conv_i8_e2e(h, qe["conv2_3x3_reduce"])
        h = _conv_i8_e2e(h, qe["conv2_3x3"], pad=1)
        return _max_pool_i8(h, 3, 2, ceil=True)

    # ---- bf16 stem with folded weights ----
    def bf16_stem(folded, xf):
        def conv(h, name, stride=1, pad=0):
            f = folded[name]
            y = jax.lax.conv_general_dilated(
                h, f["kernel"].astype(jnp.bfloat16), (stride, stride),
                ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y + f["bias"].astype(jnp.bfloat16), 0)

        h = conv(xf.astype(jnp.bfloat16), "conv1_7x7_s2", stride=2, pad=3)
        h = _max_pool(h, 3, 2, ceil=True)
        h = conv(h, "conv2_3x3_reduce")
        h = conv(h, "conv2_3x3", pad=1)
        return _max_pool(h, 3, 2, ceil=True)

    # ---- int8 trunk: (B,28,28,192) int8 -> features ----
    def i8_trunk(qe, h):
        for (name, c1, _a, _b, _c, _d, _e, _f, pool, stride) in _INCEPTION_CFG:
            branches = []
            if c1 is not None:
                branches.append(_conv_i8_e2e(h, qe[f"{name}_1x1"]))
            b3 = _conv_i8_e2e(h, qe[f"{name}_3x3_reduce"])
            b3 = _conv_i8_e2e(b3, qe[f"{name}_3x3"], stride=stride, pad=1)
            branches.append(b3)
            bd = _conv_i8_e2e(h, qe[f"{name}_double_3x3_reduce"])
            bd = _conv_i8_e2e(bd, qe[f"{name}_double_3x3_1"], pad=1)
            bd = _conv_i8_e2e(bd, qe[f"{name}_double_3x3_2"], stride=stride,
                              pad=1)
            branches.append(bd)
            if stride == 1:
                bp = (_avg_pool_i8_include_pad(h, 3, 1, 1) if pool == "avg"
                      else _max_pool_i8(h, 3, 1, pad=1))
                branches.append(_conv_i8_e2e(bp, qe[f"{name}_pool_proj"]))
            else:
                branches.append(_max_pool_i8(h, 3, 2, ceil=True))
            h = jnp.concatenate(branches, axis=-1)
        return jnp.mean(h.astype(jnp.float32), axis=(1, 2)) * qe["__feat_scale__"]

    # sanity: hybrid features track the all-int8 features
    f_all = np.asarray(jax.jit(bninception_int8_e2e_features)(qe, x[:4]))
    f_hy = np.asarray(jax.jit(bninception_int8_e2e_features)(qe_h, x[:4]))
    cos = float(np.sum(f_all * f_hy) /
                (np.linalg.norm(f_all) * np.linalg.norm(f_hy) + 1e-9))
    print(f"hybrid-vs-int8 feature cosine: {cos:.5f}", flush=True)

    report("int8-e2e full (all-int8)",
           timed(bninception_int8_e2e_features, qe, x))
    report("hybrid bf16-stem (shipped)",
           timed(bninception_int8_e2e_features, qe_h, x))
    h_i8 = jax.jit(i8_stem)(qe, x)
    report("int8 stem only", timed(i8_stem, qe, x))
    report("bf16 stem only", timed(bf16_stem, folded, x))
    report("int8 trunk only", timed(i8_trunk, qe, h_i8))


if __name__ == "__main__":
    main()
