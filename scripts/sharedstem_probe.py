#!/usr/bin/env python
"""Probe: shared-stem 10-crop scoring vs the shipped per-crop hybrid step.

The 10 test crops of one frame overlap ~2.9x in pixels; the shared-stem path
(bninception_int8_e2e_features_sharedstem) runs the bf16 stem once per
frame+flip (128 stems of 256x340) instead of once per crop (640 stems of
224^2) and slices the crop windows on the stride-8 trunk-input grid. The
stem is ~36% of the isolated bf16 step (layer_profile), so the expected win
is several ms of the 32.8 ms production step.

Times the REAL scorer program (ProposalScorer._score_chunk_impl) for both
paths via a device-side fori_loop ending in a host scalar fetch (DESIGN.md
"measurement methodology"), and reports the two paths' fused-score agreement
on the same chunk.

Usage: python scripts/sharedstem_probe.py [--iters N]
"""

import argparse
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

TICKS = 64
CROPS = 10
B = TICKS * CROPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    N = args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.infer.scorer import ProposalScorer
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

    rng = np.random.RandomState(0)
    host_chunk = rng.randint(0, 256, (TICKS, 256, 340, 3)).astype(np.uint8)
    calib = rng.randint(0, 256, (2, 256, 340, 3)).astype(np.uint8)

    def make(shared):
        return ProposalScorer(
            model, variables["params"], variables.get("batch_stats", {}),
            spec, reg_stats=np.zeros((2, K, 2), np.float32),
            stpp_cfg=(1, 1, 1), test_crops=CROPS, chunk_frames=TICKS,
            quantize="e2e", calibration_frames=calib, device_crops=True,
            shared_stem=shared)

    t0 = time.time()
    per_crop = make(False)
    shared = make(True)
    print(f"scorers+calibration: {time.time() - t0:.1f}s", flush=True)

    dev_chunk = jax.device_put(host_chunk)

    def timed(scorer, n=N, repeats=3):
        def looped(variables, kernel, bias, quantized, frames_u8):
            def body(i, acc):
                xp = jnp.bitwise_xor(frames_u8, (i & 1).astype(jnp.uint8))
                out = scorer._score_chunk_impl(variables, kernel, bias,
                                               quantized, None, xp,
                                               n_stacks=TICKS)
                return acc + out.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(looped)
        t0 = time.time()
        float(jf(scorer._variables, scorer._kernel, scorer._bias,
                 scorer._quantized, dev_chunk))
        print(f"  (compile+first: {time.time() - t0:.1f}s)", flush=True)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(jf(scorer._variables, scorer._kernel, scorer._bias,
                     scorer._quantized, dev_chunk))
            best = min(best, time.time() - t0)
        return best / n * 1e3

    # agreement of the two paths' fused chunk scores (what feeds STPP)
    s_ref = np.asarray(per_crop._score_chunk(dev_chunk, n_stacks=TICKS),
                       np.float64)
    s_new = np.asarray(shared._score_chunk(dev_chunk, n_stacks=TICKS),
                       np.float64)
    cos = float(np.sum(s_ref * s_new) /
                (np.linalg.norm(s_ref) * np.linalg.norm(s_new) + 1e-12))
    rel = float(np.linalg.norm(s_new - s_ref) /
                (np.linalg.norm(s_ref) + 1e-12))
    print(f"fused-score agreement: cosine {cos:.6f}  rel {rel:.4f}",
          flush=True)

    ms_ref = timed(per_crop)
    print(f"per-crop hybrid (shipped): {ms_ref:7.2f} ms/step "
          f"({B / ms_ref * 1e3:8.0f} img/s)", flush=True)
    ms_new = timed(shared)
    print(f"shared-stem:               {ms_new:7.2f} ms/step "
          f"({B / ms_new * 1e3:8.0f} img/s)", flush=True)
    print(f"speedup: {ms_ref / ms_new:.3f}x", flush=True)


if __name__ == "__main__":
    main()
