#!/usr/bin/env python
"""Proposal-scoring throughput benchmark (the SSN inference hot path).

Measures images/sec through the fused BNInception scorer on one chip:
uint8 crops -> on-device normalization -> backbone (bf16) -> fused test FC ->
10-crop mean -> reorganized STPP pooling for a full chunk of frame ticks.
This is the throughput-critical path of SURVEY.md §3.2 (the reference's
ssn_test.py), with all per-proposal work folded into the measured loop.

Baseline (vs_baseline denominator): 3500 images/sec — an A100-era estimate
for torch BNInception fp16 inference at large batch (BNInception is
~2 GFLOPs/image; the reference publishes no throughput numbers, only
sec/video). The BASELINE.json north-star asks for >=5x that per chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_ERA_BASELINE_IMG_PER_SEC = 3500.0

CROPS = 10
TICKS_PER_CHUNK = 64          # frame ticks scored per device step (640-image
                              # steps measured fastest in a 320..2560 sweep)
IMAGES_PER_STEP = CROPS * TICKS_PER_CHUNK
WARMUP_STEPS = 3
MEASURE_STEPS = 50
PROPOSALS = 128               # pooled per chunk-window


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.models import SSN, fuse_test_heads
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.data.transforms import normalize_stack
    from action_detection_tpu.ops.stpp import (ReorganizedScoreLayout,
                                               StppConfig,
                                               reorganized_stpp_pool)

    K = 20
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    H = spec.input_size

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    t0 = time.time()
    frames0 = jnp.zeros((1, 9, H, H, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, frames0,
                           jnp.ones((1, 2)), train=False)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    kernel, bias = fuse_test_heads(variables["params"], K, (1, 1, 1))
    cfg = StppConfig.from_raw((1, 1, 1))
    layout = ReorganizedScoreLayout(K + 1, K, 2 * K, cfg.feat_multiplier)

    rng = np.random.RandomState(0)
    chunk_u8 = jax.device_put(
        rng.randint(0, 256, size=(IMAGES_PER_STEP, H, H, 3), dtype=np.uint8))
    ticks = jax.device_put(np.stack([
        np.sort(rng.randint(0, TICKS_PER_CHUNK + 1, size=4))
        for _ in range(PROPOSALS)]).astype(np.int32))
    scaling = jax.device_put(rng.rand(PROPOSALS, 2).astype(np.float32))

    kb = kernel.astype(jnp.bfloat16)
    bb = bias.astype(jnp.bfloat16)

    @jax.jit
    def score_and_pool(frames_u8, ticks, scaling):
        x = normalize_stack(frames_u8, spec.mean, spec.std, bgr=spec.bgr,
                            div255=spec.div255, dtype=jnp.bfloat16)
        # crop-mean on features, then the fused FC (identical by linearity,
        # measured faster than FC-then-mean)
        feats = model.apply(variables, x, method=SSN.features)
        feats = feats.reshape(CROPS, TICKS_PER_CHUNK, -1).mean(axis=0)
        scores = (feats.astype(jnp.bfloat16) @ kb + bb).astype(jnp.float32)
        return reorganized_stpp_pool(scores, ticks, scaling, layout, cfg,
                                     num_frames=TICKS_PER_CHUNK)

    t0 = time.time()
    out = score_and_pool(chunk_u8, ticks, scaling)
    jax.block_until_ready(out)
    print(f"compile+first-run: {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)

    for _ in range(WARMUP_STEPS):
        jax.block_until_ready(score_and_pool(chunk_u8, ticks, scaling))

    t0 = time.time()
    for _ in range(MEASURE_STEPS):
        out = score_and_pool(chunk_u8, ticks, scaling)
    jax.block_until_ready(out)
    dt = time.time() - t0

    images_per_sec = IMAGES_PER_STEP * MEASURE_STEPS / dt
    print(f"measured: {MEASURE_STEPS} steps x {IMAGES_PER_STEP} images "
          f"in {dt:.3f}s", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "ssn_scorer_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / A100_ERA_BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
