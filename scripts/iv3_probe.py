#!/usr/bin/env python
"""IV3 proposal-scoring throughput: int8-e2e vs bf16, one v5e, hard-synced.

The reference's best published mAP rows use InceptionV3 at 299^2
(ssn_models.py:129-144). This measures the same 640-image step shape as
bench.py (64 ticks x 10 crops, device norm-first oversample from 341-short-
side scale frames, fused test FC + STPP pool) through the IV3 backbone.
Not part of bench.py's headline (that stays the BNInception reference
config); the numbers are recorded in DESIGN.md for the int8-e2e breadth
claim.
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

    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN, jitted_init
    from action_detection_tpu.models.backbones import get_backbone

    print(f"devices: {jax.devices()}", flush=True)
    K = 20
    model = SSN(num_class=K, base_model="InceptionV3", dropout=0.0,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("InceptionV3", "RGB", dtype=jnp.bfloat16)
    t0 = time.time()
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 9, spec.input_size, spec.input_size,
                                       3), jnp.float32),
                            jnp.ones((1, 2)), train=False)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    rng = np.random.RandomState(0)
    # scale frames: shorter side 341 (299*256//224), THUMOS-ish aspect
    H_s, W_s = spec.scale_size, int(spec.scale_size * 455 / 341)
    host_chunk = rng.randint(0, 256, (TICKS, H_s, W_s, 3), dtype=np.uint8)
    reg_stats = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)

    ticks = jax.device_put(np.stack([
        np.sort(rng.randint(0, TICKS + 1, size=4))
        for _ in range(128)]).astype(np.int64))
    scaling = jax.device_put(rng.rand(128, 2).astype(np.float32))
    num_frames = jnp.asarray(TICKS, jnp.int32)

    # measured (one v5e, hard-synced): hybrid 81.69 / all-int8 85.65 /
    # bf16 102.26 ms per step -> hybrid is the calibrate_e2e_iv3 default
    for tag, quantize in (("int8-e2e (hybrid, default)", "e2e"),
                          ("int8-e2e-allint8", "e2e"), ("bf16", False)):
        t0 = time.time()
        sc = ProposalScorer(model, variables["params"],
                            variables.get("batch_stats"), spec,
                            reg_stats=reg_stats, num_class=K,
                            test_crops=CROPS, chunk_frames=TICKS,
                            device_crops=True, quantize=quantize,
                            calibration_frames=(host_chunk[:4] if quantize
                                                else None))
        if tag == "int8-e2e-allint8":
            from action_detection_tpu.models.backbones.inception_v3_int8 \
                import calibrate_e2e_iv3

            sample = jax.jit(sc._prep_calibration)(jnp.asarray(host_chunk[:4]))
            qp = (jax.device_get(variables["params"]["backbone"]),
                  jax.device_get((variables.get("batch_stats") or {})
                                 .get("backbone", {})))
            sc._quantized = jax.device_put(
                calibrate_e2e_iv3(*qp, sample, hybrid_stem=False),
                sc.device)
        print(f"[{tag}] scorer build: {time.time() - t0:.1f}s", flush=True)
        dev = jax.device_put(host_chunk, sc.device)

        def step():
            scores = sc._score_chunk(dev, n_stacks=TICKS)
            return sc._pool(scores, ticks, scaling, num_frames)

        t0 = time.time()
        float(step()[0][0, 0])          # compile + first exec (lottery)
        print(f"[{tag}] compile+first: {time.time() - t0:.1f}s", flush=True)
        for _ in range(3):
            step()
        float(step()[0][0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = None
            for _ in range(10):
                out = step()
            float(out[0][0, 0])         # hard sync (host scalar fetch)
            best = min(best, (time.time() - t0) / 10)
        print(f"[{tag}] {best*1e3:7.2f} ms/step "
              f"({TICKS * CROPS / best:7.0f} img/s) hard-synced", flush=True)


if __name__ == "__main__":
    main()
