#!/usr/bin/env python
"""Inference device-path sweep: chunk size x {blocking, pipelined} x {bf16, int8}.

Round-1 chose 64-tick (640-image) steps from a sweep measured in a process
poisoned by embedded-constant transfers (see DESIGN.md "embedded-constant
discovery"); this re-runs the sweep on the clean path and additionally
measures *pipelined* throughput — the real scorer never blocks per chunk
(score_video dispatches all chunks and blocks once at the pool), so
steady-state throughput overlaps the host->device ship with compute.

Usage (real TPU): python scripts/infer_sweep.py [--ticks 32 64 128] [--int8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CROPS = 10
SCALE_W, SCALE_H = 340, 256
PROPOSALS = 128


def measure(scorer, host_chunk, ticks, scaling, n_ticks, steps=30, warmup=3,
            depth=1):
    import jax
    import jax.numpy as jnp
    import numpy as np

    num_frames = jnp.asarray(n_ticks, jnp.int32)

    def step():
        scores = scorer._score_chunk(
            jax.device_put(host_chunk, scorer.device), n_stacks=n_ticks)
        return scorer._pool(scores, ticks, scaling, num_frames)

    def hard_sync(result):
        # axon block_until_ready does not await remote execution; host fetch does
        return float(result[0][0, 0])

    t0 = time.time()
    hard_sync(step())
    compile_s = time.time() - t0
    for _ in range(warmup):
        step()
    hard_sync(step())

    if depth == 1:
        # per-step hard sync: latency incl. one fetch round-trip per step
        times = []
        for _ in range(steps):
            t0 = time.time()
            hard_sync(step())
            times.append(time.time() - t0)
        med = float(np.median(times))
        return med, compile_s
    # pipelined: keep `depth` steps in flight, hard-sync the oldest
    from collections import deque

    pending = deque()
    t0 = time.time()
    for _ in range(steps):
        pending.append(step())
        while len(pending) >= depth:
            hard_sync(pending.popleft())
    while pending:
        hard_sync(pending.popleft())
    return (time.time() - t0) / steps, compile_s


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, nargs="+", default=[32, 64, 128])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--int8", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN, jitted_init
    from action_detection_tpu.models.backbones import get_backbone

    K = 20
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    print(f"devices: {jax.devices()}", flush=True)
    frames0 = jnp.zeros((1, 9, spec.input_size, spec.input_size, 3), jnp.float32)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)}, frames0,
                            jnp.ones((1, 2)), train=False)
    reg_stats = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)

    rng = np.random.RandomState(0)
    quant_modes = [False, True] if args.int8 else [False]
    for quantize in quant_modes:
        calib = None
        if quantize:
            calib = rng.randint(0, 256, size=(16, spec.input_size,
                                              spec.input_size, 3), dtype=np.uint8)
        scorer = ProposalScorer(model, variables["params"],
                                variables.get("batch_stats"), spec,
                                reg_stats=reg_stats, num_class=K,
                                test_crops=CROPS, chunk_frames=max(args.ticks),
                                device_crops=True, quantize=quantize,
                                calibration_frames=calib)
        for n_ticks in args.ticks:
            host_chunk = rng.randint(
                0, 256, size=(n_ticks, SCALE_H, SCALE_W, 3), dtype=np.uint8)
            ticks = jax.device_put(np.stack([
                np.sort(rng.randint(0, n_ticks + 1, size=4))
                for _ in range(PROPOSALS)]).astype(np.int64))
            scaling = jax.device_put(rng.rand(PROPOSALS, 2).astype(np.float32))
            n_img = n_ticks * CROPS
            for depth in (1, args.depth):
                med, compile_s = measure(scorer, host_chunk, ticks, scaling,
                                         n_ticks, steps=args.steps, depth=depth)
                tag = "int8" if quantize else "bf16"
                print(f"{tag} ticks={n_ticks:4d} depth={depth} "
                      f"{med * 1e3:7.2f} ms/step  "
                      f"{n_img / med:9.0f} img/s  (compile {compile_s:.0f}s)",
                      flush=True)


if __name__ == "__main__":
    main()
