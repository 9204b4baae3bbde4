#!/usr/bin/env python
"""Proposal-scoring throughput benchmark (the SSN inference hot path).

Measurements, all hard-synced (every timed region ends with a host scalar
fetch — on the axon plugin ``block_until_ready`` awaits transfers but NOT
remote execution, see DESIGN.md "measurement methodology"):

1. Headline: one step of the REAL inference program in ssn_test's DEFAULT
   configuration for BNInception — int8-e2e quantized backbone (activations
   int8 end-to-end; detection-metric delta bounded in tests/test_int8.py)
   with shared-stem 10-crop scoring (bf16 stem once per frame+flip, crop
   windows sliced on the stride-8 trunk-input grid; bounded in
   tests/test_sharedstem.py), with a device-resident input chunk: the
   device normalizes, runs the shared stem, slices the 10-crop windows,
   runs the int8 trunk, applies the fused test FC, crop-means, and pools
   proposals with reorganized STPP. Per-crop int8-e2e (--no_shared_stem)
   is reported alongside. Device-resident because on this tunneled harness the
   host->device channel collapses to ~56MB/s after the first big-program
   execution (a harness artifact, process-wide, transfers only — measured
   in DESIGN.md); on a real TPU VM the 16.7MB input ship is ~1ms over PCIe,
   fully overlapped, and the device-resident rate IS the pipeline
   throughput.
2. bf16 extra: the same step through the unquantized bf16 backbone
   (``--no_int8``), same timing discipline.
3. shipped_images_per_sec extra: the int8 step with the per-step 16.7MB
   host ship included, plus ship_MBps_pre/post reporting the observed
   channel state so the gap is attributable.
4. End-to-end extra: synthetic JPEG frame directories scored through
   ``ProposalScorer`` (decode -> rescale -> score -> pool), sec/video —
   measured per-video AND cross-video packed (--pack), so the pack
   decision is a recorded number.

5. Per-family extras (VERDICT r3 item 3): the same deployed-default step
   for the OTHER published backbone/modality families — InceptionV3 RGB
   299^2 and BNInception Flow (new_length=5, 10-channel stacks) — with
   FLOPs-derived baselines (see "baselines" below and BASELINE.md).
6. 32-tick extra: the headline arm at the r3-era 32-tick CLI default, so
   the 64-tick default (adopted r4 on these numbers: 39.7 vs 57.3 us/img)
   keeps its measured basis in every artifact (VERDICT r3 item 7).
7. Training extras: the real jitted train step (fwd + 3 losses + bwd +
   5-group SGD) at the reference recipe batch (16 videos x 8 props x
   9 segs = 1,152 images), device-resident, hard-synced — for every family
   the reference trains: BNInception RGB (``train_*``), InceptionV3 RGB
   (``train_iv3_*``), BNInception Flow (``train_flow_*``). Each family
   runs a fallback ladder (``run_train_attempts``): eq-mask pool backward
   -> plain SelectAndScatter AD (``sas``) -> sas + remat, recording which
   path produced the number plus every failed attempt's error, so the
   artifact always carries a training number (VERDICT r4 item 2).
8. Binary actionness extra: the TAG pipeline's dense-scoring hot stage
   (reference binary_test.py:63-94) in its deployed default (int8-e2e +
   shared-stem, 2-way head), ``binary_images_per_sec``.

Baselines (vs_baseline denominators): 3500 images/sec — an A100-era
estimate for torch BNInception fp16 inference at large batch (BNInception
is ~2.0 GMACs/image @224^2; the reference publishes no throughput numbers,
only sec/video). The other families scale that SAME estimate by compute
per image (identical effective-FLOPs assumption, BASELINE.md):
  * InceptionV3 @299^2: ~5.7 GMACs/img -> 3500 * 2.0/5.7 = 1228 img/s
  * BNInception Flow: conv1 takes 10 channels instead of 3
    (+7*7*64*112^2*7 = 0.275 GMACs) -> 3500 * 2.0/2.275 = 3077 stacks/s
  * training: fwd+bwd ~= 3x fwd FLOPs -> 3500/3 = 1167 train img/s;
    per-family: IV3 1228/3 = 409 img/s, Flow 3077/3 = 1026 stacks/s
  * binary actionness: same backbone per image as the headline -> 3500

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_ERA_BASELINE_IMG_PER_SEC = 3500.0
IV3_BASELINE_IMG_PER_SEC = 3500.0 * 2.0 / 5.7          # 1228
FLOW_BASELINE_STACKS_PER_SEC = 3500.0 * 2.0 / 2.275    # 3077
TRAIN_BASELINE_IMG_PER_SEC = 3500.0 / 3.0              # 1167
# training baselines for the other deployed families scale by the same
# fwd+bwd ~= 3x fwd FLOPs rule (BASELINE.md)
TRAIN_IV3_BASELINE_IMG_PER_SEC = IV3_BASELINE_IMG_PER_SEC / 3.0     # 409
TRAIN_FLOW_BASELINE_STACKS_PER_SEC = FLOW_BASELINE_STACKS_PER_SEC / 3.0  # 1026
# binary actionness scoring runs the same BNInception RGB backbone per image
BINARY_BASELINE_IMG_PER_SEC = A100_ERA_BASELINE_IMG_PER_SEC

CROPS = 10
TICKS_PER_CHUNK = 64          # frame ticks scored per device step
IMAGES_PER_STEP = CROPS * TICKS_PER_CHUNK
WARMUP_STEPS = 3
MEASURE_STEPS = 30
FAMILY_MEASURE_STEPS = 12     # extras: enough for a stable min, less wall
PROPOSALS = 128               # pooled per chunk-window
SCALE_W, SCALE_H = 340, 256   # scale-size frame shipped per tick (THUMOS-ish)

E2E_VIDEOS = 2
E2E_FRAMES = 576              # test_interval 6 -> 96 ticks/video: per-video
                              # scoring pads each to 2x64-chunks (4 total),
                              # packing shares chunks (3 total) — the
                              # representative remainder-padding case the
                              # --pack decision is judged on
E2E_PROPS = 100


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_train_attempts(attempt, key_name, extras, eq_enabled, logf=log):
    """Run ``attempt(pool_path, remat)`` over the fallback ladder and record
    the first success: (eq_mask) -> (sas) -> (sas + remat).

    ``attempt`` returns a dict of extras on success and raises on failure
    (compile error, OOM, ...). Every failure is recorded as
    ``{key_name}_{path}_error`` so a broken lever shows up as a visible
    REGRESSION marker next to the fallback's number instead of blanking the
    training record (VERDICT r4: BENCH_r04 carried only ``train_error`` after
    the eq-mask pooling compile failure). ``sas`` is the plain
    ``reduce_window`` AD path (SelectAndScatter backward), forced via
    ``ops.pooling.set_eq_mask(False)`` inside ``attempt``; ``remat`` is the
    backbone-activation rematerialization OOM escape hatch.
    """
    attempts = ([("eq_mask", False)] if eq_enabled else []) + [
        ("sas", False), ("sas", True)]
    for pool_path, remat in attempts:
        tag = pool_path + ("_remat" if remat else "")
        try:
            extras.update(attempt(pool_path, remat))
            extras[f"{key_name}_pool_path"] = pool_path
            if remat:
                extras[f"{key_name}_remat"] = True
            return True
        except Exception as e:  # noqa: BLE001 — record and fall through
            logf(f"[{key_name}:{tag}] FAILED: {e}")
            extras[f"{key_name}_{tag}_error"] = str(e)[:200]
    extras.setdefault(f"{key_name}_error", "all train attempts failed")
    return False


def write_e2e_fixture(root):
    """Synthetic JPEG frame dirs + a denormalized proposal list."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    lines = []
    for v in range(E2E_VIDEOS):
        vid = f"bench_video_{v}"
        d = os.path.join(root, "frames", vid)
        os.makedirs(d, exist_ok=True)
        for i in range(1, E2E_FRAMES + 1):
            arr = rng.randint(0, 256, size=(SCALE_H, SCALE_W, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(
                os.path.join(d, f"img_{i:05d}.jpg"), quality=85)
        gts = [(1 + rng.randint(3), *sorted(rng.randint(1, E2E_FRAMES, 2)))
               for _ in range(4)]
        props = [(0, 0.0, 0.0, *sorted(rng.randint(1, E2E_FRAMES, 2)))
                 for _ in range(E2E_PROPS)]
        lines.append(
            f"# {v}\n{vid}\n{E2E_FRAMES}\n1\n{len(gts)}\n"
            + "".join(f"{l} {s} {e}\n" for l, s, e in gts)
            + f"{len(props)}\n"
            + "".join(f"{l} {iou:.4f} {ov:.4f} {s} {e}\n"
                      for l, iou, ov, s, e in props))
    prop_file = os.path.join(root, "bench_prop_list.txt")
    with open(prop_file, "w") as f:
        f.writelines(lines)
    return prop_file, os.path.join(root, "frames")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_detection_tpu.data.pipeline import DirectoryFrameProvider
    from action_detection_tpu.data.ssn_dataset import SSNDataset
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN, jitted_init
    from action_detection_tpu.models.backbones import get_backbone

    K = 20
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    frames0 = jnp.zeros((1, 9, spec.input_size, spec.input_size, 3), jnp.float32)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)}, frames0,
                            jnp.ones((1, 2)), train=False)
    log(f"init: {time.time() - t0:.1f}s")

    reg_stats = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)
    rng = np.random.RandomState(0)
    host_chunk = rng.randint(0, 256, size=(TICKS_PER_CHUNK, SCALE_H, SCALE_W, 3),
                             dtype=np.uint8)

    device = jax.devices()[0]

    def ship():
        return jax.device_put(host_chunk, device)

    def ship_probe_ms(n=3):
        ms = []
        for _ in range(n):
            t0 = time.time()
            ship().block_until_ready()
            ms.append((time.time() - t0) * 1e3)
        return min(ms)

    # probe the channel BEFORE any big program runs (the first big-program
    # execution degrades this process's transfers to ~56MB/s — DESIGN.md)
    pre_ship_ms = ship_probe_ms()
    log(f"pre-exec ship probe: {pre_ship_ms:.0f} ms / 16.7MB")

    def make_scorer(quantize, shared_stem=False, prequantized=None):
        return ProposalScorer(model, variables["params"],
                              variables.get("batch_stats"), spec,
                              reg_stats=reg_stats, num_class=K,
                              test_crops=CROPS, chunk_frames=TICKS_PER_CHUNK,
                              device_crops=True, quantize=quantize,
                              calibration_frames=(
                                  host_chunk[:8]
                                  if quantize and prequantized is None
                                  else None),
                              shared_stem=shared_stem,
                              prequantized=prequantized)

    # the DEFAULT ssn_test configuration for BNInception: int8-e2e
    t0 = time.time()
    scorer = make_scorer("e2e")
    log(f"int8-e2e calibration+quantization: {time.time() - t0:.1f}s")
    scorer_bf16 = make_scorer(False)

    def make_pool_args(n_ticks):
        ticks = jax.device_put(np.stack([
            np.sort(rng.randint(0, n_ticks + 1, size=4))
            for _ in range(PROPOSALS)]).astype(np.int64))
        scaling = jax.device_put(rng.rand(PROPOSALS, 2).astype(np.float32))
        return ticks, scaling, jnp.asarray(n_ticks, jnp.int32)

    ticks, scaling, num_frames = make_pool_args(TICKS_PER_CHUNK)

    def make_step(sc, n_ticks=TICKS_PER_CHUNK, pool_args=None):
        p_ticks, p_scaling, p_nf = pool_args or (ticks, scaling, num_frames)

        def step(frames):
            scores = sc._score_chunk(frames, n_stacks=n_ticks)
            return sc._pool(scores, p_ticks, p_scaling, p_nf)

        return step

    def hard_sync(result):
        # on the axon plugin block_until_ready does not reliably await remote
        # EXECUTION (only transfers); a host scalar fetch is the hard sync
        return float(result[0][0, 0])

    def measure(step, make_input, n_steps):
        for _ in range(WARMUP_STEPS):
            step(make_input())
        hard_sync(step(make_input()))
        t0 = time.time()
        out = None
        for _ in range(n_steps):
            out = step(make_input())
        hard_sync(out)
        return (time.time() - t0) / n_steps

    def measure_resident(step, chunk, tag, images_per_step=IMAGES_PER_STEP,
                         n_steps=MEASURE_STEPS):
        # First execution of a large program on this stack includes
        # server-side finalization: measured anywhere from ~20s to ~850s for
        # the identical program (no cross-process cache). Be patient once.
        t0 = time.time()
        hard_sync(step(chunk))
        log(f"[{tag}] compile+first-run: {time.time() - t0:.1f}s")
        exec_s = measure(step, lambda: chunk, n_steps)
        # the remote compile service can return a poorly-optimized
        # executable; re-roll once through a cleared cache if implausibly slow
        if exec_s > 0.15 * images_per_step / IMAGES_PER_STEP:
            log(f"[{tag}] exec {exec_s*1e3:.0f} ms/step implausible — "
                f"recompiling once")
            jax.clear_caches()
            t0 = time.time()
            hard_sync(step(chunk))
            log(f"[{tag}] recompile+run: {time.time() - t0:.1f}s")
            exec_s = min(exec_s, measure(step, lambda: chunk, n_steps))
        log(f"[{tag}] device-resident: {exec_s*1e3:.1f} ms/step hard-synced "
            f"= {images_per_step/exec_s:.0f} img/s")
        return exec_s

    dev_chunk = ship()
    # 1a. extra: per-crop int8-e2e (`ssn_test --no_shared_stem`)
    percrop_exec_s = measure_resident(make_step(scorer), dev_chunk,
                                      "int8-e2e-percrop")
    # 1b. headline: int8-e2e + shared-stem 10-crop scoring — ssn_test's
    # default for BNInception (stem per frame+flip instead of per crop, crop
    # windows sliced on the stride-8 feature grid; accuracy bounded in
    # tests/test_sharedstem.py + tests/test_reference_pipeline.py; on-chip
    # probe 1.20x, scripts/sharedstem_probe.py). Reuses the per-crop
    # scorer's quantized tree, so no second calibration.
    scorer_shared = None
    try:
        scorer_shared = make_scorer("e2e", shared_stem=True,
                                    prequantized=scorer.export_quantized())
        exec_s = measure_resident(make_step(scorer_shared), dev_chunk,
                                  "int8-e2e+sharedstem")
        mode = ("int8-e2e + shared-stem (ssn_test default for BNInception; "
                "detection-delta bounded in tests/test_int8.py + "
                "tests/test_sharedstem.py)")
    except Exception as e:    # fall back to per-crop if the default arm fails
        log(f"[int8-e2e+sharedstem] FAILED (falling back to per-crop): {e}")
        scorer_shared = None
        exec_s = percrop_exec_s
        mode = ("int8-e2e per-crop (shared-stem arm failed this run; "
                "detection-delta bounded in tests/test_int8.py)")
    # 2. extra: unquantized bf16 (--no_int8)
    bf16_exec_s = measure_resident(make_step(scorer_bf16), dev_chunk, "bf16")

    # 3. extra: per-step host ship included (tunnel-channel dependent here);
    # measured on the default (shared-stem) path when it built
    scorer_default = scorer_shared if scorer_shared is not None else scorer
    ship_s = measure(make_step(scorer_default), ship, MEASURE_STEPS)
    post_ship_ms = ship_probe_ms()
    log(f"with per-step 16.7MB ship: {ship_s*1e3:.1f} ms/step hard-synced "
        f"= {IMAGES_PER_STEP/ship_s:.0f} img/s "
        f"(channel now {16.7/post_ship_ms*1e3:.0f} MB/s)")
    shipped_images_per_sec = IMAGES_PER_STEP / ship_s
    images_per_sec = IMAGES_PER_STEP / exec_s

    # 3. end-to-end: JPEG decode -> rescale -> score -> pool
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        prop_file, frame_root = write_e2e_fixture(root)
        log(f"e2e fixture ({E2E_VIDEOS} videos x {E2E_FRAMES} jpegs): "
            f"{time.time() - t0:.1f}s")
        dataset = SSNDataset(prop_file, test_interval=6, verbose=False)
        provider = DirectoryFrameProvider(root=frame_root)

        # warm pass compiles the e2e pool bucket + fills the page cache
        samples = [dataset.get_test_sample(i) for i in range(E2E_VIDEOS)]
        scorer_default.score_video(samples[0], provider)

        best_dt = float("inf")
        total_images = sum(len(s.frame_ticks) * CROPS for s in samples)
        for _ in range(2):
            t0 = time.time()
            for s in samples:
                scorer_default.score_video(s, provider)
            best_dt = min(best_dt, time.time() - t0)
        sec_per_video = best_dt / E2E_VIDEOS
        e2e_images_per_sec = total_images / best_dt
        log(f"e2e: {E2E_VIDEOS} videos ({total_images} images incl. decode) "
            f"in {best_dt:.2f}s -> {sec_per_video:.3f} sec/video, "
            f"{e2e_images_per_sec:.0f} img/s")

        # cross-video packed scoring (--pack): same videos, one shared chunk
        # stream — the measured basis for the pack default decision
        scorer_default.score_video_pack(samples, provider)  # warm the pack path
        best_pack = float("inf")
        for _ in range(2):
            t0 = time.time()
            scorer_default.score_video_pack(samples, provider)
            best_pack = min(best_pack, time.time() - t0)
        pack_sec_per_video = best_pack / E2E_VIDEOS
        log(f"e2e --pack: {best_pack:.2f}s -> {pack_sec_per_video:.3f} "
            f"sec/video ({(best_dt - best_pack) / best_dt * 100:+.1f}% vs "
            f"per-video)")

    extras = {}

    # 5. per-family extras: the deployed default (int8-e2e + shared-stem)
    # for InceptionV3 RGB and BNInception Flow — the other two families the
    # published mAP rows rest on. Each is measured in this same process with
    # its own baseline denominator (module docstring + BASELINE.md).
    def bench_family(arch, modality, key, baseline, unit):
        famK = 20
        fmodel = SSN(num_class=famK, base_model=arch, modality=modality,
                     dropout=0.0, dtype=jnp.bfloat16)
        _, _, fspec = get_backbone(arch, modality, dtype=jnp.bfloat16)
        C = 3 if modality == "RGB" else 2 * fmodel.resolved_new_length
        t0 = time.time()
        fvars = jitted_init(fmodel, {"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 9, fspec.input_size,
                                       fspec.input_size, C), jnp.float32),
                            jnp.ones((1, 2)), train=False)
        log(f"[{key}] init: {time.time() - t0:.1f}s")
        H_s = fspec.scale_size
        W_s = int(H_s * 455 / 341)       # THUMOS-ish aspect, short side scaled
        fchunk = rng.randint(0, 256, (TICKS_PER_CHUNK, H_s, W_s, C),
                             dtype=np.uint8)
        t0 = time.time()
        fsc = ProposalScorer(fmodel, fvars["params"],
                             fvars.get("batch_stats"), fspec,
                             reg_stats=reg_stats, num_class=famK,
                             test_crops=CROPS, chunk_frames=TICKS_PER_CHUNK,
                             modality=modality, device_crops=True,
                             quantize="e2e", calibration_frames=fchunk[:8],
                             shared_stem=True)
        log(f"[{key}] calibration+quantization: {time.time() - t0:.1f}s")
        fdev = jax.device_put(fchunk, device)
        fexec_s = measure_resident(make_step(fsc), fdev, key,
                                   n_steps=FAMILY_MEASURE_STEPS)
        fsc.close()
        rate = IMAGES_PER_STEP / fexec_s
        return {f"{key}_{unit}": round(rate, 2),
                f"{key}_exec_ms_per_step": round(fexec_s * 1e3, 2),
                f"{key}_vs_baseline": round(rate / baseline, 3),
                f"{key}_baseline_{unit}": round(baseline, 1)}

    for arch, modality, key, baseline, unit in (
            ("InceptionV3", "RGB", "iv3", IV3_BASELINE_IMG_PER_SEC,
             "images_per_sec"),
            ("BNInception", "Flow", "flow", FLOW_BASELINE_STACKS_PER_SEC,
             "stacks_per_sec")):
        try:
            extras.update(bench_family(arch, modality, key, baseline, unit))
        except Exception as e:
            log(f"[{key}] FAILED: {e}")
            extras[f"{key}_error"] = str(e)[:200]

    # 6. the headline arm at the CLI default chunk (--test_batchsize):
    # reconciles the benched chunk with the deployed default with a current
    # number (r1 measured 72.2 vs 66.5 us/img at 32 vs 64 ticks)
    try:
        tick32 = 32
        sc32 = ProposalScorer(model, variables["params"],
                              variables.get("batch_stats"), spec,
                              reg_stats=reg_stats, num_class=K,
                              test_crops=CROPS, chunk_frames=tick32,
                              device_crops=True, quantize="e2e",
                              shared_stem=scorer_shared is not None,
                              prequantized=scorer.export_quantized())
        chunk32 = jax.device_put(host_chunk[:tick32], device)
        exec32_s = measure_resident(
            make_step(sc32, n_ticks=tick32, pool_args=make_pool_args(tick32)),
            chunk32, "tick32", images_per_step=CROPS * tick32,
            n_steps=FAMILY_MEASURE_STEPS)
        sc32.close()
        extras["tick32_images_per_sec"] = round(CROPS * tick32 / exec32_s, 2)
        extras["tick32_exec_ms_per_step"] = round(exec32_s * 1e3, 2)
        extras["tick32_us_per_image"] = round(exec32_s / (CROPS * tick32)
                                              * 1e6, 2)
        extras["tick64_us_per_image"] = round(exec_s / IMAGES_PER_STEP
                                              * 1e6, 2)
    except Exception as e:
        log(f"[tick32] FAILED: {e}")
        extras["tick32_error"] = str(e)[:200]

    # 7. training: the real jitted train step (fwd + 3 losses + bwd + 5-group
    # SGD) at the reference recipe batch (16 videos x 8 props x 9 segs =
    # 1,152 images, bf16 backbone), device-resident, hard-synced via the
    # loss fetch — for every family the reference trains (ssn_train.py
    # --arch/--modality): BNInception RGB (headline train_*), InceptionV3
    # RGB @299^2 (train_iv3_*), BNInception Flow 10-channel stacks
    # (train_flow_*). Each family runs the pool-path fallback ladder
    # (run_train_attempts) so a failed lever can never blank the artifact.
    from action_detection_tpu.config import SamplingConfig
    from action_detection_tpu.ops import pooling
    from action_detection_tpu.train import (create_train_state,
                                            make_optimizer, make_train_step)

    def bench_train_family(arch, modality, key_name, baseline,
                           implausible_s):
        sampling = SamplingConfig()
        _, _, tspec = get_backbone(arch, modality, dtype=jnp.bfloat16)
        B, P, S, Himg = 16, sampling.prop_per_video, 9, tspec.input_size
        n_img = B * P * S
        key = jax.random.PRNGKey(0)

        def attempt(pool_path, remat):
            tmodel = SSN(num_class=K, base_model=arch, modality=modality,
                         dropout=0.8, dtype=jnp.bfloat16, remat=remat)
            C = 3 if modality == "RGB" else 2 * tmodel.resolved_new_length
            tbatch = {
                "frames": rng.randint(0, 256, size=(B * P, S, Himg, Himg, C),
                                      dtype=np.uint8),
                "scaling": rng.rand(B * P, 2).astype(np.float32),
                "labels": np.tile([1] + [2] * 6 + [0], B).astype(np.int64),
                "reg_targets": rng.randn(B * P, 2).astype(np.float32),
                "prop_type": np.tile([0] + [1] * 6 + [2], B).astype(np.int64),
            }
            tx = make_optimizer(base_lr=0.001, lr_steps=[20, 40],
                                steps_per_epoch=125, iter_size=1)
            tag = f"{key_name}:{pool_path}{'+remat' if remat else ''}"
            prev = pooling.set_eq_mask(pool_path == "eq_mask")
            try:
                t0 = time.time()
                tstate = create_train_state(tmodel, tx, tbatch, tspec,
                                            modality=modality)
                log(f"[{tag}] init: {time.time() - t0:.1f}s")
                train_step = make_train_step(tmodel, tx, sampling, tspec,
                                             modality=modality, donate=True)
                dev_batch = jax.device_put(tbatch)
                t0 = time.time()
                tstate, m = train_step(tstate, dev_batch, key)
                log(f"[{tag}] compile+first-step: {time.time() - t0:.1f}s "
                    f"loss={float(m['loss']):.4f}")

                def run(step_fn, st, n=6):
                    for _ in range(2):
                        st, mm = step_fn(st, dev_batch, key)
                    float(mm["loss"])
                    t0 = time.time()
                    for _ in range(n):
                        st, mm = step_fn(st, dev_batch, key)
                    float(mm["loss"])            # hard sync
                    return (time.time() - t0) / n, st

                step_s, tstate = run(train_step, tstate)
                if step_s > implausible_s:
                    # the remote compile service occasionally returns a
                    # poorly-optimized executable; re-roll once (same
                    # discipline as the scorer arms)
                    log(f"[{tag}] {step_s:.3f} s/step implausible — "
                        "recompiling once")
                    jax.clear_caches()
                    train_step = make_train_step(tmodel, tx, sampling, tspec,
                                                 modality=modality,
                                                 donate=True)
                    tstate, m = train_step(tstate, dev_batch, key)
                    float(m["loss"])
                    step2_s, tstate = run(train_step, tstate)
                    step_s = min(step_s, step2_s)
                rate = n_img / step_s
                log(f"[{tag}] {step_s:.3f} s/step device-resident = "
                    f"{rate:.0f} img/s")
                out = {f"{key_name}_step_sec": round(step_s, 4),
                       f"{key_name}_images_per_sec": round(rate, 1),
                       f"{key_name}_vs_baseline": round(rate / baseline, 3)}
                if key_name == "train":   # THUMOS14: 125 steps/epoch x 45
                    out["train_thumos14_45ep_hours"] = round(
                        125 * 45 * step_s / 3600, 2)
                return out
            finally:
                pooling.set_eq_mask(prev)

        run_train_attempts(attempt, key_name, extras,
                           eq_enabled=pooling.eq_mask_enabled(), logf=log)

    # implausibility thresholds ~= 3x the expected step from the family's
    # FLOPs at the measured ~20 TFLOP/s training rate
    for arch, modality, key_name, baseline, implausible_s in (
            ("BNInception", "RGB", "train", TRAIN_BASELINE_IMG_PER_SEC, 0.9),
            ("InceptionV3", "RGB", "train_iv3",
             TRAIN_IV3_BASELINE_IMG_PER_SEC, 3.0),
            ("BNInception", "Flow", "train_flow",
             TRAIN_FLOW_BASELINE_STACKS_PER_SEC, 1.1)):
        try:
            bench_train_family(arch, modality, key_name, baseline,
                               implausible_s)
        except Exception as e:   # never let one family sink the artifact
            log(f"[{key_name}] FAILED: {e}")
            extras[f"{key_name}_error"] = str(e)[:200]

    # 8. binary actionness dense scoring (the TAG pipeline's hot stage,
    # reference binary_test.py:63-94) in ITS deployed default: int8-e2e +
    # shared-stem + device crops, 2-way head on dense ticks — the second
    # throughput-critical harness gets its own recorded number
    try:
        from action_detection_tpu.data.transforms import (device_normed_pair,
                                                          preprocess_frames)
        from action_detection_tpu.models import BinaryClassifier
        from action_detection_tpu.models.backbones.quantize import (
            calibrate_e2e_backbone, int8_e2e_features_sharedstem)

        bmodel = BinaryClassifier(num_class=2, base_model="BNInception",
                                  dropout=0.0, dtype=jnp.bfloat16)
        t0 = time.time()
        bvars = jitted_init(bmodel, {"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 5, spec.input_size,
                                       spec.input_size, 3), jnp.float32),
                            train=False)
        log(f"[binary] init: {time.time() - t0:.1f}s")
        H_in = spec.input_size
        y0 = (SCALE_H - H_in) // 2
        x0 = (SCALE_W - H_in) // 2
        calib = preprocess_frames(
            jnp.asarray(host_chunk[:8, y0:y0 + H_in, x0:x0 + H_in]), spec)
        t0 = time.time()
        bquant = calibrate_e2e_backbone(
            "BNInception", bvars["params"]["backbone"],
            bvars.get("batch_stats", {}).get("backbone", {}), calib)
        log(f"[binary] calibration+quantization: {time.time() - t0:.1f}s")
        bhead = {"kernel": bvars["params"]["classifier_fc"]["kernel"],
                 "bias": bvars["params"]["classifier_fc"]["bias"]}

        @jax.jit
        def binary_impl(quantized, head, frames_u8):
            # the same jitted body cli/binary_test.py deploys by default
            # (binary_test.py:251-267): normalize once per frame+flip, shared
            # stem, crop windows on the trunk-input grid, int8 trunk, linear
            # actionness head
            xn, flip_src = device_normed_pair(frames_u8, spec)
            feats = int8_e2e_features_sharedstem("BNInception", quantized,
                                                 xn, flip_src, H_in)
            return jnp.matmul(feats, head["kernel"],
                              precision=jax.lax.Precision.HIGHEST) \
                + head["bias"]

        bquant_dev = jax.device_put(bquant, device)
        bhead_dev = jax.device_put(bhead, device)
        bexec_s = measure_resident(
            lambda frames: (binary_impl(bquant_dev, bhead_dev, frames),),
            dev_chunk, "binary", n_steps=FAMILY_MEASURE_STEPS)
        brate = IMAGES_PER_STEP / bexec_s
        extras["binary_images_per_sec"] = round(brate, 2)
        extras["binary_exec_ms_per_step"] = round(bexec_s * 1e3, 2)
        extras["binary_vs_baseline"] = round(
            brate / BINARY_BASELINE_IMG_PER_SEC, 3)
        extras["binary_baseline_images_per_sec"] = round(
            BINARY_BASELINE_IMG_PER_SEC, 1)
    except Exception as e:
        log(f"[binary] FAILED: {e}")
        extras["binary_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "ssn_scorer_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip (device-resident, hard-synced)",
        "vs_baseline": round(images_per_sec / A100_ERA_BASELINE_IMG_PER_SEC, 3),
        "mode": mode,
        "exec_ms_per_step": round(exec_s * 1e3, 2),
        "percrop_images_per_sec": round(IMAGES_PER_STEP / percrop_exec_s, 2),
        "percrop_exec_ms_per_step": round(percrop_exec_s * 1e3, 2),
        "bf16_images_per_sec": round(IMAGES_PER_STEP / bf16_exec_s, 2),
        "bf16_exec_ms_per_step": round(bf16_exec_s * 1e3, 2),
        "shipped_images_per_sec": round(shipped_images_per_sec, 2),
        "ship_MBps_pre": round(16.7 / pre_ship_ms * 1e3, 1),
        "ship_MBps_post": round(16.7 / post_ship_ms * 1e3, 1),
        "e2e_sec_per_video": round(sec_per_video, 3),
        "e2e_images_per_sec": round(e2e_images_per_sec, 2),
        "e2e_sec_per_video_packed": round(pack_sec_per_video, 3),
        **extras,
    }))


if __name__ == "__main__":
    main()
