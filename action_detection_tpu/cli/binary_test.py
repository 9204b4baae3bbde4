"""Dense actionness scoring CLI (parity target: /root/reference/binary_test.py).

Scores every ``frame_interval``-th frame with the actionness classifier and
pickles {vid: (frames, crops, num_class)} raw score arrays for TAG grouping
(num_class = 2 for thumos14, 100 for activitynet1.2 — the reference's
actionness config).
"""

from __future__ import annotations

import argparse
import pickle
import time


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Binary actionness test tool")
    parser.add_argument("dataset", type=str,
                        choices=["activitynet1.2", "thumos14"])
    parser.add_argument("modality", type=str, choices=["RGB", "Flow", "RGBDiff"])
    parser.add_argument("subset", type=str,
                        choices=["training", "validation", "testing"],
                        help="which proposal list to score (reference "
                             "binary_test.py:18,41-50: thumos14 "
                             "validation->train list / testing->test list; "
                             "activitynet1.2 training->train list / "
                             "validation->test list)")
    parser.add_argument("weights", type=str)
    parser.add_argument("save_scores", type=str)
    parser.add_argument("--arch", type=str, default="BNInception")
    parser.add_argument("--frame_interval", type=int, default=5)
    parser.add_argument("--test_batchsize", type=int, default=64,
                        help="frame ticks per device chunk (64: same "
                             "measured economics as ssn_test — the dense "
                             "scoring loop is the same backbone step)")
    parser.add_argument("--max_num", type=int, default=-1)
    parser.add_argument("--test_crops", type=int, default=10)
    parser.add_argument("--flow_pref", type=str, default="")
    parser.add_argument("--data_root", default="", type=str)
    parser.add_argument("--prop_file_dir", default="data", type=str)
    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--int8", action="store_true", default=None,
                        help="int8-quantize the backbone. DEFAULT ON for "
                             "BNInception and InceptionV3 (int8-e2e, same "
                             "accuracy bounds as ssn_test — "
                             "tests/test_int8.py); --no_int8 opts out")
    parser.add_argument("--no_int8", dest="int8", action="store_false",
                        help="force the bf16/f32 backbone")
    parser.add_argument("--int8_mode", choices=["e2e", "perlayer"],
                        default="e2e",
                        help="e2e: int8 activations end-to-end (fastest, "
                             "default); perlayer: dequant/requant around "
                             "each conv")
    parser.add_argument("--shared_stem", action="store_true", default=None,
                        help="run the backbone stem once per frame+flip and "
                             "slice the 10 crop windows on the stride-8 "
                             "trunk-input grid (~2.9x less stem work; "
                             "approximate — bounds in "
                             "tests/test_sharedstem.py; per-crop score "
                             "layout preserved). Default: ON when int8-e2e "
                             "+ 10 device crops are active (measured 1.20x "
                             "on chip, scripts/sharedstem_probe.py)")
    parser.add_argument("--no_shared_stem", dest="shared_stem",
                        action="store_false",
                        help="force per-crop stem computation")
    parser.add_argument("--gpus", "--devices", dest="devices", nargs="+",
                        type=int, default=None,
                        help="local device indices to fan videos out over "
                             "(default: all) — the reference's --gpus "
                             "worker pool (binary_test.py:98-167)")
    parser.add_argument("--host_crops", action="store_true",
                        help="cut the 10-crop oversample on host instead of "
                             "on device (debugging / parity checks)")
    parser.add_argument("--use_reference", action="store_true", default=False,
                        help="load the published ImageNet-init reference "
                             "actionness checkpoint from the local model "
                             "cache (weights positional is ignored)")
    parser.add_argument("--use_kinetics_reference", action="store_true",
                        default=False,
                        help="as --use_reference with the Kinetics-init model")
    parser.add_argument("-j", "--workers", default=None, type=int,
                        help="host decode threads (the reference's "
                             "worker-process count; default adapts)")
    # accepted for reference CLI compatibility; parsed-but-unused there too
    # (binary_test.py:27-29 — input size comes from the model)
    parser.add_argument("--input_size", type=int, default=224,
                        help=argparse.SUPPRESS)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import get_actionness_configs
    from ..data.binary_dataset import BinaryDataset
    from ..data.pipeline import (DirectoryFrameProvider, SyntheticFrameProvider,
                                 iter_scaled_frame_chunks,
                                 iter_test_frame_batches, make_decode_pool,
                                 make_test_transform, pad_chunk_ticks)
    from ..data.transforms import device_oversample_normed, preprocess_frames
    from ..models import BinaryClassifier
    from ..models.backbones import get_backbone
    from ..train import load_checkpoint

    cfg = get_actionness_configs(args.dataset)
    # the reference's "binary" model is cfg.num_class-way: 2 for thumos14,
    # 100 for activitynet1.2 (data/dataset_actionness_cfg.yaml; binary_train
    # .py:24,33) — TAG grouping then thresholds per foreground class
    num_class = cfg.num_class
    model = BinaryClassifier(num_class=num_class, modality=args.modality,
                             base_model=args.arch, dropout=0.0)
    _, _, spec = get_backbone(args.arch, args.modality)
    new_length = 1 if args.modality == "RGB" else 5

    weights = args.weights
    if args.use_reference or args.use_kinetics_reference:
        from ..config import resolve_reference_checkpoint

        weights = resolve_reference_checkpoint(
            args.dataset, args.modality,
            "ImageNet" if args.use_reference else "Kinetics", args.arch)
        print(f"using reference model: {weights}")
    if weights.endswith((".pth", ".pth.tar", ".pt")):
        from ..models.convert import (convert_torch_ssn_checkpoint,
                                      load_torch_checkpoint)

        ck = convert_torch_ssn_checkpoint(load_torch_checkpoint(weights),
                                          arch=args.arch)
    else:
        ck = load_checkpoint(weights)
    if "classifier_fc" not in ck["params"]:
        # the published reference release ships only SSN detection
        # checkpoints (reference_models.yaml) — loading one here would crash
        # the reference too (binary_model has no activity/completeness heads)
        raise SystemExit(
            f"'{weights}' is not an actionness checkpoint (no classifier_fc "
            f"head; it looks like an SSN detection model). Train one with "
            f"binary_train.py or pass a converted actionness .pth.")
    variables = {"params": ck["params"]}
    if ck["batch_stats"]:
        variables["batch_stats"] = ck["batch_stats"]

    # subset -> proposal list (reference binary_test.py:41-50)
    subset_lists = ({"validation": cfg.train_list, "testing": cfg.test_list}
                    if args.dataset == "thumos14" else
                    {"training": cfg.train_list, "validation": cfg.test_list})
    if args.subset not in subset_lists:
        raise SystemExit(f"subset '{args.subset}' is not defined for "
                         f"{args.dataset} (choose from "
                         f"{sorted(subset_lists)})")
    test_prop_file = os.path.join(
        args.prop_file_dir, f"{subset_lists[args.subset]}_proposal_list.txt")
    dataset = BinaryDataset(test_prop_file, new_length=new_length,
                            test_interval=args.frame_interval)

    if args.synthetic_data:
        provider = SyntheticFrameProvider(modality=args.modality)
    else:
        tmpl = ("img_{:05d}.jpg" if args.modality in ("RGB", "RGBDiff")
                else args.flow_pref + "{}_{:05d}.jpg")
        provider = DirectoryFrameProvider(args.data_root, tmpl, args.modality)

    transform = make_test_transform(spec.input_size, spec.scale_size,
                                    args.test_crops)

    # int8 defaults ON where supported, like ssn_test (e2e mode; accuracy
    # bounds in tests/test_int8.py)
    from ..models.backbones.quantize import (calibrate_e2e_backbone,
                                             int8_support_error, supports_int8)

    use_int8 = (args.int8 if args.int8 is not None
                else supports_int8(args.arch, args.int8_mode))
    if use_int8 and not supports_int8(args.arch, args.int8_mode):
        raise SystemExit(int8_support_error(args.arch, args.int8_mode))
    if args.int8 is None and not use_int8:
        if args.int8_mode != "e2e":
            # the user explicitly asked for a quantized mode; silently
            # running bf16 would score with a different numerical path than
            # requested — refuse instead
            raise SystemExit(
                int8_support_error(args.arch, args.int8_mode)
                + "; pass --no_int8 to run the bf16/f32 backbone")
        print(f"int8 off: no int8 path wired for {args.arch}; "
              "running the bf16/f32 backbone", flush=True)
    quantized = act_scales = None
    if use_int8:
        from ..data.pipeline import collect_calibration_frames
        from ..models.backbones.bn_inception_int8 import (
            calibrate_activation_scales, quantize_backbone)

        calib = collect_calibration_frames(dataset, provider, transform,
                                           new_length=new_length)
        if calib is None:
            # every video has zero ticks -> nothing will be scored; keep the
            # bf16 path (score_chunk_impl branches on quantized is None)
            print("int8: no calibration frames (all videos empty); "
                  "falling back to bf16", flush=True)
        else:
            sample = preprocess_frames(jnp.asarray(calib), spec,
                                       args.modality, new_length)
            bb_params = ck["params"]["backbone"]
            bb_stats = (ck["batch_stats"] or {}).get("backbone", {})
            if args.int8_mode == "e2e":
                quantized = calibrate_e2e_backbone(args.arch, bb_params,
                                                   bb_stats, sample)
            else:
                quantized = quantize_backbone(bb_params, bb_stats)
                act_scales = calibrate_activation_scales(quantized, sample)

    # weights ride as jit arguments, not closure captures: embedded-constant
    # executables degrade every later host->device transfer (see
    # infer/scorer.py:_score_chunk_impl)
    head = {"kernel": ck["params"]["classifier_fc"]["kernel"],
            "bias": ck["params"]["classifier_fc"]["bias"]}

    # 10-crop path cuts the oversample on DEVICE from one shipped scale-size
    # frame per tick (~6-10x less PCIe; bit-identical to host GroupOverSample,
    # same as infer/scorer.py). Per-crop scores are preserved — the output
    # pickle stays {vid: (frames, crops, 2)} like the reference's
    # binary_test.py:84-94.
    use_device_crops = args.test_crops == 10 and not args.host_crops

    # shared-stem rides the same default as ssn_test (on-chip probe 1.20x;
    # per-crop scores preserved — the sharedstem features are crop-major,
    # tests/test_sharedstem.py pins the layout)
    from ..models.backbones.quantize import supports_shared_stem

    can_share = (use_device_crops and use_int8 and args.int8_mode == "e2e"
                 and supports_shared_stem(args.arch))
    use_shared = (args.shared_stem if args.shared_stem is not None
                  else can_share)
    if use_shared and not can_share:
        raise SystemExit("--shared_stem requires int8-e2e, 10 device crops, "
                         f"and a wired backbone (got arch={args.arch}, "
                         f"int8={use_int8}/{args.int8_mode}, "
                         f"crops={args.test_crops}, "
                         f"host_crops={args.host_crops})")
    if use_shared and quantized is None:
        # int8 calibration collected no frames, so the jitted scorer takes
        # the bf16 per-crop branch — say so instead of silently scoring on a
        # different path than the (possibly explicit) --shared_stem asked for
        print("shared_stem disabled: no int8 calibration frames, scoring on "
              "the per-crop bf16 path", flush=True)
        use_shared = False

    @jax.jit
    def score_chunk_impl(variables, quantized, act_scales, head, frames_u8):
        if use_shared and quantized is not None:
            # stem per frame+flip; crop windows sliced on the trunk-input
            # grid. Returns (crops*ticks, D) crop-major — the same layout
            # the per-crop path produces, so the reshape below is unchanged.
            from ..data.transforms import device_normed_pair
            from ..models.backbones.quantize import (
                int8_e2e_features_sharedstem)

            xn, flip_src = device_normed_pair(frames_u8, spec, args.modality,
                                              new_length)
            feats = int8_e2e_features_sharedstem(args.arch, quantized, xn,
                                                 flip_src, spec.input_size)
            return jnp.matmul(feats, head["kernel"],
                              precision=jax.lax.Precision.HIGHEST) \
                + head["bias"]
        if use_device_crops:
            # normalize-then-crop: elementwise normalization commutes with
            # crop/flip, so this is bit-identical and ~5.8x cheaper on the
            # normalize (scripts/fullstep_probe.py; see infer/scorer.py)
            x = device_oversample_normed(frames_u8, spec, args.modality,
                                         new_length)
        else:
            x = preprocess_frames(frames_u8, spec, args.modality, new_length)
        if quantized is not None:
            if args.int8_mode == "e2e":
                from ..models.backbones.quantize import int8_e2e_features

                feats = int8_e2e_features(args.arch, quantized, x)
            else:
                from ..models.backbones.bn_inception_int8 import (
                    bninception_int8_features)

                feats = bninception_int8_features(quantized, x,
                                                  act_scales=act_scales)
            return jnp.matmul(feats, head["kernel"],
                              precision=jax.lax.Precision.HIGHEST) + head["bias"]
        return model.apply(variables, x, method=BinaryClassifier.score_frames)

    n = len(dataset.video_list)
    if args.max_num > 0:
        n = min(n, args.max_num)

    decode_pool = make_decode_pool(args.workers) if use_device_crops else None
    if not use_device_crops and args.workers:
        print("note: -j/--workers only parallelizes decode on the "
              "device-crops path; the host-crop transform decodes per chunk")

    # multi-device fan-out (the reference's round-robin GPU worker pool,
    # binary_test.py:98-167, rebuilt as one thread per device pulling video
    # indices from a shared queue — the same pattern as
    # infer/scorer.py:score_videos). Videos are independent, the calibrated
    # quantized tree is computed ONCE on host and committed per device
    # (byte-identical inputs -> byte-identical scores regardless of the
    # device count), and jit follows the placement of its committed
    # arguments, so each device runs its own executable without re-shipping
    # ~40MB of params per chunk (see infer/scorer.py:_score_chunk_impl).
    from ..parallel import select_devices

    devices = select_devices(args.devices)

    def score_one_video(idx, dev_state):
        dv, dq, da, dh, device = dev_state
        sample = dataset.get_test_sample(idx)
        T = len(sample.frame_ticks)
        if use_device_crops:
            chunk_iter = iter_scaled_frame_chunks(
                provider, sample.video_id, sample.frame_ticks,
                sample.num_frames, spec.scale_size, new_length=new_length,
                batch_ticks=args.test_batchsize, executor=decode_pool)
            host_crops = 1
        else:
            chunk_iter = iter_test_frame_batches(
                provider, sample.video_id, sample.frame_ticks,
                sample.num_frames, transform, new_length=new_length,
                batch_ticks=args.test_batchsize)
            host_crops = args.test_crops
        chunks = []
        for chunk in chunk_iter:
            n_ticks = chunk.shape[0] // host_crops
            chunk = pad_chunk_ticks(chunk, host_crops, args.test_batchsize)
            scores = np.asarray(score_chunk_impl(
                dv, dq, da, dh, jax.device_put(chunk, device)))
            # (crops * ticks, K) -> (ticks, crops, K)
            scores = scores.reshape(args.test_crops, args.test_batchsize,
                                    num_class)
            chunks.append(scores[:, :n_ticks].transpose(1, 0, 2))
        # key by the video-id BASENAME (reference binary_test.py:94
        # id.split('/')[-1]): proposal lists carry frame-folder paths, but
        # gen_bottom_up_proposals matches scores against dataset-DB ids
        vid_key = sample.video_id.split("/")[-1]
        if chunks:
            return vid_key, sample.video_id, np.concatenate(chunks, axis=0)[:T]
        # video shorter than new_length yields no ticks: keep an empty
        # entry (the reference stores a zeros array and continues,
        # binary_test.py:84-94) instead of crashing the whole run
        return vid_key, sample.video_id, np.zeros(
            (0, args.test_crops, num_class), np.float32)

    import queue
    import threading

    work: "queue.Queue" = queue.Queue()
    for idx in range(n):
        work.put(idx)
    results = {}
    errors = []
    lock = threading.Lock()
    t0 = time.time()

    def worker(device):
        try:
            dev_state = (jax.device_put(variables, device),
                         (jax.device_put(quantized, device)
                          if quantized is not None else None),
                         (jax.device_put(act_scales, device)
                          if act_scales is not None else None),
                         jax.device_put(head, device), device)
        except Exception as e:  # surface instead of hanging the collection
            with lock:
                errors.append(e)
            return
        while True:
            try:
                idx = work.get_nowait()
            except queue.Empty:
                return
            try:
                vid_key, vid, scores = score_one_video(idx, dev_state)
            except Exception as e:
                with lock:
                    errors.append(e)
                return
            with lock:
                results[vid_key] = scores
                done = len(results)
            print(f"video {idx} {vid} done "
                  f"({(time.time() - t0) / done:.3f} sec/video)", flush=True)

    if len(devices) == 1:
        worker(devices[0])
    else:
        threads = [threading.Thread(target=worker, args=(d,))
                   for d in devices]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    if decode_pool is not None:
        decode_pool.shutdown(wait=False)
    if errors:
        # unlike the reference's daemon workers (a crash silently hangs the
        # result loop), failures surface to the caller
        raise errors[0]
    with open(args.save_scores, "wb") as f:
        pickle.dump(results, f, pickle.HIGHEST_PROTOCOL)
    print(f"scores saved to {args.save_scores}")


if __name__ == "__main__":
    main()
