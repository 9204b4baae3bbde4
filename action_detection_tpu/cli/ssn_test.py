"""SSN proposal-scoring CLI (parity target: /root/reference/ssn_test.py).

Usage: python ssn_test.py <dataset> <modality> <weights> <save_scores> [flags]
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="SSN Testing Tool (TPU-native)")
    parser.add_argument("dataset", type=str, choices=["activitynet1.2", "thumos14"])
    parser.add_argument("modality", type=str, choices=["RGB", "Flow", "RGBDiff"])
    parser.add_argument("weights", type=str)
    parser.add_argument("save_scores", type=str)
    parser.add_argument("--arch", type=str, default="BNInception")
    parser.add_argument("--save_raw_scores", type=str, default=None)
    parser.add_argument("--frame_interval", type=int, default=6)
    parser.add_argument("--test_batchsize", type=int, default=64,
                        help="frame ticks per device chunk (default 64 — "
                             "measured 39.7 vs 57.3 us/img at 64- vs "
                             "32-tick chunks on one v5e: the shared-stem's "
                             "fixed per-chunk cost amortizes better at 64; "
                             "bench.py tick32_*/tick64_* extras)")
    parser.add_argument("--no_regression", action="store_true", default=False)
    parser.add_argument("--max_num", type=int, default=-1)
    parser.add_argument("--test_crops", type=int, default=10)
    parser.add_argument("--flow_pref", type=str, default="")
    parser.add_argument("--data_root", default="", type=str)
    parser.add_argument("--prop_file_dir", default="data", type=str)
    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--int8", action="store_true", default=None,
                        help="int8-quantize the backbone, activation scales "
                             "calibrated across test videos. DEFAULT ON for "
                             "BNInception and InceptionV3 (detection-metric "
                             "delta bounded in tests/test_int8.py); "
                             "--no_int8 opts out")
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
                             "approximate — offsets snap <=4px; bounded "
                             "end-to-end in tests/test_sharedstem.py). "
                             "Default: ON when int8-e2e + 10 device crops "
                             "are active (measured 1.20x on chip)")
    parser.add_argument("--no_shared_stem", dest="shared_stem",
                        action="store_false",
                        help="force per-crop stem computation")
    parser.add_argument("--gpus", "--devices", dest="devices", nargs="+",
                        type=int, default=None,
                        help="local device indices to fan videos out over "
                             "(default: all) — the reference's --gpus "
                             "(ssn_test.py:32,52)")
    parser.add_argument("--pack", action="store_true", default=None,
                        help="pack frame ticks from multiple videos into each "
                             "fixed-size device chunk (identical scores, no "
                             "per-video padding compute). Default: on when "
                             "the host has >= 4 cores — packing's continuous "
                             "decode-ahead wins there (measured +13-30%%) but "
                             "starves a 1-core host (measured; DESIGN.md)")
    parser.add_argument("--no_pack", dest="pack", action="store_false",
                        help="force per-video scoring")
    parser.add_argument("--use_reference", action="store_true", default=False,
                        help="load the published ImageNet-init reference "
                             "checkpoint from the local model cache "
                             "(weights positional is ignored; pass 'none')")
    parser.add_argument("--use_kinetics_reference", action="store_true",
                        default=False,
                        help="as --use_reference with the Kinetics-init model")
    parser.add_argument("-j", "--workers", default=None, type=int,
                        help="host decode threads per device scorer (the "
                             "reference's worker-process count; default "
                             "adapts to the host core count)")
    # accepted for reference CLI compatibility; the reference parses these
    # but never uses them at test time (ssn_test.py:23,29 — input size comes
    # from the model)
    parser.add_argument("--aug_ratio", type=float, default=0.5,
                        help=argparse.SUPPRESS)
    parser.add_argument("--input_size", type=int, default=224,
                        help=argparse.SUPPRESS)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    # int8 defaults ON where supported (BNInception, InceptionV3): the
    # e2e-quantized backbone is the sanctioned throughput path, with its
    # detection-metric delta bounded end-to-end (tests/test_int8.py, DESIGN.md)
    from ..models.backbones.quantize import (int8_support_error,
                                             supports_int8,
                                             supports_shared_stem)

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

    # shared-stem: default ON where wired (int8-e2e, 10 device crops) — the
    # on-chip probe measured 31.48 -> 26.21 ms/step (1.20x, fused-score
    # cosine 0.999984 / rel 0.006 at production geometry;
    # scripts/sharedstem_probe.py), and accuracy is bounded end-to-end in
    # tests/test_sharedstem.py + the reference-parity arm in
    # tests/test_reference_pipeline.py. --no_shared_stem opts out.
    use_shared = (args.shared_stem if args.shared_stem is not None
                  else (use_int8 and args.int8_mode == "e2e"
                        and args.test_crops == 10
                        and supports_shared_stem(args.arch)))
    if use_shared and not (use_int8 and args.int8_mode == "e2e"
                           and args.test_crops == 10
                           and supports_shared_stem(args.arch)):
        raise SystemExit("--shared_stem requires int8-e2e, 10 test crops, "
                         f"and a wired backbone (got arch={args.arch}, "
                         f"int8={use_int8}/{args.int8_mode}, "
                         f"crops={args.test_crops})")

    import jax

    from ..config import get_configs
    from ..data.pipeline import DirectoryFrameProvider, SyntheticFrameProvider
    from ..data.ssn_dataset import SSNDataset
    from ..infer.scorer import ProposalScorer, dump_scores_pickle, score_videos
    from ..models import SSN
    from ..models.backbones import get_backbone
    from ..train import load_checkpoint

    cfg = get_configs(args.dataset)

    model = SSN(num_class=cfg.num_class, modality=args.modality,
                base_model=args.arch, dropout=0.0,
                with_regression=not args.no_regression, stpp_cfg=cfg.stpp)
    _, _, spec = get_backbone(args.arch, args.modality)

    weights = args.weights
    if args.use_reference or args.use_kinetics_reference:
        # published reference model resolved through the local cache
        # (ssn_test.py:119-125; model_zoo.load_url replaced by the offline
        # cache since this environment has no egress)
        from ..config import resolve_reference_checkpoint

        weights = resolve_reference_checkpoint(
            args.dataset, args.modality,
            "ImageNet" if args.use_reference else "Kinetics", args.arch)
        print(f"using reference model: {weights}")
    if weights.endswith((".pth", ".pth.tar", ".pt")):
        # reference torch checkpoint: convert on the fly
        from ..models.convert import (convert_torch_ssn_checkpoint,
                                      load_torch_checkpoint)

        ck = convert_torch_ssn_checkpoint(load_torch_checkpoint(weights),
                                          arch=args.arch)
    else:
        ck = load_checkpoint(weights)
    params = ck["params"]
    batch_stats = ck["batch_stats"] or None
    reg_stats = ck.get("reg_stats")

    test_prop_file = os.path.join(args.prop_file_dir,
                                  f"{cfg.test_list}_proposal_list.txt")
    dataset = SSNDataset(test_prop_file, cfg.sampling,
                         new_length=model.resolved_new_length,
                         test_interval=args.frame_interval)

    if args.synthetic_data:
        provider = SyntheticFrameProvider(modality=args.modality)
    else:
        tmpl = ("img_{:05d}.jpg" if args.modality in ("RGB", "RGBDiff")
                else args.flow_pref + "{}_{:05d}.jpg")
        provider = DirectoryFrameProvider(args.data_root, tmpl, args.modality)

    calibration_frames = None
    if use_int8:
        from ..data.pipeline import (collect_calibration_frames,
                                     make_test_transform)

        transform = make_test_transform(spec.input_size, spec.scale_size,
                                        args.test_crops)
        # None (every sampled video empty) falls back to the scorer's lazy
        # first-chunk calibration — and if nothing has ticks, nothing is
        # scored either
        calibration_frames = collect_calibration_frames(
            dataset, provider, transform,
            new_length=model.resolved_new_length)

    # calibration + weight quantization runs ONCE; the other devices' scorers
    # reuse the quantized tree (byte-identical inputs -> byte-identical
    # output, and on the remote-compile environment each extra calibration
    # pays a model-sized compile + first-execution). score_videos calls the
    # factory from one worker thread per device, so the first-calibrator
    # election takes a lock.
    import threading

    shared_quantized = {}
    quant_lock = threading.Lock()

    def make_scorer(device, prequantized):
        return ProposalScorer(model, params, batch_stats, spec,
                              reg_stats=reg_stats, num_class=cfg.num_class,
                              stpp_cfg=cfg.stpp, test_crops=args.test_crops,
                              chunk_frames=args.test_batchsize,
                              modality=args.modality,
                              device=device,
                              with_regression=not args.no_regression,
                              quantize=args.int8_mode if use_int8 else False,
                              calibration_frames=calibration_frames,
                              decode_threads=args.workers,
                              shared_stem=use_shared,
                              prequantized=prequantized)

    def scorer_factory(device):
        if not use_int8:
            return make_scorer(device, None)
        with quant_lock:
            if "tree" not in shared_quantized:
                scorer = make_scorer(device, None)
                # export is None only when calibration_frames was None,
                # i.e. EVERY video in the dataset has zero ticks — then no
                # scorer ever scores a chunk, so nobody lazily calibrates
                # and sharing None is moot
                shared_quantized["tree"] = scorer.export_quantized()
                return scorer
            prequant = shared_quantized["tree"]
        return make_scorer(device, prequant)

    n = len(dataset.video_list)
    if args.max_num > 0:
        n = min(n, args.max_num)
    t0 = time.time()
    from ..parallel import select_devices

    # pack default adapts to the host: cross-video packing saves ~chunk/2
    # padded ticks per video and wins on multi-core hosts (+13-30% measured),
    # but its continuous decode-ahead starves a 1-core host's consumer
    # thread (measured + instrumented, DESIGN.md "pack decision")
    use_pack = (args.pack if args.pack is not None
                else (os.cpu_count() or 1) >= 4)
    results = score_videos(scorer_factory, dataset, provider,
                           indices=range(n),
                           devices=select_devices(args.devices),
                           keep_raw=args.save_raw_scores is not None,
                           progress=True, pack=use_pack)
    dt = time.time() - t0
    print(f"scored {len(results)} videos in {dt:.1f}s "
          f"({dt / max(len(results), 1):.3f} sec/video)")
    dump_scores_pickle(results, args.save_scores, raw_path=args.save_raw_scores)
    print(f"scores saved to {args.save_scores}")


if __name__ == "__main__":
    main()
