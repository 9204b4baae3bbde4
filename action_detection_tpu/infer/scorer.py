"""Proposal scorer: the throughput-critical dense-scoring inference path.

Behavioral parity target: /root/reference/ssn_test.py:55-96 + the reorganized
STPP (ops/ssn_ops.py:82-170). Structure preserved, machinery redesigned:

* The CNN runs once per sampled frame; all proposals are scored by pooling
  the shared per-frame score matrix (linear-head commutation).
* One jitted scorer per (chunk-size) bucket: frame chunks are padded to a
  static shape, so XLA compiles a handful of programs regardless of video
  length. 10 crops ride the leading batch dim and are mean-reduced on device.
* Proposal pooling pads the proposal axis to power-of-2 buckets and runs the
  cumsum-gather STPP entirely on device.
* Videos are independent — multi-device inference shards the video queue per
  device (see score_videos), the reference's process-per-GPU pattern without
  processes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import (iter_scaled_frame_chunks, iter_test_frame_batches,
                             iter_windowed_decode, make_decode_pool,
                             make_test_transform, pad_chunk_ticks)
from ..data.ssn_dataset import SSNDataset, TestSample
from ..data.transforms import (Compose, GroupScale, device_oversample_normed,
                               preprocess_frames)
from ..models.backbones import InputSpec
from ..models.ssn import SSN, fuse_test_heads
from ..ops.stpp import (ReorganizedScoreLayout, StppConfig,
                        reference_part_bounds, reorganized_stpp_pool)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_bucket(n: int, lo: int = 32) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class ScoredVideo:
    """Per-video inference result (the reference's result-queue tuple)."""
    video_id: str
    rel_props: np.ndarray     # (P, 2)
    act_scores: np.ndarray    # (P, K+1)
    comp_scores: np.ndarray   # (P, K)
    reg_scores: Optional[np.ndarray]   # (P, K, 2) denormalized
    raw_scores: Optional[np.ndarray] = None   # (T, D_out) fused frame scores

    def as_tuple(self):
        return (self.rel_props, self.act_scores, self.comp_scores,
                self.reg_scores)


class ProposalScorer:
    """Stateful scorer holding fused weights and jitted per-bucket programs."""

    def __init__(self, model: SSN, params, batch_stats, input_spec: InputSpec,
                 reg_stats: Optional[np.ndarray] = None,
                 num_class: Optional[int] = None,
                 stpp_cfg=(1, 1, 1), test_crops: int = 10,
                 chunk_frames: int = 32,
                 modality: str = "RGB",
                 device=None,
                 with_regression: bool = True,
                 quantize: bool = False,
                 calibration_frames: Optional[np.ndarray] = None,
                 device_crops: Optional[bool] = None,
                 decode_threads: Optional[int] = None,
                 shared_stem: Optional[bool] = None,
                 prequantized=None):
        self.model = model
        self.input_spec = input_spec
        self.test_crops = test_crops
        self.chunk_frames = chunk_frames
        self.modality = modality
        self.reg_stats = np.asarray(reg_stats) if reg_stats is not None else None
        if with_regression and self.reg_stats is None:
            # the reference fails up front on a checkpoint without reg_stats
            # (ssn_test.py:129); silently emitting NORMALIZED regression
            # scores would shift every detection boundary downstream
            raise ValueError(
                "with_regression=True requires reg_stats (the checkpoint's "
                "regression-target normalization); pass with_regression=False "
                "to score without boundary regression")
        self.num_class = num_class or model.num_class
        self.with_regression = with_regression
        self.device = device or jax.devices()[0]
        # 10-crop oversample on device: host ships one scale-size frame per
        # tick instead of 10 crops (~6-10x less PCIe on the hot path)
        if device_crops is None:
            device_crops = test_crops == 10
        self.device_crops = device_crops and test_crops == 10
        # the pool feeds iter_scaled_frame_chunks / score_video_pack, both
        # device-crops-only paths (iter_test_frame_batches takes no executor)
        self._decode_pool = (make_decode_pool(decode_threads)
                             if self.device_crops else None)
        # shared-stem 10-crop scoring: the stem runs per frame+flip instead
        # of per crop (~2.9x less stem conv work; approximate — crop offsets
        # snap to the stride-8 trunk grid, bounded end-to-end like int8 in
        # tests/test_sharedstem.py). int8-e2e + device-crops only.
        from ..models.backbones.quantize import supports_shared_stem
        can_share = (self.device_crops
                     and supports_shared_stem(model.base_model))
        self.shared_stem = bool(shared_stem) and can_share
        if shared_stem and not can_share:
            raise ValueError(
                "shared_stem requires device 10-crop oversampling and a "
                f"supported backbone (got {model.base_model!r}, "
                f"device_crops={self.device_crops})")

        kernel, bias = fuse_test_heads(params, self.num_class, stpp_cfg,
                                       with_regression=with_regression)
        self._quantize_mode = ({False: None, None: None, True: "e2e"}
                               .get(quantize, quantize))
        if self._quantize_mode not in (None, "e2e", "perlayer"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if self._quantize_mode:
            # quantized traces never touch the float backbone (and lazy
            # calibration runs from a host copy), so don't ship the dead
            # ~40-95MB backbone tree to every fan-out device
            variables = {"params": {k: p for k, p in params.items()
                                    if k != "backbone"}}
            slim_stats = {k: s for k, s in (batch_stats or {}).items()
                          if k != "backbone"}
            if slim_stats:
                variables["batch_stats"] = slim_stats
        self._variables = jax.device_put(variables, self.device)
        self._kernel = jax.device_put(kernel, self.device)
        self._bias = jax.device_put(bias, self.device)

        self.stpp = StppConfig.from_raw(stpp_cfg)
        K = self.num_class
        self.layout = ReorganizedScoreLayout(
            act_len=K + 1, comp_len=K, reg_len=2 * K,
            feat_multiplier=self.stpp.feat_multiplier,
            with_regression=with_regression)

        # optional int8 quantized backbone (BNInception + InceptionV3; see
        # models/backbones/quantize.py). Two modes:
        # * "e2e" (default; quantize=True maps here): int8 activations
        #   end-to-end, per-conv output scales folded into consumer weights —
        #   the sanctioned 5x path (36.1 vs 37.8 ms per 640-image step,
        #   scripts/int8e2e_probe.py), detection-metric-bounded in
        #   tests/test_int8.py.
        # * "perlayer": dequant/requant around each conv, dynamic scales
        #   possible without calibration.
        # e2e needs calibration; without calibration_frames it lazily
        # calibrates on the first scored chunk. (The mode itself is resolved
        # above, before the device variables are built.)
        if self.shared_stem and self._quantize_mode != "e2e":
            raise ValueError("shared_stem is only wired for the int8-e2e "
                             f"backbone (quantize={quantize!r})")
        self._quantized = None
        self._act_scales = None
        self._qp = None
        if prequantized is not None and not self._quantize_mode:
            raise ValueError("prequantized requires quantize to be set")
        if self._quantize_mode:
            from ..models.backbones.quantize import (calibrate_e2e_backbone,
                                                     int8_support_error,
                                                     supports_int8)

            if not supports_int8(model.base_model, self._quantize_mode):
                raise ValueError(int8_support_error(model.base_model,
                                                    self._quantize_mode))
            from ..models.backbones.bn_inception_int8 import (
                calibrate_activation_scales, quantize_backbone)

            if prequantized is not None:
                # quantized tree exported by a sibling scorer
                # (export_quantized): calibration ran once for the whole
                # device fan-out; device_put re-pins it here
                q, scales = prequantized
                self._quantized = jax.device_put(q, self.device)
                if scales is not None:
                    self._act_scales = jax.device_put(scales, self.device)
            elif self._quantize_mode == "e2e":
                qp = (jax.device_get(params["backbone"]),
                      jax.device_get((batch_stats or {}).get("backbone", {})))
                if calibration_frames is not None:
                    sample = jax.jit(self._prep_calibration)(
                        jnp.asarray(calibration_frames))
                    try:
                        self._quantized = jax.device_put(
                            calibrate_e2e_backbone(model.base_model, *qp,
                                                   sample), self.device)
                    except (TypeError, ValueError) as e:
                        # shape errors only (XLA raises TypeError on the
                        # pool-vs-conv concat mismatch odd dims produce):
                        # surface the calibration-frame contract; anything
                        # else (missing params, compile failures) propagates
                        # untranslated
                        cs = self.input_spec.input_size
                        raise ValueError(
                            "int8 calibration failed on frames of shape "
                            f"{np.asarray(calibration_frames).shape}; "
                            f"calibration frames should be crop-shaped "
                            f"({cs}x{cs}) or scale-size (> crop in both "
                            f"dims) for this backbone") from e
                else:
                    # lazy first-chunk calibration needs the float params;
                    # _score_chunk drops them once it has calibrated
                    self._qp = qp
            else:
                quantized = quantize_backbone(
                    jax.device_get(params["backbone"]),
                    jax.device_get((batch_stats or {}).get("backbone", {})))
                self._quantized = jax.device_put(quantized, self.device)
                if calibration_frames is not None:
                    sample = jax.jit(self._prep_calibration)(
                        jnp.asarray(calibration_frames))
                    self._act_scales = jax.device_put(
                        calibrate_activation_scales(quantized, sample),
                        self.device)

        self._score_chunk_jit = jax.jit(self._score_chunk_impl,
                                        static_argnames=("n_stacks",))
        # num_frames is a traced device scalar and the frame axis is bucketed
        # to powers of two, so pooling compiles O(log) programs total instead
        # of one per distinct video length
        self._pool_jit = jax.jit(self._pool_impl)
        # pack-mode row scatter: per-video matrices gathered on device from
        # the concatenated chunk scores (idx rows past the end hit an
        # appended zero row — the per-video zero padding)
        self._gather_rows_jit = jax.jit(
            lambda scores, idx: jnp.concatenate(
                [scores, jnp.zeros((1, scores.shape[1]), scores.dtype)],
                axis=0)[idx])

    def export_quantized(self):
        """Quantized tree for a sibling scorer's ``prequantized=``.

        Returns ``(quantized, act_scales)`` host trees, or None when
        quantization hasn't run yet (lazy mode before the first chunk).
        Calibration is deterministic in its inputs, so sharing the export
        across devices is byte-identical to recalibrating — and skips a
        model-sized compile + first execution per extra device.
        """
        if self._quantized is None:
            return None
        scales = (jax.device_get(self._act_scales)
                  if self._act_scales is not None else None)
        return jax.device_get(self._quantized), scales

    @property
    def needs_lazy_calibration(self) -> bool:
        """True while this scorer would calibrate on its next scored chunk
        (e2e quantize mode, no calibration_frames / prequantized yet)."""
        return self._quantize_mode == "e2e" and self._quantized is None

    def install_prequantized(self, export) -> None:
        """Adopt a sibling scorer's ``export_quantized()`` tree.

        Used by ``score_videos`` to share the first lazy calibration across
        the device fan-out: per-device first-chunk calibration would give
        each device its own activation scales (device-dependent scores).
        """
        if not self._quantize_mode:
            raise ValueError("install_prequantized requires quantize mode")
        q, scales = export
        self._quantized = jax.device_put(q, self.device)
        if scales is not None:
            self._act_scales = jax.device_put(scales, self.device)
        self._qp = None

    def close(self) -> None:
        """Shut down the decode thread pool (idempotent)."""
        if self._decode_pool is not None:
            self._decode_pool.shutdown(wait=False)
            self._decode_pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --- device programs ---

    def _score_chunk_impl(self, variables, kernel, bias, quantized, act_scales,
                          frames_u8, n_stacks: int):
        """uint8 frames -> (n_stacks_padded, D) crop-mean fused scores.

        ``frames_u8`` is ``(crops*n_stacks, crop, crop, C)`` host-cropped, or
        ``(n_stacks, H_scale, W_scale, C)`` when ``device_crops`` — the 10-crop
        oversample then happens here, on device.

        Weights are jit ARGUMENTS, never closure captures: a closed-over
        device array is baked into the program as an embedded constant, and
        (measured on the axon plugin) an executable with ~25MB of embedded
        constants degrades every subsequent host->device transfer in the
        process from ~11ms to ~450ms.

        Crops are mean-reduced on *features* before the fused FC — identical
        by linearity, and ~3% faster measured on chip (fewer FC rows).
        """
        if self.shared_stem and quantized is not None:
            # stem per frame+flip; crop windows sliced on the trunk-input
            # grid (see bninception_int8_e2e_features_sharedstem)
            from ..data.transforms import device_normed_pair
            from ..models.backbones.quantize import (
                int8_e2e_features_sharedstem)

            xn, flip_src = device_normed_pair(
                frames_u8, self.input_spec, self.modality,
                self.model.resolved_new_length)
            feats = int8_e2e_features_sharedstem(
                self.model.base_model, quantized, xn, flip_src,
                self.input_spec.input_size)
            feats = feats.reshape(self.test_crops, n_stacks, -1).mean(axis=0)
            return jnp.matmul(feats, kernel,
                              precision=jax.lax.Precision.HIGHEST) + bias
        if self.device_crops:
            # normalize the N scale-size frames, THEN cut the 10 crops:
            # elementwise normalization commutes exactly with crop/flip, and
            # touching 5.8x fewer pixels measured 1.5-2 ms/step faster
            # (scripts/fullstep_probe.py; bit-identical output). int8 keeps
            # f32 normalization so input quantization rounds exact values.
            x = device_oversample_normed(
                frames_u8, self.input_spec, self.modality,
                self.model.resolved_new_length,
                dtype=None if quantized is not None else self.model.dtype)
        else:
            x = preprocess_frames(frames_u8, self.input_spec, self.modality,
                                  self.model.resolved_new_length)
        if quantized is not None:
            if self._quantize_mode == "e2e":
                from ..models.backbones.quantize import int8_e2e_features

                feats = int8_e2e_features(self.model.base_model, quantized, x)
            else:
                from ..models.backbones.bn_inception_int8 import (
                    bninception_int8_features)

                feats = bninception_int8_features(quantized, x,
                                                  act_scales=act_scales)
        else:
            feats = self.model.apply(variables, x, method=SSN.features)
        feats = feats.reshape(self.test_crops, n_stacks, -1).mean(axis=0)
        return jnp.matmul(feats, kernel,
                          precision=jax.lax.Precision.HIGHEST) + bias

    def _prep_calibration(self, frames):
        """Normalized CROP-shaped frames for quantization calibration.

        The backbone (like the reference's Caffe-semantics original) needs
        conv/pool-consistent spatial dims — crops (224^2) qualify, raw
        scale-size frames (odd after rescale, e.g. 256x340) do not: a
        stride-2 module's ceil-mode pool branch and its stride-2 convs
        disagree on odd dims (found by driving the real path — a direct
        backbone call on scale frames crashes in inception_3c/4e). So
        calibration always looks at what the backbone actually sees: for
        scale-size inputs, the first crop offset's normal+flip groups (flip
        matters for Flow's inverted planes); crop-shaped inputs pass through.
        """
        cs = self.input_spec.input_size
        H, W = frames.shape[1], frames.shape[2]
        if H >= cs and W >= cs and not (H == cs and W == cs):
            crops = device_oversample_normed(frames, self.input_spec,
                                             self.modality,
                                             self.model.resolved_new_length)
            return crops[: 2 * frames.shape[0]]
        # crop-shaped, or at least one dim at/below the crop size
        # (oversampling needs both dims > cs or its offsets go negative).
        # Center-crop any OVERSIZED dim so a mixed case like (200, 340)
        # reaches the backbone as (200, 224) instead of raw scale width —
        # slicing only dims > cs never reads out of bounds; genuinely tiny
        # geometries (test backbones) pass through unchanged. NOTE: a dim
        # below the crop size that is pool-inconsistent for the real
        # backbone (e.g. 200 for BNInception) still raises — the ctor
        # translates that into the calibration-frame-contract error.
        if H > cs:
            o = (H - cs) // 2
            frames = frames[:, o:o + cs]
        if W > cs:
            o = (W - cs) // 2
            frames = frames[:, :, o:o + cs]
        return preprocess_frames(frames, self.input_spec, self.modality,
                                 self.model.resolved_new_length)

    def _score_chunk(self, frames_u8, n_stacks: int):
        if self._quantize_mode == "e2e" and self._quantized is None:
            # lazy calibration on the first real chunk; jitted so the
            # normalize is one compile, not per-op
            from ..models.backbones.quantize import calibrate_e2e_backbone

            sample = jax.jit(self._prep_calibration)(frames_u8)
            self._quantized = jax.device_put(
                calibrate_e2e_backbone(self.model.base_model, *self._qp,
                                       sample), self.device)
            self._qp = None    # host float-param copy only feeds calibration
        return self._score_chunk_jit(self._variables, self._kernel, self._bias,
                                     self._quantized, self._act_scales,
                                     frames_u8, n_stacks=n_stacks)

    def _pool_impl(self, frame_scores, prop_ticks, prop_scaling, num_frames,
                   reg_stats, part_bounds):
        # measured on chip (r2): the XLA cumsum+gather pool is dispatch-bound
        # at ~20-27us for every realistic (T, P); a hand Pallas kernel lost at
        # all sizes (26-56us) and was deleted -- the pool is ~2% of a step
        act, comp, reg = reorganized_stpp_pool(frame_scores, prop_ticks,
                                               prop_scaling, self.layout,
                                               self.stpp,
                                               num_frames=num_frames,
                                               part_bounds=part_bounds)
        if reg is not None and reg_stats is not None:
            reg = reg.reshape(-1, self.num_class, 2)
            reg = reg * reg_stats[1] + reg_stats[0]
        return act, comp, reg

    def _pool(self, frame_scores, prop_ticks, prop_scaling, num_frames):
        stats = (jnp.asarray(self.reg_stats, jnp.float32)
                 if self.reg_stats is not None else None)
        # part bounds ride the reference's float64 arange pipeline on HOST
        # (bit parity; no in-graph formula reproduces arange accumulation) —
        # ticks are host data anyway, this costs one small extra transfer
        pl, pr = reference_part_bounds(np.asarray(prop_ticks), self.stpp)
        return self._pool_jit(frame_scores, prop_ticks, prop_scaling,
                              num_frames, stats, (pl, pr))

    # --- host orchestration ---

    def _empty_scored(self, sample: TestSample,
                      keep_raw: bool = False) -> ScoredVideo:
        """Zero-score result for a video with no frame ticks.

        A video with ``num_frames <= new_length`` yields an empty tick array
        (data/ssn_dataset.py:372) — reachable on real THUMOS shorts with
        Flow's new_length=5. The reference's SSN path would crash here too;
        the binary harness's empty-entry behavior (binary_test.py:84-94 via
        our cli/binary_test.py) is the model: emit zeros and continue.
        """
        P = sample.prop_ticks.shape[0]
        K = self.num_class
        D = self.layout.total_cols
        return ScoredVideo(
            video_id=sample.video_id, rel_props=sample.rel_props,
            act_scores=np.zeros((P, K + 1), np.float32),
            comp_scores=np.zeros((P, K), np.float32),
            reg_scores=(np.zeros((P, K, 2), np.float32)
                        if self.with_regression else None),
            raw_scores=np.zeros((0, D), np.float32) if keep_raw else None)

    def score_video(self, sample: TestSample, provider,
                    keep_raw: bool = False) -> ScoredVideo:
        """Score every sampled frame, pool per proposal, denormalize regression."""
        if len(sample.frame_ticks) == 0:
            return self._empty_scored(sample, keep_raw=keep_raw)
        if self.device_crops:
            # host only decodes+rescales (in parallel); crops are cut on device
            chunks = iter_scaled_frame_chunks(
                provider, sample.video_id, sample.frame_ticks,
                sample.num_frames, self.input_spec.scale_size,
                new_length=self.model.resolved_new_length,
                batch_ticks=self.chunk_frames, executor=self._decode_pool)
            host_crops = 1
        else:
            transform = make_test_transform(self.input_spec.input_size,
                                            self.input_spec.scale_size,
                                            self.test_crops)
            chunks = iter_test_frame_batches(
                provider, sample.video_id, sample.frame_ticks,
                sample.num_frames, transform,
                new_length=self.model.resolved_new_length,
                batch_ticks=self.chunk_frames)
            host_crops = self.test_crops
        T = len(sample.frame_ticks)
        # bucket the padded frame axis to powers of two (few compiled shapes)
        T_padded = _pow2_bucket(_round_up(max(T, 1), self.chunk_frames),
                                lo=self.chunk_frames)
        out_chunks = []
        filled = 0
        for chunk in chunks:
            n_stacks_real = chunk.shape[0] // host_crops
            chunk = pad_chunk_ticks(chunk, host_crops, self.chunk_frames)
            scores = self._score_chunk(jax.device_put(chunk, self.device),
                                       n_stacks=self.chunk_frames)
            out_chunks.append(scores)
            filled += n_stacks_real
        assert filled == T, (filled, T)

        frame_scores = jnp.concatenate(out_chunks, axis=0)
        if frame_scores.shape[0] < T_padded:
            frame_scores = jnp.pad(frame_scores,
                                   ((0, T_padded - frame_scores.shape[0]), (0, 0)))
        return self._pool_video(sample, frame_scores, T, keep_raw=keep_raw)

    def _pool_video(self, sample: TestSample, frame_scores, T: int,
                    keep_raw: bool = False) -> ScoredVideo:
        """Pool one video's (T_padded, D) frame-score matrix into proposal scores."""
        P = sample.prop_ticks.shape[0]
        P_padded = _pow2_bucket(P)
        ticks = np.zeros((P_padded, 4), dtype=np.int64)
        ticks[:P] = sample.prop_ticks
        scal = np.zeros((P_padded, 2), dtype=np.float32)
        scal[:P] = sample.prop_scaling

        # ticks/scal stay host numpy into _pool: the part bounds are computed
        # from them on host, and jit places them on frame_scores' device
        act, comp, reg = self._pool(jnp.asarray(frame_scores), ticks, scal,
                                    jnp.asarray(T, jnp.int32))
        act = np.asarray(act)[:P]
        comp = np.asarray(comp)[:P]
        reg_out = np.asarray(reg)[:P] if reg is not None else None
        return ScoredVideo(video_id=sample.video_id,
                           rel_props=sample.rel_props,
                           act_scores=act, comp_scores=comp, reg_scores=reg_out,
                           raw_scores=np.asarray(frame_scores)[:T] if keep_raw else None)

    def score_video_pack(self, samples, provider,
                         keep_raw: bool = False) -> "list[ScoredVideo]":
        """Score several videos with cross-video tick packing.

        ``score_video`` pads each video's tick count up to a multiple of
        ``chunk_frames`` — on THUMOS-length videos that wastes ~chunk/2 of
        backbone compute per video; short clips waste more. Every row of the
        device program is independent (per-image CNN in eval mode; the
        10-crop oversample and crop-mean stay within a row), so ticks from
        different videos can share one fixed-size chunk: the pack pays
        chunk/2 padding ONCE. Outputs are identical to per-video scoring
        (tested). Videos whose scaled frames differ in shape are packed per
        shape group. Falls back to per-video scoring on the host-crop path
        (its crop-major chunk layout is per-video).
        """
        if not self.device_crops:
            return [self.score_video(s, provider, keep_raw=keep_raw)
                    for s in samples]

        from ..data.pipeline import load_scaled_stack

        scale = GroupScale(self.input_spec.scale_size)
        new_length = self.model.resolved_new_length

        def load_one(sample, tick) -> np.ndarray:
            return load_scaled_stack(provider, sample.video_id, tick,
                                     sample.num_frames, scale, new_length)

        jobs = [(si, row, tick)
                for si, s in enumerate(samples)
                for row, tick in enumerate(s.frame_ticks)]
        decoded = iter_windowed_decode(
            jobs, lambda job: load_one(samples[job[0]], job[2]),
            self._decode_pool, window=4 * self.chunk_frames)

        # per-shape packing buffers; flush a chunk when full
        buffers: "dict[tuple, list]" = {}
        pending = []                      # (scores_dev, [(si, row), ...])
        for (si, row, tick), arr in zip(jobs, decoded):
            buf = buffers.setdefault(arr.shape, [])
            buf.append((si, row, arr))
            if len(buf) == self.chunk_frames:
                chunk = np.stack([a for _, _, a in buf])
                scores = self._score_chunk(
                    jax.device_put(chunk, self.device),
                    n_stacks=self.chunk_frames)
                pending.append((scores, [(s_, r_) for s_, r_, _ in buf]))
                buffers[arr.shape] = []
        for shape, buf in buffers.items():          # flush partials, padded
            if not buf:
                continue
            pad = self.chunk_frames - len(buf)
            chunk = np.stack([a for _, _, a in buf])
            chunk = np.pad(chunk, ((0, pad),) + ((0, 0),) * (chunk.ndim - 1))
            scores = self._score_chunk(jax.device_put(chunk, self.device),
                                       n_stacks=self.chunk_frames)
            pending.append((scores, [(s_, r_) for s_, r_, _ in buf]))

        # scatter chunk rows back into per-video score matrices ON DEVICE: a
        # gather with host-computed indices. The previous host scatter fetched
        # every chunk's scores and re-shipped each assembled matrix — small
        # transfers, but through a degraded channel each pays a ~32 ms floor
        # (DESIGN.md), which made --pack LOSE on the harness (3.2 vs 1.7 s)
        # while winning on healthy hosts; device gather removes them all.
        if not pending:
            return [self._empty_scored(s, keep_raw=keep_raw) for s in samples]
        all_scores = jnp.concatenate([sc for sc, _ in pending], axis=0)
        row_of = {}
        for ci, (_, mapping) in enumerate(pending):
            for r, key in enumerate(mapping):
                row_of[key] = ci * self.chunk_frames + r
        zero_row = all_scores.shape[0]      # index of the appended zero row
        outs = []
        for si, s in enumerate(samples):
            T = len(s.frame_ticks)
            if T == 0:
                outs.append(self._empty_scored(s, keep_raw=keep_raw))
                continue
            T_padded = _pow2_bucket(_round_up(T, self.chunk_frames),
                                    lo=self.chunk_frames)
            idx = np.full(T_padded, zero_row, np.int32)
            for row in range(T):
                idx[row] = row_of[(si, row)]
            mat = self._gather_rows_jit(all_scores, jnp.asarray(idx))
            outs.append(self._pool_video(s, mat, T, keep_raw=keep_raw))
        return outs


def make_sharded_frame_scorer(model: SSN, variables, kernel, bias,
                              input_spec: InputSpec, mesh,
                              modality: str = "RGB"):
    """Frame-axis-sharded dense scorer for very long videos.

    The reference bounds long videos with streaming generators
    (SURVEY.md §5.7); here a single video's frame batch can instead be
    sharded across the mesh's data axis — each device scores its slice of
    frames and XLA gathers the score matrix for pooling. Returns a jitted
    ``frames_u8 (N, H, W, C) -> scores (N, D)`` with N sharded.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    in_sharding = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    # weights as jit arguments (replicated), not closure captures — see
    # _score_chunk_impl on embedded-constant transfer degradation
    def fn(variables, kernel, bias, frames_u8):
        x = preprocess_frames(frames_u8, input_spec, modality,
                              model.resolved_new_length)
        return model.apply(variables, x, kernel, bias, method=SSN.score_frames)

    jfn = jax.jit(fn, in_shardings=(rep, rep, rep, in_sharding),
                  out_shardings=rep)
    return lambda frames_u8: jfn(variables, kernel, bias, frames_u8)


def score_videos(scorer_factory, dataset: SSNDataset, provider,
                 indices: Optional[Iterable[int]] = None,
                 devices=None, keep_raw: bool = False,
                 progress: bool = False,
                 pack: bool = False) -> Dict[str, ScoredVideo]:
    """Fan videos out over local devices (independent work, no collectives).

    ``scorer_factory(device)`` builds a ProposalScorer pinned to a device.
    With ``pack=True`` each device scores its videos in cross-video packed
    chunks (``score_video_pack``) in groups of ~16 videos — identical scores,
    less padding compute.
    """
    import queue
    import threading

    devices = devices or jax.devices()
    indices = list(indices if indices is not None else range(len(dataset.video_list)))
    work: "queue.Queue" = queue.Queue()
    if pack:
        group = 16          # bounds host memory for the per-pack score matrices
        for lo in range(0, len(indices), group):
            work.put(indices[lo: lo + group])
    else:
        for i in indices:
            work.put(i)
    results: Dict[str, ScoredVideo] = {}
    errors = []
    lock = threading.Lock()
    # lazy-calibration election: scorers built without calibration_frames
    # calibrate int8 scales on their first scored chunk — per device that
    # would mean per-device scales and device-dependent scores, so the first
    # worker to calibrate publishes its export and every other scorer
    # installs it before scoring anything
    calib_lock = threading.Lock()
    shared_export = {"tree": None}

    def worker(device, prebuilt=None):
        scorer = prebuilt
        if scorer is None:
            try:
                scorer = scorer_factory(device)
            except Exception as e:  # propagate, don't hang the collection
                with lock:
                    errors.append(e)
                return
        try:
            _drain(scorer, device)
        finally:
            scorer.close()

    def _score_one(scorer, idx):
        if pack:
            samples = [dataset.get_test_sample(i) for i in idx]
            return scorer.score_video_pack(samples, provider,
                                           keep_raw=keep_raw)
        sample = dataset.get_test_sample(idx)
        return [scorer.score_video(sample, provider, keep_raw=keep_raw)]

    def _drain(scorer, device):
        while True:
            try:
                idx = work.get_nowait()
            except queue.Empty:
                return
            try:
                if scorer.needs_lazy_calibration:
                    # adopt a published export without holding the lock
                    # through scoring (that would serialize every worker's
                    # first video behind one scorer)
                    with calib_lock:
                        if shared_export["tree"] is not None:
                            scorer.install_prequantized(shared_export["tree"])
                if scorer.needs_lazy_calibration:
                    with calib_lock:
                        if shared_export["tree"] is not None:
                            # a competitor published while we waited
                            scorer.install_prequantized(shared_export["tree"])
                            outs = _score_one(scorer, idx)
                        else:
                            # this worker calibrates (serialized: until an
                            # export exists, a concurrent score would
                            # calibrate its own scales). A zero-tick video
                            # scores no chunk and leaves the export unset —
                            # the election then stays open.
                            outs = _score_one(scorer, idx)
                            shared_export["tree"] = scorer.export_quantized()
                else:
                    outs = _score_one(scorer, idx)
            except Exception as e:
                with lock:
                    errors.append(e)
                return
            with lock:
                for out in outs:
                    results[out.video_id] = out
                    if progress:
                        print(f"scored {out.video_id} "
                              f"({len(results)}/{len(indices)})", flush=True)

    # build the first device's scorer up front; when it would lazily
    # calibrate AND the fan-out is multi-device, score work items on the
    # MAIN thread until an export exists. This makes the calibrating chunk
    # deterministic (always the first index), not whichever thread wins the
    # election lock — so scores are identical across device counts and runs.
    scorer0 = None
    try:
        scorer0 = scorer_factory(devices[0])
    except Exception as e:
        errors.append(e)
    if (scorer0 is not None and scorer0.needs_lazy_calibration
            and len(devices) > 1):
        while shared_export["tree"] is None and not errors:
            try:
                idx = work.get_nowait()
            except queue.Empty:
                break
            try:
                outs = _score_one(scorer0, idx)
            except Exception as e:
                errors.append(e)
                break
            for out in outs:
                results[out.video_id] = out
                if progress:
                    print(f"scored {out.video_id} "
                          f"({len(results)}/{len(indices)})", flush=True)
            # a zero-tick video scores no chunk and leaves the export unset:
            # keep going until a real chunk has calibrated
            shared_export["tree"] = scorer0.export_quantized()

    threads = [threading.Thread(target=worker,
                                args=(d, scorer0 if i == 0 else None))
               for i, d in enumerate(devices)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        # unlike the reference's daemon workers (a crash silently hangs the
        # result loop, SURVEY.md §5.3), failures surface to the caller
        raise errors[0]
    return results


def dump_scores_pickle(results: Dict[str, ScoredVideo], path: str,
                       raw_path: Optional[str] = None) -> None:
    """Reference-compatible pickle: {vid: (rel_props, act, comp, reg)}."""
    import pickle

    out = {vid: r.as_tuple() for vid, r in results.items()}
    with open(path, "wb") as f:
        pickle.dump(out, f, pickle.HIGHEST_PROTOCOL)
    if raw_path:
        raw = {vid: r.raw_scores for vid, r in results.items()}
        with open(raw_path, "wb") as f:
            pickle.dump(raw, f, pickle.HIGHEST_PROTOCOL)
