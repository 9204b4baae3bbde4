"""Shared-TRUNK 10-crop scoring probe — REJECTED lever (see DESIGN.md r4).

Measures the accuracy of running stem AND trunk once per frame+flip and
pooling crop features from the final stride-32 grid with fractional
ROIAlign-style weights. Verdict at production geometry: crop-mean cosine
0.9945-0.9950 / rel 0.14 vs the per-crop int8-e2e path -- ~10x worse than
shared-stem and above the deployed 0.12 fused-score bound, so the lever is
rejected (32-px offset snapping + receptive fields spanning far beyond the
crop after two stride-2 stages are structural, not tunable).

Runs stem AND trunk once per frame+flip on the full scale-size map, then
pools each crop's features from the FINAL stride-32 feature grid with
fractionally-weighted (ROIAlign-style) window averaging. Compares per-crop
and crop-mean feature agreement against the per-crop int8-e2e path at
production geometry (256x340 frames, 224 crops).
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from action_detection_tpu.data.transforms import (device_normed_pair,
                                                  device_oversample_normed,
                                                  fill_fix_offset)
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.bn_inception_int8 import (
    _E2EOps, _e2e_stem_quantized, _walk_trunk,
    bninception_int8_e2e_features, calibrate_e2e)


def sharedtrunk_features(qe, xn, flip_src, crop_size):
    N, H, W, _ = xn.shape
    stem = _e2e_stem_quantized(
        qe, jnp.concatenate([xn, jnp.flip(flip_src, axis=2)], axis=0))
    fh, fw = stem.shape[1], stem.shape[2]
    # trunk needs stride-2-consistent dims twice: pad right/bottom to /4
    ph = (-fh) % 4
    pw = (-fw) % 4
    stem = jnp.pad(stem, ((0, 0), (0, ph), (0, pw), (0, 0)))
    h = _walk_trunk(_E2EOps(qe), stem)           # (2N, Fh, Fw, C) int8
    hf = h.astype(jnp.float32) * qe["__feat_scale__"]
    Fh, Fw = hf.shape[1], hf.shape[2]
    stride = 32.0                                 # stem 8 x trunk 4

    def window_weights(start_px, length_px, n_cells):
        """Fractional overlap of [start, start+length) with each cell."""
        a, b = start_px / stride, (start_px + length_px) / stride
        w = np.zeros(n_cells)
        for j in range(n_cells):
            w[j] = max(0.0, min(b, j + 1) - max(a, j))
        return w / max(w.sum(), 1e-9)

    sn, sf = hf[:N], hf[N:]
    feats = []
    for o_w, o_h in fill_fix_offset(False, W, H, crop_size, crop_size):
        wy = jnp.asarray(window_weights(o_h, crop_size, Fh), jnp.float32)
        wx = jnp.asarray(window_weights(o_w, crop_size, Fw), jnp.float32)
        feats.append(jnp.einsum("nhwc,h,w->nc", sn, wy, wx))
        mwx = jnp.asarray(window_weights(W - crop_size - o_w, crop_size, Fw),
                          jnp.float32)
        feats.append(jnp.einsum("nhwc,h,w->nc", sf, wy, mwx))
    return jnp.stack(feats, axis=0).reshape(10 * N, -1)


def agreement(tag, ref, got, N):
    ref = np.asarray(ref, np.float64).reshape(10, N, -1)
    got = np.asarray(got, np.float64).reshape(10, N, -1)

    def cos(a, b):
        return float(np.dot(a.ravel(), b.ravel())
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    percrop = np.array([[cos(ref[c, n], got[c, n]) for n in range(N)]
                        for c in range(10)])
    rm, gm = ref.mean(0), got.mean(0)
    mean_cos = np.mean([cos(rm[n], gm[n]) for n in range(N)])
    mean_rel = float(np.linalg.norm(gm - rm) / (np.linalg.norm(rm) + 1e-12))
    print(f"{tag}: percrop cos min/mean {percrop.min():.5f}/{percrop.mean():.5f}"
          f"  crop-mean cos {mean_cos:.6f} rel {mean_rel:.5f}")


def frames_structured(N, H, W, seed):
    rng = np.random.RandomState(seed)
    t = rng.randint(0, 256, size=(N, H // 16 + 1, W // 16 + 1, 3))
    return t.repeat(16, axis=1).repeat(16, axis=2)[:, :H, :W].astype(np.uint8)


def main():
    H, W, cs, N = 256, 340, 224, 2
    backbone, _, spec = get_backbone("BNInception", "RGB")
    variables = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    for tag, frames in (
            ("random", np.random.RandomState(5).randint(
                0, 256, size=(N, H, W, 3), dtype=np.uint8)),
            ("tiles", frames_structured(N, H, W, 6))):
        crops = device_oversample_normed(jnp.asarray(frames), spec, "RGB", 1,
                                         crop_size=cs)
        qe = calibrate_e2e(variables["params"],
                           variables.get("batch_stats", {}), crops[:4])
        xn, flip_src = device_normed_pair(jnp.asarray(frames), spec, "RGB", 1)
        ref = bninception_int8_e2e_features(qe, crops)
        got = sharedtrunk_features(qe, xn, flip_src, cs)
        agreement(tag, ref, got, N)


if __name__ == "__main__":
    main()
