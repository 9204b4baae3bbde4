"""Probe: fold normalization into the hybrid bf16 stem (uint8 stem input).

The deployed shared-stem step materializes the normalized bf16 frames and
their flip concat ((2N, 256, 340, C) bf16) before the stem conv reads them —
the "prep" phase, ~3.4 ms of the 25.4 ms headline step (r4 prefix profile).
Normalization is affine per channel (xn[c] = a_c * x[p(c)] + b_c with the
BGR permutation p), and the stem conv is linear, so it can absorb it:

  conv_zeropad(xn, W) = conv_zeropad(x_u8, W_folded) + corr
     W_folded[..., p(c), o] = a_c * W[..., c, o]
     corr = conv_zeropad(const_image(b), W)   (batch-1, ~1/128 the cost;
            nonconstant only where the 7x7 window overlaps zero padding)

For BNInception/InceptionV3 (std = 1, no div255) the fold is EXACT in
weights; uint8 pixel values are exactly representable in bf16, so the folded
arm feeds the conv the exact pixel affine instead of a bf16-rounded
normalized tensor. The flip concat drops to uint8 (4x less HBM traffic).

This probe times the deployed arm vs the folded arm (scores through
crop-mean + fused FC, the p3 shape of sharedstem_prefix_profile.py) and
reports feature agreement. Run on the real chip (default env).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from action_detection_tpu.data.transforms import device_normed_pair
from action_detection_tpu.infer.scorer import ProposalScorer
from action_detection_tpu.models import SSN, jitted_init
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.bn_inception import stem_feature_hw
from action_detection_tpu.models.backbones.bn_inception_int8 import (
    _StemBf16Ops, _max_pool, _e2e_trunk,
    bninception_int8_e2e_features_sharedstem)
from action_detection_tpu.models.backbones.quantize import (
    sharedstem_crop_windows)

TICKS, CROPS, K = int(os.environ.get("TICKS", "64")), 10, 20
ITERS = int(os.environ.get("ITERS", "15"))
model = SSN(num_class=K, base_model="BNInception", dropout=0.0,
            dtype=jnp.bfloat16)
_, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
print("devices:", jax.devices(), flush=True)
variables = jitted_init(model, {"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 9, 224, 224, 3), jnp.float32),
                        jnp.ones((1, 2)), train=False)
rng = np.random.RandomState(0)
reg = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)
host = rng.randint(0, 256, (TICKS, 256, 340, 3), dtype=np.uint8)
sc = ProposalScorer(model, variables["params"], variables.get("batch_stats"),
                    spec, reg_stats=reg, num_class=K, test_crops=CROPS,
                    chunk_frames=TICKS, device_crops=True, quantize="e2e",
                    calibration_frames=host[:8], shared_stem=True)
qe = sc._quantized
kernel, bias = sc._kernel, sc._bias
dev = jax.devices()[0]
chunk = jax.device_put(host, dev)

# ---- host-side fold (exact for std=1, no div255; general affine anyway) ---
C = 3
mean = np.tile(np.asarray(spec.mean, np.float32), C // len(spec.mean))
std = np.tile(np.asarray(spec.std, np.float32), C // len(spec.std))
d = 255.0 if spec.div255 else 1.0
a = 1.0 / (d * std)                       # xn[c] = a_c * x[p(c)] + b_c
b = -mean / std
perm = [2, 1, 0] if spec.bgr else [0, 1, 2]
w0 = np.asarray(qe["__stem__"]["conv1_7x7_s2"]["kernel"], np.float32)
b0 = np.asarray(qe["__stem__"]["conv1_7x7_s2"]["bias"], np.float32)
wf = np.zeros_like(w0)
for c in range(C):
    wf[:, :, perm[c], :] = a[c] * w0[:, :, c, :]
WF = jnp.asarray(wf, jnp.bfloat16)
W0 = jnp.asarray(w0, jnp.bfloat16)
B0 = jnp.asarray(b0, jnp.bfloat16)
BVEC = jnp.asarray(b, jnp.bfloat16)
DN = ("NHWC", "HWIO", "NHWC")


def folded_stem_u8(qe, x_u8):
    xb = x_u8.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(xb, WF, (2, 2), ((3, 3), (3, 3)),
                                     dimension_numbers=DN)
    const = jnp.broadcast_to(BVEC, (1,) + x_u8.shape[1:3] + (C,))
    corr = jax.lax.conv_general_dilated(const, W0, (2, 2), ((3, 3), (3, 3)),
                                        dimension_numbers=DN)
    h = jnp.maximum(y + corr + B0, 0)
    ops = _StemBf16Ops(qe["__stem__"])
    h = _max_pool(h, 3, 2, ceil=True)
    h = ops.conv(h, "conv2_3x3_reduce")
    h = ops.conv(h, "conv2_3x3", pad=1)
    h = _max_pool(h, 3, 2, ceil=True)
    return jnp.clip(jnp.round(h.astype(jnp.float32) / qe["__stem_scale__"]),
                    0, 127).astype(jnp.int8)


@jax.jit
def feats_cur(qe, frames):
    xn, fs = device_normed_pair(frames, spec, "RGB", 1)
    return bninception_int8_e2e_features_sharedstem(qe, xn, fs, 224)


@jax.jit
def feats_fold(qe, frames):
    h = sharedstem_crop_windows(lambda x: folded_stem_u8(qe, x),
                                stem_feature_hw, frames, frames, 224)
    return _e2e_trunk(qe, h)


@jax.jit
def p3_cur(qe, kernel, bias, frames):
    xn, fs = device_normed_pair(frames, spec, "RGB", 1)
    f = bninception_int8_e2e_features_sharedstem(qe, xn, fs, 224)
    f = f.reshape(CROPS, TICKS, -1).mean(axis=0)
    return (jnp.matmul(f, kernel, precision=jax.lax.Precision.HIGHEST)
            + bias).sum()


@jax.jit
def p3_fold(qe, kernel, bias, frames):
    h = sharedstem_crop_windows(lambda x: folded_stem_u8(qe, x),
                                stem_feature_hw, frames, frames, 224)
    f = _e2e_trunk(qe, h)
    f = f.reshape(CROPS, TICKS, -1).mean(axis=0)
    return (jnp.matmul(f, kernel, precision=jax.lax.Precision.HIGHEST)
            + bias).sum()


# agreement first (small fetch); SKIP_AGREE=1 skips the two extra programs
if not int(os.environ.get("SKIP_AGREE", "0")):
    fa = np.asarray(feats_cur(qe, chunk), np.float32)
    fb = np.asarray(feats_fold(qe, chunk), np.float32)
    cos = float((fa * fb).sum() /
                (np.linalg.norm(fa) * np.linalg.norm(fb) + 1e-12))
    rel = float(np.linalg.norm(fa - fb) / (np.linalg.norm(fa) + 1e-12))
    print(f"feature agreement: cosine {cos:.6f} rel {rel:.6f}", flush=True)

for name, fn in (("p3 current ", p3_cur), ("p3 folded  ", p3_fold)):
    t0 = time.time(); float(fn(qe, kernel, bias, chunk)); c = time.time() - t0
    for _ in range(3):
        fn(qe, kernel, bias, chunk)
    float(fn(qe, kernel, bias, chunk))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(qe, kernel, bias, chunk)
    float(out)
    print(f"{name}: {(time.time()-t0)/ITERS*1e3:7.2f} ms (compile {c:.0f}s)",
          flush=True)
