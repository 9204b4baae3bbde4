"""Prefix profile of the DEPLOYED headline step (int8-e2e + shared-stem).

Times, in the same process on device-resident input:
  p0: device_normed_pair + flip concat (prep)
  p1: p0 + shared stem (_e2e_stem_quantized on 128 maps) + window slice
  p2: p1 + int8 trunk (640 crops) + dequant gap  (= feature fn)
  p3: p2 + crop-mean + fused FC                  (= score chunk)
  p4: p3 + STPP pool                             (= full step)
Consecutive deltas = in-context stage costs of the 25.4 ms step.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from action_detection_tpu.data.transforms import device_normed_pair
from action_detection_tpu.infer.scorer import ProposalScorer
from action_detection_tpu.models import SSN, jitted_init
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.bn_inception import stem_feature_hw
from action_detection_tpu.models.backbones.bn_inception_int8 import (
    _e2e_stem_quantized, _e2e_trunk,
    bninception_int8_e2e_features_sharedstem)
from action_detection_tpu.models.backbones.quantize import (
    sharedstem_crop_windows)

TICKS, CROPS, K = 64, 10, 20
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
ticks = jax.device_put(np.stack([np.sort(rng.randint(0, TICKS + 1, size=4))
                                 for _ in range(128)]).astype(np.int64))
scal = jax.device_put(rng.rand(128, 2).astype(np.float32))
nf = jnp.asarray(TICKS, jnp.int32)

@jax.jit
def p0(qe, frames):
    xn, fs = device_normed_pair(frames, spec, "RGB", 1)
    return jnp.concatenate([xn, jnp.flip(fs, axis=2)], axis=0).sum()

@jax.jit
def p1(qe, frames):
    xn, fs = device_normed_pair(frames, spec, "RGB", 1)
    h = sharedstem_crop_windows(lambda x: _e2e_stem_quantized(qe, x),
                                stem_feature_hw, xn, fs, 224)
    return h.astype(jnp.int32).sum()

@jax.jit
def p2(qe, frames):
    xn, fs = device_normed_pair(frames, spec, "RGB", 1)
    return bninception_int8_e2e_features_sharedstem(qe, xn, fs, 224).sum()

@jax.jit
def p3(qe, kernel, bias, frames):
    xn, fs = device_normed_pair(frames, spec, "RGB", 1)
    f = bninception_int8_e2e_features_sharedstem(qe, xn, fs, 224)
    f = f.reshape(CROPS, TICKS, -1).mean(axis=0)
    return (jnp.matmul(f, kernel, precision=jax.lax.Precision.HIGHEST)
            + bias).sum()

def p4(qe, kernel, bias, frames):
    s = sc._score_chunk(frames, n_stacks=TICKS)
    return sc._pool(s, ticks, scal, nf)[0].sum()

for name, fn in (("p0 prep", p0), ("p1 +stem+slice", p1),
                 ("p2 +trunk=feats", p2)):
    t0 = time.time(); float(fn(qe, chunk)); c = time.time() - t0
    for _ in range(3): fn(qe, chunk)
    float(fn(qe, chunk))
    t0 = time.time()
    for _ in range(15): out = fn(qe, chunk)
    float(out)
    print(f"{name}: {(time.time()-t0)/15*1e3:7.2f} ms (compile {c:.0f}s)",
          flush=True)
for name, fn in (("p3 +mean+FC", p3),):
    t0 = time.time(); float(fn(qe, kernel, bias, chunk)); c = time.time() - t0
    for _ in range(3): fn(qe, kernel, bias, chunk)
    float(fn(qe, kernel, bias, chunk))
    t0 = time.time()
    for _ in range(15): out = fn(qe, kernel, bias, chunk)
    float(out)
    print(f"{name}: {(time.time()-t0)/15*1e3:7.2f} ms (compile {c:.0f}s)",
          flush=True)
t0 = time.time(); float(p4(qe, kernel, bias, chunk)); c = time.time() - t0
for _ in range(3): p4(qe, kernel, bias, chunk)
float(p4(qe, kernel, bias, chunk))
t0 = time.time()
for _ in range(15): out = p4(qe, kernel, bias, chunk)
float(out)
print(f"p4 full step: {(time.time()-t0)/15*1e3:7.2f} ms (compile {c:.0f}s)",
      flush=True)
