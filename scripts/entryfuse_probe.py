"""Probe: fuse each inception module's branch-entry 1x1 convs into one conv.

The three entry convs of a module (`_1x1`, `_3x3_reduce`,
`_double_3x3_reduce`; two for stride-2 modules) consume the SAME int8
input, and in the e2e scheme they also share the same per-input-channel
scale folding — so concatenating their weights / epilogue vectors along
the output-channel axis yields ONE conv that is bit-identical (s32
accumulation is exact; the f32 epilogue is elementwise per channel).
What it might buy, per the r4 prefix profile (trunk = 20.6 ms of the
25.4 ms step at ~25% of int8 peak, friction diagnosed at odd-channel
module boundaries):
  * 64/96-wide conv outputs waste MXU lanes; fused widths (128..736)
    tile better;
  * the module input is read once instead of 3x (~1.5 GB/step less HBM
    read traffic);
  * 30 -> 11 trunk conv dispatches.

Arms, all on the SAME device-resident trunk input in one process:
  A deployed   : _e2e_trunk's walker as shipped
  B fused-entry: one concat conv per module entry, split after epilogue
  C +no-concat : B, plus module outputs kept as PARTS (the branch concat
                 never materializes; every consumer decomposes exactly —
                 entry/proj convs as s32 partial sums over weight slices,
                 pools per part)
Bit-equality of the final int8 trunk map is asserted for B and C before
timing. Headline arm: the full deployed shared-stem feature fn vs the
same with the fused trunk.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

CPU_CHECK = "--cpu-check" in sys.argv  # equality only, tiny shapes, no timing
from action_detection_tpu.data.transforms import device_normed_pair
from action_detection_tpu.infer.scorer import ProposalScorer
from action_detection_tpu.models import SSN, jitted_init
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.bn_inception import (
    _INCEPTION_CFG, stem_feature_hw)
from action_detection_tpu.models.backbones.bn_inception_int8 import (
    _E2EOps, _avg_pool_i8_include_pad, _conv_i8_e2e, _e2e_stem_quantized,
    _max_pool_i8, _walk_trunk)
from action_detection_tpu.models.backbones.quantize import (
    sharedstem_crop_windows)

TICKS, CROPS, K = (4, 10, 20) if "--cpu-check" in sys.argv else (64, 10, 20)
DN = ("NHWC", "HWIO", "NHWC")


def entry_names(name, c1):
    return (([f"{name}_1x1"] if c1 is not None else [])
            + [f"{name}_3x3_reduce", f"{name}_double_3x3_reduce"])


def fuse_entries(qe):
    """Host-side: concat each module's entry-conv tensors along out-channels."""
    fz = {}
    for (name, c1, *_r) in _INCEPTION_CFG:
        names = entry_names(name, c1)
        fz[name] = {
            "wq": jnp.concatenate([qe[n]["wq"] for n in names], axis=3),
            "m": jnp.concatenate([qe[n]["m"] for n in names]),
            "bq": jnp.concatenate([qe[n]["bq"] for n in names]),
            "splits": np.cumsum(
                [int(qe[n]["wq"].shape[3]) for n in names])[:-1].tolist(),
        }
    return fz


def trunk_map_deployed(qe, h):
    return _walk_trunk(_E2EOps(qe), h)


def trunk_map_fused(qe, fz, h):
    for (name, c1, _c3r, _c3, _d3r, _d31, _d32, _proj, pool, stride) \
            in _INCEPTION_CFG:
        heads = jnp.split(_conv_i8_e2e(h, fz[name]), fz[name]["splits"],
                          axis=-1)
        branches = list(heads[:1]) if c1 is not None else []
        i = 1 if c1 is not None else 0
        branches.append(_conv_i8_e2e(heads[i], qe[f"{name}_3x3"],
                                     stride=stride, pad=1))
        bd = _conv_i8_e2e(heads[i + 1], qe[f"{name}_double_3x3_1"], pad=1)
        branches.append(_conv_i8_e2e(bd, qe[f"{name}_double_3x3_2"],
                                     stride=stride, pad=1))
        if stride == 1:
            bp = (_avg_pool_i8_include_pad(h, 3, 1, 1) if pool == "avg"
                  else _max_pool_i8(h, 3, 1, pad=1))
            branches.append(_conv_i8_e2e(bp, qe[f"{name}_pool_proj"]))
        else:
            branches.append(_max_pool_i8(h, 3, 2, ceil=True))
        h = jnp.concatenate(branches, axis=-1)
    return h


def _conv_parts_i8(parts, wq, m, bq, stride=1, pad=0):
    """conv(concat(parts)) == sum of convs on weight slices, exactly (s32)."""
    acc, off = None, 0
    for p in parts:
        c = p.shape[-1]
        y = jax.lax.conv_general_dilated(
            p, wq[:, :, off:off + c, :], (stride, stride),
            ((pad, pad), (pad, pad)), dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        acc = y if acc is None else acc + y
        off += c
    out = acc.astype(jnp.float32) * m + bq
    return jnp.clip(jnp.round(jnp.maximum(out, 0.0)), 0.0, 127.0) \
        .astype(jnp.int8)


def trunk_map_noconcat(qe, fz, h):
    parts = [h]
    for (name, c1, _c3r, _c3, _d3r, _d31, _d32, _proj, pool, stride) \
            in _INCEPTION_CFG:
        f = fz[name]
        heads = jnp.split(_conv_parts_i8(parts, f["wq"], f["m"], f["bq"]),
                          f["splits"], axis=-1)
        out = list(heads[:1]) if c1 is not None else []
        i = 1 if c1 is not None else 0
        out.append(_conv_i8_e2e(heads[i], qe[f"{name}_3x3"],
                                stride=stride, pad=1))
        bd = _conv_i8_e2e(heads[i + 1], qe[f"{name}_double_3x3_1"], pad=1)
        out.append(_conv_i8_e2e(bd, qe[f"{name}_double_3x3_2"],
                                stride=stride, pad=1))
        if stride == 1:
            pooled = [(_avg_pool_i8_include_pad(p, 3, 1, 1) if pool == "avg"
                       else _max_pool_i8(p, 3, 1, pad=1)) for p in parts]
            pj = qe[f"{name}_pool_proj"]
            out.append(_conv_parts_i8(pooled, pj["wq"], pj["m"], pj["bq"]))
        else:
            out.extend(_max_pool_i8(p, 3, 2, ceil=True) for p in parts)
        parts = out
    return jnp.concatenate(parts, axis=-1)


def main():
    print("devices:", jax.devices(), flush=True)
    model = SSN(num_class=K, base_model="BNInception", dropout=0.0,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 9, 224, 224, 3), jnp.float32),
                            jnp.ones((1, 2)), train=False)
    rng = np.random.RandomState(0)
    reg = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)
    host = rng.randint(0, 256, (TICKS, 256, 340, 3), dtype=np.uint8)
    sc = ProposalScorer(model, variables["params"],
                        variables.get("batch_stats"), spec, reg_stats=reg,
                        num_class=K, test_crops=CROPS, chunk_frames=TICKS,
                        device_crops=True, quantize="e2e",
                        calibration_frames=host[:8], shared_stem=True)
    qe = dict(sc._quantized)
    qe.pop("__entry__", None)   # this probe builds its own fused tensors;
    # the package now ships fusion by default (bn_inception_int8._E2EOps.entry)
    fz = fuse_entries(qe)
    dev = jax.devices()[0]
    chunk = jax.device_put(host, dev)

    @jax.jit
    def trunk_input(qe, frames):
        xn, fs = device_normed_pair(frames, spec, "RGB", 1)
        return sharedstem_crop_windows(lambda x: _e2e_stem_quantized(qe, x),
                                       stem_feature_hw, xn, fs, 224)

    h = jax.block_until_ready(trunk_input(qe, chunk))
    print("trunk input:", h.shape, h.dtype, flush=True)

    # --- bit-equality before timing ---
    ref = np.asarray(jax.jit(trunk_map_deployed)(qe, h[:40]))
    for nm, fn in (("fused", lambda q, x: trunk_map_fused(q, fz, x)),
                   ("noconcat", lambda q, x: trunk_map_noconcat(q, fz, x))):
        got = np.asarray(jax.jit(fn)(qe, h[:40]))
        eq = np.array_equal(ref, got)
        print(f"bit-equal [{nm}]: {eq} "
              f"(maxdiff {np.abs(ref.astype(np.int32) - got.astype(np.int32)).max()})",
              flush=True)
        assert eq, nm
    if CPU_CHECK:
        print("cpu-check OK", flush=True)
        return

    # --- trunk-only timing on the full 640-crop input ---
    def timed(nm, fn, *args):
        t0 = time.time(); f = jax.jit(fn)
        float(f(*args).astype(jnp.int32).sum()); c = time.time() - t0
        for _ in range(3): f(*args)
        float(f(*args).astype(jnp.int32).sum())
        t0 = time.time()
        for _ in range(15): out = f(*args)
        float(out.astype(jnp.int32).sum())
        print(f"{nm}: {(time.time() - t0) / 15 * 1e3:7.2f} ms "
              f"(compile {c:.0f}s)", flush=True)

    timed("trunk deployed   ", trunk_map_deployed, qe, h)
    timed("trunk fused-entry", lambda q, x: trunk_map_fused(q, fz, x), qe, h)
    timed("trunk no-concat  ", lambda q, x: trunk_map_noconcat(q, fz, x),
          qe, h)

    # --- full headline step (features incl. stem + prep) ---
    def feats_deployed(qe, frames):
        xn, fs = device_normed_pair(frames, spec, "RGB", 1)
        hh = sharedstem_crop_windows(lambda x: _e2e_stem_quantized(qe, x),
                                     stem_feature_hw, xn, fs, 224)
        hh = trunk_map_deployed(qe, hh)
        return (jnp.mean(hh.astype(jnp.float32), axis=(1, 2))
                * qe["__feat_scale__"])

    def feats_fused(qe, frames):
        xn, fs = device_normed_pair(frames, spec, "RGB", 1)
        hh = sharedstem_crop_windows(lambda x: _e2e_stem_quantized(qe, x),
                                     stem_feature_hw, xn, fs, 224)
        hh = trunk_map_fused(qe, fz, hh)
        return (jnp.mean(hh.astype(jnp.float32), axis=(1, 2))
                * qe["__feat_scale__"])

    def timed_f(nm, fn):
        t0 = time.time(); f = jax.jit(fn)
        float(f(qe, chunk).sum()); c = time.time() - t0
        for _ in range(3): f(qe, chunk)
        float(f(qe, chunk).sum())
        t0 = time.time()
        for _ in range(15): out = f(qe, chunk)
        float(out.sum())
        print(f"{nm}: {(time.time() - t0) / 15 * 1e3:7.2f} ms "
              f"(compile {c:.0f}s)", flush=True)

    timed_f("step deployed    ", feats_deployed)
    timed_f("step fused-entry ", feats_fused)


if __name__ == "__main__":
    main()
