#!/usr/bin/env python
"""Probe: lower the int8 trunk's convs to ``dot_general`` (matmul) form.

Hypothesis: XLA:TPU runs s8 x s8 -> s32 ``dot_general`` on the MXU's int8
mode, but may lower s8 CONVOLUTIONS less efficiently (the r4 prefix profile
has the trunk at ~25-27%% of int8 peak after branch-entry fusion). A 1x1
stride-1 conv IS a matmul ([B*H*W, Cin] @ [Cin, Cout]); a 3x3 stride-s conv
is a sum of 9 shifted matmuls. Integer accumulation is exact, so both
rewrites are BIT-IDENTICAL to the conv — asserted before timing.

Measured (v5e, micro arm at batch 1280): 1x1->dot wins 0.64x at 7^2, is
neutral (0.97x) at 28^2; 3x3->dot loses 2.2-5.5x (the 9 shifted matmuls
re-read the input 9x). Lowering EVERYTHING (--alldot) loses 8x on the trunk
(166 vs 21 ms). The live question is therefore SELECTIVE lowering: only 1x1
stride-1 convs at small grids.

Arms:
  micro   : per-shape conv-vs-dot timing for the trunk's 1x1 (entry-fused
            widths, 28/14/7 grids) and 3x3 classes.
  step    : the headline shared-stem feature step — deployed (conv) vs
            selective 1x1->dot at grid <=7, <=14, and all 1x1s.
  --alldot: the rejected every-conv lowering arms (trunk + step), kept for
            the record.

Usage: python scripts/dotlower_probe.py [--micro] [--cpu-check] [--alldot]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

CPU_CHECK = "--cpu-check" in sys.argv
MICRO_ONLY = "--micro" in sys.argv
ALLDOT = "--alldot" in sys.argv
B = 16 if CPU_CHECK else 1280          # 64 ticks x 10 crops x 2 flips
ITERS = 2 if CPU_CHECK else 15
DN = ("NHWC", "HWIO", "NHWC")


def conv_i8(x, w, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=DN, preferred_element_type=jnp.int32)


def dot_1x1(x, w):
    """1x1 stride-1 conv as one matmul (bit-identical, s32)."""
    Bx, H, W, Ci = x.shape
    y = jax.lax.dot_general(
        x.reshape(Bx * H * W, Ci), w.reshape(Ci, w.shape[3]),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return y.reshape(Bx, H, W, w.shape[3])


def dot_3x3(x, w, stride=1, pad=1):
    """3x3 conv as 9 shifted matmuls accumulated in s32 (bit-identical)."""
    Bx, H, W, Ci = x.shape
    Ho = (H + 2 * pad - 3) // stride + 1
    Wo = (W + 2 * pad - 3) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (Bx, dy + stride * (Ho - 1) + 1, dx + stride * (Wo - 1) + 1,
                 Ci), (1, stride, stride, 1))
            y = jax.lax.dot_general(
                sl.reshape(Bx * Ho * Wo, Ci), w[dy, dx],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = y if acc is None else acc + y
    return acc.reshape(Bx, Ho, Wo, w.shape[3])


def timed(nm, fn, *args, gops=None):
    f = jax.jit(fn)
    out = f(*args)
    float(out.astype(jnp.int32).sum())          # warm + finalize
    for _ in range(3):
        f(*args)
    float(f(*args).astype(jnp.int32).sum())
    t0 = time.time()
    for _ in range(ITERS):
        out = f(*args)
    float(out.astype(jnp.int32).sum())          # hard sync: host fetch
    ms = (time.time() - t0) / ITERS * 1e3
    tops = f" {gops / ms / 1e3:6.1f} TOPS" if gops else ""
    print(f"{nm}: {ms:7.2f} ms{tops}", flush=True)
    return ms


def micro():
    # Bit-equality for every shape class is asserted in the --cpu-check run
    # (and once more on-chip in full()'s trunk arm); the TPU micro arm only
    # TIMES, and compares just a small slice — full-tensor equality fetches
    # are ~718MB device->host through a post-execution ~40MB/s tunnel.
    rng = np.random.RandomState(0)
    print(f"== micro: conv vs dot lowering (batch {B}) ==", flush=True)
    # (H, Cin, Cout, note) — 1x1 entry-fused widths per stage
    for H, Ci, Co, note in ((28, 192, 224, "3a entry"),
                            (14, 576, 384, "4b entry"),
                            (7, 1056, 736, "5a entry")):
        x = jnp.asarray(rng.randint(0, 128, (B, H, H, Ci), np.int8))
        w = jnp.asarray(rng.randint(-127, 128, (1, 1, Ci, Co), np.int8))
        ref = np.asarray(jax.jit(conv_i8)(x[:8], w))
        got = np.asarray(jax.jit(dot_1x1)(x[:8], w))
        assert np.array_equal(ref, got), note
        gops = 2.0 * B * H * H * Ci * Co / 1e9
        c = timed(f"1x1 conv {note:9s}", conv_i8, x, w, gops=gops)
        d = timed(f"1x1 dot  {note:9s}", dot_1x1, x, w, gops=gops)
        print(f"   -> dot/conv = {d / c:.2f}x", flush=True)
    for H, Ci, Co, st, note in ((14, 160, 192, 1, "4d d3x3"),
                                (7, 192, 320, 1, "5b 3x3")):
        x = jnp.asarray(rng.randint(0, 128, (B, H, H, Ci), np.int8))
        w = jnp.asarray(rng.randint(-127, 128, (3, 3, Ci, Co), np.int8))
        ref = np.asarray(jax.jit(
            lambda a, b: conv_i8(a, b, stride=st, pad=1))(x[:8], w))
        got = np.asarray(jax.jit(
            lambda a, b: dot_3x3(a, b, stride=st, pad=1))(x[:8], w))
        assert np.array_equal(ref, got), note
        Ho = (H + 2 - 3) // st + 1
        gops = 2.0 * B * Ho * Ho * 9 * Ci * Co / 1e9
        c = timed(f"3x3 conv {note:9s}",
                  lambda a, b: conv_i8(a, b, stride=st, pad=1), x, w,
                  gops=gops)
        d = timed(f"3x3 dot  {note:9s}",
                  lambda a, b: dot_3x3(a, b, stride=st, pad=1), x, w,
                  gops=gops)
        print(f"   -> dot/conv = {d / c:.2f}x", flush=True)


def full():
    from action_detection_tpu.data.transforms import device_normed_pair
    from action_detection_tpu.infer.scorer import ProposalScorer
    from action_detection_tpu.models import SSN, jitted_init
    from action_detection_tpu.models.backbones import get_backbone
    from action_detection_tpu.models.backbones.bn_inception import (
        stem_feature_hw)
    from action_detection_tpu.models.backbones.bn_inception_int8 import (
        _E2EOps, _e2e_stem_quantized, _walk_trunk)
    from action_detection_tpu.models.backbones.quantize import (
        sharedstem_crop_windows)

    TICKS, CROPS = (2, 10) if CPU_CHECK else (64, 10)
    model = SSN(num_class=20, base_model="BNInception", dropout=0.0,
                dtype=jnp.bfloat16)
    _, _, spec = get_backbone("BNInception", "RGB", dtype=jnp.bfloat16)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 9, 224, 224, 3), jnp.float32),
                            jnp.ones((1, 2)), train=False)
    rng = np.random.RandomState(0)
    host = rng.randint(0, 256, (TICKS, 256, 340, 3), dtype=np.uint8)
    sc = ProposalScorer(model, variables["params"],
                        variables.get("batch_stats"), spec,
                        reg_stats=np.array([[0., 0.], [1., 1.]], np.float32),
                        num_class=20, test_crops=CROPS, chunk_frames=TICKS,
                        device_crops=True, quantize="e2e",
                        calibration_frames=host[:4], shared_stem=True)
    qe = dict(sc._quantized)

    from action_detection_tpu.models.backbones.bn_inception_int8 \
        import _conv_i8_e2e

    def make_dot_ops(max_hw, with_3x3=False):
        """_E2EOps with 1x1 s1 convs at grid <= max_hw lowered to dot
        (bit-identical); with_3x3 additionally lowers 3x3s (--alldot)."""

        class _DotOps(_E2EOps):
            def _epi(self, y, layer):
                out = y.astype(jnp.float32) * layer["m"] + layer["bq"]
                return jnp.clip(jnp.round(jnp.maximum(out, 0.0)),
                                0.0, 127.0).astype(jnp.int8)

            def conv(self, xq, name, stride=1, pad=0):
                return self._lower(xq, self.qe[name], stride, pad)

            def entry(self, xq, module, names):
                fz = self.qe["__entry__"][module]
                y = self._lower(xq, fz, 1, 0)
                splits = np.cumsum(
                    [int(self.qe[n]["wq"].shape[3]) for n in names])[:-1]
                return jnp.split(y, splits, axis=-1)

            def _lower(self, xq, layer, stride, pad):
                kh, kw = layer["wq"].shape[:2]
                if ((kh, kw) == (1, 1) and stride == 1 and pad == 0
                        and xq.shape[1] <= max_hw):
                    return self._epi(dot_1x1(xq, layer["wq"]), layer)
                if (kh, kw) == (3, 3) and with_3x3:
                    return self._epi(dot_3x3(xq, layer["wq"], stride, pad),
                                     layer)
                return _conv_i8_e2e(xq, layer, stride=stride, pad=pad)

        return _DotOps

    dev = jax.devices()[0]
    chunk = jax.device_put(host, dev)

    @jax.jit
    def trunk_input(qe, frames):
        xn, fs = device_normed_pair(frames, spec, "RGB", 1)
        return sharedstem_crop_windows(lambda x: _e2e_stem_quantized(qe, x),
                                       stem_feature_hw, xn, fs, 224)

    h = jax.block_until_ready(trunk_input(qe, chunk))
    print("trunk input:", h.shape, h.dtype, flush=True)

    SelAll = make_dot_ops(10_000)            # every 1x1 (superset of sel arms)
    ref = np.asarray(jax.jit(
        lambda q, x: _walk_trunk(_E2EOps(q), x))(qe, h[:20]))
    got = np.asarray(jax.jit(
        lambda q, x: _walk_trunk(SelAll(q), x))(qe, h[:20]))
    print("trunk bit-equal [1x1->dot]:", np.array_equal(ref, got), flush=True)
    assert np.array_equal(ref, got)
    if ALLDOT:
        gota = np.asarray(jax.jit(
            lambda q, x: _walk_trunk(make_dot_ops(10_000, True)(q), x))(
                qe, h[:20]))
        print("trunk bit-equal [alldot]:", np.array_equal(ref, gota),
              flush=True)
        assert np.array_equal(ref, gota)
    if CPU_CHECK:
        print("cpu-check OK", flush=True)
        return

    if ALLDOT:
        timed("trunk deployed (conv)",
              lambda q, x: _walk_trunk(_E2EOps(q), x).astype(jnp.int32),
              qe, h)
        timed("trunk dot-lowered    ",
              lambda q, x: _walk_trunk(make_dot_ops(10_000, True)(q), x)
              .astype(jnp.int32), qe, h)

    def feats(ops_cls, q, frames):
        xn, fs = device_normed_pair(frames, spec, "RGB", 1)
        hh = sharedstem_crop_windows(lambda x: _e2e_stem_quantized(q, x),
                                     stem_feature_hw, xn, fs, 224)
        hh = _walk_trunk(ops_cls(q), hh)
        return (jnp.mean(hh.astype(jnp.float32), axis=(1, 2))
                * q["__feat_scale__"])

    def timed_f(nm, ops_cls):
        f = jax.jit(lambda q, fr: feats(ops_cls, q, fr))
        float(f(qe, chunk).sum())
        for _ in range(3):
            f(qe, chunk)
        float(f(qe, chunk).sum())
        t0 = time.time()
        for _ in range(15):
            out = f(qe, chunk)
        float(out.sum())
        print(f"{nm}: {(time.time() - t0) / 15 * 1e3:7.2f} ms", flush=True)

    timed_f("step deployed (conv)", _E2EOps)
    timed_f("step 1x1->dot @<=7  ", make_dot_ops(7))
    timed_f("step 1x1->dot @<=14 ", make_dot_ops(14))
    timed_f("step 1x1->dot all   ", SelAll)
    if ALLDOT:
        timed_f("step dot-lowered all", make_dot_ops(10_000, True))


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    micro()
    if not MICRO_ONLY:
        full()
