#!/usr/bin/env python
"""Is the BNInception stem conv (7x7 s2 pad3, C=3) worth a space-to-depth
lever in TRAINING?

Inference already established a "stem floor": the C=3 first conv cannot
fill the MXU in any dtype (DESIGN.md r3/r4; the int8-e2e path keeps the
stem bf16 for exactly this reason). Training pays that conv THREE times —
forward, weight-grad, and the (DCE'd) input-grad — at the 1,152-image
recipe batch, so the classic MLPerf-era TPU reformulation is worth one
measured probe: space-to-depth the input 2x2 (224^2 x 3 -> 112^2 x 12)
and scatter the 7x7x3 kernel into a 4x4x12 stride-1 conv. The dot
products are IDENTICAL (each output still sums the same 147 x*w terms;
the 45 extra scattered taps are structural zeros), so the lever is
bit-parity-eligible: keep W as the parameter, scatter inside the step
(scatter's backward is a gather, weight-sized, ~free).

Index algebra (pad=3, s=2, k=7, per axis): output i's window starts at
input row 2i-3; tap d reads row 2i-3+d = 2(i-2) + 2b + r with
d = 2b + r - 1, b in [0,4), r in {0,1} — so in block space it is a 4-tap
stride-1 conv with padding (2,1), and taps d=-1 (b=0,r=0) and d=7
(b=3,r=1) are zeros. s2d channel packing: ((rr*2)+rc)*C + c.

Arms (one v5e, hard-synced host fetch, bf16 like the train step):
  ref   fwd        y = conv7x7s2(x, W)
  ref   fwd+wgrad  vjp w.r.t. W (input-grad not pulled — DCE'd, as in the
                   real step where x is the image)
  s2d   fwd        y = conv4x4s1(s2d(x), scatter(W))  [s2d transpose timed]
  s2d   fwd+wgrad  vjp w.r.t. W through the scatter

Correctness gate: small-int x/W in f32 — products and sums exact, so the
two formulations must be bit-equal.

Usage (real TPU, default env): python scripts/stemconv_probe.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N, H, C, F = 1152, 224, 3, 64
K, S, PAD = 7, 2, 3
DN = ("NHWC", "HWIO", "NHWC")


def conv_ref(x, w):
    return lax.conv_general_dilated(x, w, (S, S), ((PAD, PAD), (PAD, PAD)),
                                    dimension_numbers=DN)


def s2d(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def scatter_kernel(w):
    """[7,7,C,F] -> [4,4,4C,F] with W'[br,bc,((rr*2)+rc)*C+c,f] =
    W[2br+rr-1, 2bc+rc-1, c, f] (zero where the source index is out of
    [0,7))."""
    c = w.shape[2]
    out = jnp.zeros((4, 4, 4 * c, w.shape[3]), w.dtype)
    for br in range(4):
        for rr in range(2):
            dr = 2 * br + rr - 1
            if not 0 <= dr < K:
                continue
            for bc in range(4):
                for rc in range(2):
                    dc = 2 * bc + rc - 1
                    if not 0 <= dc < K:
                        continue
                    ch = (rr * 2 + rc) * c
                    out = out.at[br, bc, ch:ch + c, :].set(w[dr, dc])
    return out


def conv_s2d(x, w):
    return lax.conv_general_dilated(s2d(x), scatter_kernel(w), (1, 1),
                                    ((2, 1), (2, 1)), dimension_numbers=DN)


def timed(fn, *args, n=10):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    # --- correctness gate (small ints in f32: exact) ---
    xs = jnp.asarray(rng.randint(-4, 5, size=(2, 32, 32, C)), jnp.float32)
    ws = jnp.asarray(rng.randint(-4, 5, size=(K, K, C, F)), jnp.float32)
    y_ref = jax.jit(conv_ref)(xs, ws)
    y_s2d = jax.jit(conv_s2d)(xs, ws)
    ok = bool(jnp.array_equal(y_ref, y_s2d))
    print(f"correctness fwd : {'EXACT' if ok else 'MISMATCH'}", flush=True)
    assert ok, (float(jnp.abs(y_ref - y_s2d).max()))
    g_ref = jax.jit(jax.grad(lambda w: (conv_ref(xs, w) ** 2).sum()))(ws)
    g_s2d = jax.jit(jax.grad(lambda w: (conv_s2d(xs, w) ** 2).sum()))(ws)
    ok = bool(jnp.array_equal(g_ref, g_s2d))
    print(f"correctness grad: {'EXACT' if ok else 'MISMATCH'}", flush=True)
    assert ok, (float(jnp.abs(g_ref - g_s2d).max()))

    # --- recipe-batch timings, bf16 ---
    x = jnp.asarray(rng.randn(N, H, H, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, K, C, F) * 0.05, jnp.bfloat16)
    macs = N * (H // 2) ** 2 * F * K * K * C
    for name, conv in (("ref", conv_ref), ("s2d", conv_s2d)):
        fwd = jax.jit(lambda x, w, conv=conv: conv(x, w))

        def fwd_wgrad(x, w, conv=conv):
            y, vjp = jax.vjp(lambda w: conv(x, w), w)
            return vjp(jnp.ones_like(y))[0]

        fb = jax.jit(fwd_wgrad)
        t_f = timed(fwd, x, w)
        t_fb = timed(fb, x, w)
        print(f"{name}: fwd {t_f:7.2f} ms ({macs * 2 / t_f / 1e9:6.1f} "
              f"TFLOP/s)   fwd+wgrad {t_fb:7.2f} ms "
              f"({macs * 4 / t_fb / 1e9:6.1f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
