"""stem_probe_r3.py — round-3 time-boxed stem/stage-1 perf probe.

The stem (12.7 ms of the 47.2 ms bf16 step) is the only segment far from
roofline; the pool gradient is exhausted (four recorded negatives, round
2). Two remaining hypotheses from the round-2 verdict:

1. **s2d-layout stage 1** — stage-1 convs are 64-out-channel 3x3 at
   128^2: only half the MXU's 128 output lanes are used. A space-to-depth
   layout (64^2 x 256) fills the lanes but inherently does 16/9 = 1.78x
   the FLOPs (2x2 s2d cells cover a 4x4 pixel window for a 3x3 receptive
   field). Cheap kill test: time a DENSE conv of each shape (timing needs
   shapes, not exact weights). The s2d rewrite can only win end-to-end if
   the s2d-shaped conv is >1.78x faster per FLOP.

2. **conv+BN epilogue fusion** — if XLA already fuses the BN stats
   reduction into the stem conv's consumer fusion, a hand-written Pallas
   epilogue has no HBM round-trip left to save. Checked by inspecting the
   compiled HLO for a fusion containing both the convolution and a
   reduce.

Timing uses a device->host read as the barrier (the tunnel's
block_until_ready returns early — CLAUDE.md).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 32
DT = jnp.bfloat16


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))),
                           out)  # warmup + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))),
                           out)
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w, stride=1):
    # bf16 in/out; MXU accumulates in f32 internally either way, and a
    # uniform dtype keeps the auto-derived VJP convs well-typed
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def probe_stage1_s2d():
    print("== probe 1: stage-1 conv lane utilization ==")
    rng = np.random.default_rng(0)

    # plain stage-1 conv: (B,128,128,64) -> 64, 3x3
    x1 = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), DT)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, DT)
    f1 = jax.jit(lambda x, w: conv(x, w))
    t_plain = bench(f1, x1, w1)
    flops_plain = B * 128 * 128 * 64 * (3 * 3 * 64) * 2

    # s2d-shaped conv: (B,64,64,256) -> 256, 2x2 (dense stand-in for the
    # sparse exact rewrite; same shapes => same timing)
    x2 = jnp.asarray(rng.normal(size=(B, 64, 64, 256)), DT)
    w2 = jnp.asarray(rng.normal(size=(2, 2, 256, 256)) * 0.05, DT)
    f2 = jax.jit(lambda x, w: conv(x, w))
    t_s2d = bench(f2, x2, w2)
    flops_s2d = B * 64 * 64 * 256 * (2 * 2 * 256) * 2

    # grads too — the backward pass is where the step time lives. A
    # random cotangent keeps XLA from algebraically simplifying the
    # backward convs (sum-loss gradients are analytically trivial).
    c1 = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), DT)
    c2 = jnp.asarray(rng.normal(size=(B, 64, 64, 256)), DT)

    def loss1(x, w, c):
        return jnp.sum((conv(x, w) * c).astype(jnp.float32))

    def loss2(x, w, c):
        return jnp.sum((conv(x, w) * c).astype(jnp.float32))

    g1 = jax.jit(jax.grad(loss1, argnums=(0, 1)))
    g2 = jax.jit(jax.grad(loss2, argnums=(0, 1)))
    t_plain_g = bench(g1, x1, w1, c1)
    t_s2d_g = bench(g2, x2, w2, c2)

    print(f"plain 3x3@128^2x64 : fwd {t_plain:7.3f} ms  grad {t_plain_g:7.3f} ms"
          f"  ({flops_plain / t_plain / 1e9:6.1f} GF/ms fwd)")
    print(f"s2d   2x2@64^2x256 : fwd {t_s2d:7.3f} ms  grad {t_s2d_g:7.3f} ms"
          f"  ({flops_s2d / t_s2d / 1e9:6.1f} GF/ms fwd)")
    ratio_fwd = t_s2d / t_plain
    ratio_g = t_s2d_g / t_plain_g
    print(f"s2d/plain wall ratio: fwd {ratio_fwd:.2f}x grad {ratio_g:.2f}x "
          f"(needs < 1.0 to win; carries 1.78x FLOPs)")
    return ratio_fwd, ratio_g


def probe_stem_bn_fusion():
    print("== probe 2: is the BN stats reduce fused with the stem conv? ==")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, 256, 256, 4)), DT)  # s2d stem input
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 64)) * 0.05, DT)

    def stem(x, w):
        y = conv(x, w)
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
        out = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.maximum(out, 0.0).astype(DT)

    jitted = jax.jit(stem)
    hlo = jitted.lower(x, w).compile().as_text()
    fused = False
    for block in hlo.split("fusion"):
        if "convolution" in block and "reduce" in block[:4000]:
            fused = True
            break
    n_fusion = hlo.count("fusion.")
    print(f"compiled HLO: {n_fusion} fusion refs; conv+reduce in one "
          f"fusion: {fused}")

    t = bench(jitted, x, w)
    # roofline: conv write 256^2*64*B*2B, stats read same, normalize
    # read+write — ~4 passes over 268 MB at 819 GB/s ~ 1.3 ms minimum
    bytes_act = B * 256 * 256 * 64 * 2
    print(f"stem conv+BN+ReLU fwd: {t:.3f} ms "
          f"(pure-HBM floor ~{3 * bytes_act / 819e9 * 1e3:.2f} ms for 3 "
          f"activation passes)")
    return t


def main():
    print("devices:", jax.devices())
    r = probe_stage1_s2d()
    t = probe_stem_bn_fusion()
    verdict = "s2d stage-1 LOSES" if r[0] >= 1.0 or r[1] >= 1.0 else \
        "s2d stage-1 shape is faster — exact rewrite may pay"
    print("verdict:", verdict)


if __name__ == "__main__":
    main()
