"""In-step attribution for the hourglass train step (round 4).

The bf16 1-stack centerOffsetHourglass is the accuracy champion
(CLAUDE.md: mIoU 70.3-70.7 at cadence) and its 71.7 ms step is the new
training frontier, so this applies the prefix-marginal method of
tools/instep_profile.py to the StackHourglass trunk: time the jitted
fwd+bwd+adam of increasing PREFIXES of the real step (scalar mean-square
loss on the prefix output), so consecutive differences are each
segment's marginal cost inside one fused XLA program.

Depth prefixes truncate the RECURSION: ``hg_d{k}`` builds
``Hourglass(k, dims[:k+1], mods[:k+1])`` — incrementing k swaps the
innermost central residual stack for one more half-resolution level, so
marginal(k) slightly understates the added level by the removed central
stack. The ``full`` anchor is the production step (real CenterNetLoss +
augment+render), same construction as the full-cadence runs; MFU comes
from XLA's own cost analysis of that compiled step vs the v5e bf16 peak
(197 TFLOP/s), the tools/bwd_profile.py convention.

Run on the real chip:  python tools/hourglass_instep_probe_r4.py
(writes tools/hourglass_instep_probe_r4.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scd_resnet_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

DIMS = (128, 128, 192, 192, 192, 256)
MODS = (2, 2, 2, 2, 2, 4)
DTYPE = "bfloat16"


def _build_prefix(upto: str):
    """A flax module running the StackHourglass trunk cut at `upto`."""
    import flax.linen as nn
    import jax.numpy as jnp

    from scd_resnet_tpu.models.hourglass import Hourglass, HourglassHead
    from scd_resnet_tpu.models.layers import ConvBlock
    from scd_resnet_tpu.models.resnet import Residual

    dt = jnp.dtype(DTYPE)

    class Prefix(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = ConvBlock(128, 7, stride=2, dtype=dt)(x, train)
            x = Residual(DIMS[0], stride=2, dtype=dt)(x, train)
            if upto == "pre":
                return x
            depth = int(upto[4]) if upto.startswith("hg_d") else 5
            x = Hourglass(depth, DIMS[: depth + 1], MODS[: depth + 1],
                          pool_downsample=False, dtype=dt)(x, train)
            if upto.startswith("hg_d"):
                return x
            x = ConvBlock(256, 3, dtype=dt)(x, train)
            if upto == "cnv":
                return x
            outs = [HourglassHead(f, DIMS[0], final_bias=b, dtype=dt,
                                  name=n)(x)
                    for n, f, b in (("heatmap", 1, -2.19), ("regr", 4, None),
                                    ("offset", 2, None))]
            return jnp.concatenate(outs, axis=-1)

    return Prefix()


def _time_step(step, args0, iters=20, warmup=3):
    import jax

    state = args0
    for _ in range(warmup):
        state, loss = step(*state)
    float(jax.device_get(loss))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(*state)
        float(jax.device_get(loss))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def _make_inputs(batch, size):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    samples = jnp.asarray(
        rng.normal(180, 20, (batch, size, size)).astype(np.float32))
    locs = np.zeros((batch, 30, 8), np.float32)
    locs[:, 0] = [40, 40, 0.5, 0.5, 3.0, 1.0, 2.0, 6.0]
    return samples, jnp.asarray(locs), jnp.asarray(
        np.full(batch, 1, np.int32))


def prefix_ms(upto: str, batch=32, size=512) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from scd_resnet_tpu.data.pipeline import augment_and_render_batch

    model = _build_prefix(upto)
    tx = optax.adam(1.25e-4)
    samples, locs, counts = _make_inputs(batch, size)

    x0 = jnp.zeros((batch, size, size, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        xs, _ = augment_and_render_batch(key, samples, locs, counts,
                                         size // 4)

        def objective(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                xs, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32))), \
                mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            objective, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt,
                jax.random.split(key)[0]), loss

    return _time_step(step, (params, batch_stats, opt_state,
                             jax.random.PRNGKey(1)))


def full_ms_and_mfu(batch=32, size=512):
    import jax
    import jax.numpy as jnp
    import optax

    from scd_resnet_tpu.data.pipeline import augment_and_render_batch
    from scd_resnet_tpu.models.center_net_offset import (
        CenterNetHourglass,
        CenterNetLoss,
    )

    model = CenterNetHourglass(stacks=1, compute_dtype=DTYPE)
    loss_fn = CenterNetLoss(0.1, 0.1)
    tx = optax.adam(1.25e-4)
    samples, locs, counts = _make_inputs(batch, size)

    x0 = jnp.zeros((batch, size, size, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        xs, ys = augment_and_render_batch(key, samples, locs, counts,
                                          size // 4)

        def objective(p):
            outs, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                xs, train=True, mutable=["batch_stats"])
            loss, _ = loss_fn(outs, ys)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            objective, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt,
                jax.random.split(key)[0]), loss

    ms = _time_step(step, (params, batch_stats, opt_state,
                           jax.random.PRNGKey(1)))
    mfu = flops = None
    try:
        compiled = step.lower(params, batch_stats, opt_state,
                              jax.random.PRNGKey(1)).compile()
        flops = float(compiled.cost_analysis()["flops"])
        mfu = round(flops / (ms / 1e3) / 197e12 * 100, 2)
    except Exception as exc:  # pragma: no cover - backend-dependent
        print("cost_analysis unavailable:", exc)
    return ms, flops, mfu


def main():
    enable_compilation_cache()
    order = ["pre", "hg_d1", "hg_d2", "hg_d3", "hg_d4", "hg_d5", "cnv",
             "heads"]
    report = {"dtype": DTYPE, "batch": 32, "size": 512, "prefix_ms": {},
              "marginal_ms": {}}
    prev = 0.0
    for name in order:
        ms = round(prefix_ms(name), 2)
        report["prefix_ms"][name] = ms
        report["marginal_ms"][name] = round(ms - prev, 2)
        print(f"{name:8s} prefix {ms:7.2f} ms   marginal {ms - prev:7.2f}",
              flush=True)
        prev = ms
    ms, flops, mfu = full_ms_and_mfu()
    report["full_step_ms"] = round(ms, 2)
    report["loss_opt_marginal_ms"] = round(ms - prev, 2)
    if flops:
        report["step_flops"] = flops
        report["mfu_pct_vs_v5e_bf16_peak"] = mfu
    print("full", round(ms, 2), "ms  mfu", mfu, flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "hourglass_instep_probe_r4.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
