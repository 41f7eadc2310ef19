"""Per-stage forward/backward cost breakdown of the flagship train step on
the local accelerator (VERDICT r1 next #4: characterize where the backward
time goes before optimizing it).

Times, at the production shape (512x512, batch 32, bf16):
  - the full train step, forward-only, and forward+backward;
  - each backbone segment's fwd and fwd+bwd at its real activation shape
    (stem, stage1..4, deconv stack, heads, BN-only ablation);
  - a space-to-depth stem variant (the MLPerf-style rewrite of the
    7x7/s2 conv on a 1-channel input, which is MXU-layout-hostile).

Writes a JSON report (tools/bwd_profile.json by default) and prints a
table. Timing barrier is a device->host read (axon's block_until_ready
returns early, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _time(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def _sync(out):
    leaf = None
    import jax

    for x in jax.tree_util.tree_leaves(out):
        leaf = x
        break
    if leaf is not None:
        np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def segment_times(batch: int, dtype_str: str, iters: int):
    """fwd and fwd+bwd ms for each backbone segment at its real shape."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from scd_resnet_tpu.models.layers import BatchNorm, max_pool_3x3_s2
    from scd_resnet_tpu.models.resnet import BasicBlock, TerminalSpec, TerminalHead

    dtype = jnp.dtype(dtype_str)
    rng = jax.random.PRNGKey(0)
    results = {}

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, dtype=dtype)(x)
            x = BatchNorm()(x, train)
            return max_pool_3x3_s2(nn.relu(x))

    class S2DStem(nn.Module):
        """Space-to-depth stem: 4x4 blocks -> 16 channels, then a 2x2/s1
        conv reproducing the 7x7/s2 + 3x3/s2-maxpool receptive geometry
        approximately (candidate rewrite, not numerics-equivalent)."""

        @nn.compact
        def __call__(self, x, train=True):
            b, h, w, c = x.shape
            x = x.reshape(b, h // 4, 4, w // 4, 4, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)
            x = nn.Conv(64, (2, 2), padding="SAME", use_bias=False,
                        dtype=dtype)(x)
            x = BatchNorm()(x, train)
            return nn.relu(x)

    class Stage(nn.Module):
        features: int
        stride: int

        @nn.compact
        def __call__(self, x, train=True):
            down = self.stride != 1 or x.shape[-1] != self.features
            return BasicBlock(self.features, self.stride, downsample=down,
                              dtype=dtype)(x, train)

    class Deconvs(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for f in (256, 256, 256):
                x = nn.ConvTranspose(f, (4, 4), strides=(2, 2),
                                     padding="SAME", use_bias=False,
                                     dtype=dtype)(x)
                x = BatchNorm()(x, train)
                x = nn.relu(x)
            return x

    class Heads(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            specs = [TerminalSpec("heatmap", 1, 128, final_bias=-2.19),
                     TerminalSpec("regr", 4, 128, small_init=True),
                     TerminalSpec("offset", 2, 128, small_init=True)]
            return {s.name: TerminalHead(s, dtype=dtype)(x) for s in specs}

    segments = [
        ("stem 7x7/s2 (512^2x1->128^2x64)", Stem(), (batch, 512, 512, 1)),
        ("s2d stem candidate (512^2x1->128^2x64)", S2DStem(),
         (batch, 512, 512, 1)),
        ("stage1 64ch @128^2", Stage(64, 1), (batch, 128, 128, 64)),
        ("stage2 128ch @64^2", Stage(128, 2), (batch, 128, 128, 64)),
        ("stage3 256ch @32^2", Stage(256, 2), (batch, 64, 64, 128)),
        ("stage4 512ch @16^2", Stage(512, 2), (batch, 32, 32, 256)),
        ("deconv x3 (16^2x512->128^2x256)", Deconvs(), (batch, 16, 16, 512)),
        ("heads x3 @128^2x256", Heads(), (batch, 128, 128, 256)),
    ]

    for name, module, shape in segments:
        x = jax.random.normal(rng, shape, jnp.float32)
        variables = module.init(rng, x, train=False)

        @jax.jit
        def fwd(v, x, module=module):
            out, _ = module.apply(v, x, train=True, mutable=["batch_stats"])
            return out

        def loss(v, x, module=module):
            out, _ = module.apply(v, x, train=True, mutable=["batch_stats"])
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                       for l in leaves)

        grad = jax.jit(jax.grad(loss))
        results[name] = {
            "fwd_ms": round(_time(fwd, variables, x, iters=iters), 3),
            "fwd_bwd_ms": round(_time(grad, variables, x, iters=iters), 3),
        }
    return results


def full_step_times(batch: int, dtype_str: str, iters: int):
    import jax
    import jax.numpy as jnp
    import optax

    from scd_resnet_tpu.data.pipeline import augment_and_render_batch
    from scd_resnet_tpu.models.center_net_offset import (
        CenterNetLoss,
        CenterNetResidual,
    )

    size, heat = 512, 128
    model = CenterNetResidual(num_layers=10, compute_dtype=dtype_str)
    loss_fn = CenterNetLoss(0.1, 0.1)
    tx = optax.adam(1.25e-4)

    rng = np.random.default_rng(0)
    samples = jnp.asarray(
        rng.normal(180, 20, (batch, size, size)).astype(np.float32))
    locs = np.zeros((batch, 30, 8), np.float32)
    locs[:, :8, :] = rng.uniform(4, 10, (batch, 8, 8))
    locs = jnp.asarray(locs)
    counts = jnp.full((batch,), 8, jnp.int32)

    x0 = jnp.zeros((batch, size, size, 1), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x0)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def render(key):
        return augment_and_render_batch(key, samples, locs, counts, heat)

    xs, ys = render(key)

    @jax.jit
    def fwd(params, batch_stats, xs):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           xs, train=True, mutable=["batch_stats"])

    @jax.jit
    def fwd_bwd(params, batch_stats, xs, ys):
        def obj(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xs,
                train=True, mutable=["batch_stats"])
            loss, _ = loss_fn([outs], ys)
            return loss, mut["batch_stats"]
        (loss, bs), grads = jax.value_and_grad(obj, has_aux=True)(params)
        return loss, grads

    @jax.jit
    def full(params, batch_stats, opt_state, key):
        xs, ys = augment_and_render_batch(key, samples, locs, counts, heat)

        def obj(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xs,
                train=True, mutable=["batch_stats"])
            loss, _ = loss_fn([outs], ys)
            return loss, mut["batch_stats"]
        (loss, bs), grads = jax.value_and_grad(obj, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, new_opt, loss

    report = {
        "augment_render_ms": round(_time(render, key, iters=iters), 3),
        "fwd_ms": round(_time(fwd, params, batch_stats, xs, iters=iters), 3),
        "fwd_bwd_ms": round(
            _time(fwd_bwd, params, batch_stats, xs, ys, iters=iters), 3),
        "full_step_ms": round(
            _time(full, params, batch_stats, opt_state, key, iters=iters), 3),
    }

    # MFU from XLA's own cost analysis (flops of the compiled full step)
    # against v5e bf16 peak (197 TFLOP/s); best-effort — some backends
    # don't expose cost_analysis
    try:
        compiled = full.lower(params, batch_stats, opt_state, key).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis["flops"])
        peak = 197e12
        report["step_flops"] = flops
        report["mfu_pct_vs_v5e_bf16_peak"] = round(
            flops / (report["full_step_ms"] / 1e3) / peak * 100, 2)
    except Exception as exc:  # noqa: BLE001
        report["mfu_note"] = f"cost_analysis unavailable: {exc}"
    return report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--out", default="tools/bwd_profile.json")
    parser.add_argument("--segments-only", action="store_true")
    args = parser.parse_args()

    report = {"batch": args.batch, "dtype": args.dtype}
    if not args.segments_only:
        report["full"] = full_step_times(args.batch, args.dtype, args.iters)
    report["segments"] = segment_times(args.batch, args.dtype, args.iters)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
