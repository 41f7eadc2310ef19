"""In-step marginal cost of each backbone segment of the flagship model.

tools/bwd_profile.py times segments as ISOLATED jitted programs, which
inflates small segments with dispatch overhead (its segment fwd sum is
~3x the real in-step forward). This probe instead times the jitted
fwd+bwd of increasing PREFIXES of the real CenterNetResidual trunk with
a scalar mean loss — consecutive differences are each segment's marginal
cost inside one fused XLA program, which is what an optimization of that
segment can actually recover.

Run on the real chip:  python tools/instep_profile.py  (writes
tools/instep_profile.json).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.device_get(x if getattr(x, "ndim", 1) == 0 else x.ravel()[0]))


def _time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--out", default="tools/instep_profile.json")
    args = parser.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from scd_resnet_tpu.models.layers import BatchNorm, max_pool_3x3_s2
    from scd_resnet_tpu.models.resnet import (
        DEFAULT_DIMENSIONS,
        RESNET_SPEC,
        StemConv7x7S2,
        TerminalHead,
        TerminalSpec,
    )

    dtype = jnp.bfloat16
    dims = DEFAULT_DIMENSIONS
    block, stages = RESNET_SPEC[10]

    class Prefix(nn.Module):
        """The CenterNetResidual trunk cut after `upto` segments."""

        upto: int  # 1=stem, 2..5=+stage1..4, 6=+deconvs, 7=+heads

        @nn.compact
        def __call__(self, x, train=True):
            x = StemConv7x7S2(dims[0], dtype=dtype, name="Conv_0")(x)
            x = BatchNorm(dtype=dtype)(x, train)
            x = nn.relu(x)
            x = max_pool_3x3_s2(x)
            seg = 1
            for stage_idx, (features, blocks) in enumerate(
                    zip(dims[1:5], stages)):
                if seg >= self.upto:
                    return x
                stride = 1 if stage_idx == 0 else 2
                needs_down = (stride != 1
                              or x.shape[-1] != features * block.expansion)
                x = block(features, stride, downsample=needs_down,
                          dtype=dtype)(x, train)
                for _ in range(1, blocks):
                    x = block(features, dtype=dtype)(x, train)
                seg += 1
            if seg >= self.upto:
                return x
            for features in dims[5:8]:
                x = nn.ConvTranspose(features, (4, 4), strides=(2, 2),
                                     padding="SAME", use_bias=False,
                                     dtype=dtype)(x)
                x = BatchNorm(dtype=dtype)(x, train)
                x = nn.relu(x)
            seg += 1
            if seg >= self.upto:
                return x
            heads = [
                TerminalSpec("heatmap", 1, hidden=128, final_bias=-2.19),
                TerminalSpec("regr", 4, hidden=128, small_init=True),
                TerminalSpec("offset", 2, hidden=128, small_init=True),
            ]
            outs = [TerminalHead(s, dtype=dtype, name=s.name)(x)
                    for s in heads]
            return jnp.concatenate([o.astype(jnp.float32) for o in outs], -1)

    names = ["stem", "+stage1", "+stage2", "+stage3", "+stage4",
             "+deconv x3", "+heads x3"]
    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.normal(0, 1, (args.batch, args.size, args.size, 1))
                      .astype(np.float32))

    report = {"batch": args.batch, "size": args.size, "prefix_ms": {},
              "marginal_ms": {}}
    prev = 0.0
    for upto, name in enumerate(names, start=1):
        model = Prefix(upto=upto)
        variables = model.init(jax.random.PRNGKey(0), xin, train=True)
        params, bstats = variables["params"], variables.get("batch_stats", {})

        @jax.jit
        def step(p, b, x):
            def objective(pp):
                out, updated = Prefix(upto=upto).apply(
                    {"params": pp, "batch_stats": b}, x, train=True,
                    mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2), updated

            (loss, _), grads = jax.value_and_grad(
                objective, has_aux=True)(p)
            return loss, jax.tree_util.tree_map(lambda g: g.sum(), grads)

        fn = functools.partial(step, params, bstats)
        ms = _time(lambda: fn(xin)[0], iters=args.iters)
        report["prefix_ms"][name] = round(ms, 2)
        report["marginal_ms"][name] = round(ms - prev, 2)
        print(f"{name:12s} prefix {ms:7.2f} ms   marginal {ms - prev:7.2f} ms",
              flush=True)
        prev = ms

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
