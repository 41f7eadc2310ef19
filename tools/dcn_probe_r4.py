"""Round-4 DCN im2col lowering benchmark on the real chip.

Compares the three deform_conv2d lowerings (ops/dcn.py: gather / onehot /
pallas) at:

  (a) the production DCN shape — centerOffsetRes10dcn applies DCNv2 at the
      S/32 map: (32, 16, 16, 512), 3x3, f32 (the model casts to f32 around
      the DCN block, models/resnet.py:240);
  (b) the round-2 probe shape (8, 64, 64, 128) where the XLA gather was
      measured 5.8x a plain conv;
  (c) the full centerOffsetRes10dcn train step, 512^2 batch 32 bf16 —
      the number that decides the default (round-3 baseline: fwd 18.5 /
      fwd+bwd 67.0 ms vs 13.2/47.0 plain).

Timing uses a device->host read as the barrier (block_until_ready returns
early over the axon tunnel). Results land in tools/dcn_probe_r4.json and
docs/PERFORMANCE.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scd_resnet_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402


def _time_fn(fn, *args, reps: int = 20, warmup: int = 3) -> float:
    """Best-of-2 rounds of `reps` calls, ms per call; host-read barrier."""
    for _ in range(warmup):
        out = fn(*args)
    _read(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _read(out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def _read(out):
    leaf = out
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    if isinstance(leaf, dict):
        leaf = next(iter(leaf.values()))
    float(np.asarray(leaf).ravel()[0])


def bench_op(b, h, w, c, cout, methods):
    import jax
    import jax.numpy as jnp

    from scd_resnet_tpu.ops.dcn import deform_conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.05, jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0.3, 1.0, (b, h, w, 9)), jnp.float32)

    results = {}
    for method in methods:
        fwd = jax.jit(functools.partial(deform_conv2d, method=method))

        def loss(x, off, mask, wts, _m=method):
            return jnp.sum(
                deform_conv2d(x, off, mask, wts, method=_m) ** 2)

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        try:
            results[method] = {
                "fwd_ms": round(_time_fn(fwd, x, off, mask, wts), 3),
                "fwd_bwd_ms": round(_time_fn(bwd, x, off, mask, wts), 3),
            }
        except Exception as exc:  # infeasible (e.g. pallas VMEM budget)
            results[method] = {"error": str(exc)[:200]}
        print("  {}: {}".format(method, results[method]), flush=True)

    # plain conv reference at the same shape
    import jax.lax as lax

    conv = jax.jit(lambda x, w_: lax.conv_general_dilated(
        x, w_, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    results["plain_conv_fwd_ms"] = round(_time_fn(conv, x, wts), 3)
    print("  plain conv fwd: {} ms".format(results["plain_conv_fwd_ms"]),
          flush=True)
    return results


def bench_full_step(method: str) -> float:
    """centerOffsetRes10dcn full train step (512^2, batch 32, bf16), ms."""
    import jax
    import jax.numpy as jnp
    import optax

    from scd_resnet_tpu.data.pipeline import augment_and_render_batch
    from scd_resnet_tpu.models.center_net_offset import (
        CenterNetLoss,
        CenterNetResidual,
    )

    os.environ["SCD_DCN_METHOD"] = method  # read at trace time
    batch, size = 32, 512
    model = CenterNetResidual(num_layers=10, compute_dtype="bfloat16",
                              dcn=True)
    loss_fn = CenterNetLoss(0.1, 0.1)
    tx = optax.adam(1.25e-4)

    rng = np.random.default_rng(0)
    samples = jnp.asarray(
        rng.normal(180, 20, (batch, size, size)).astype(np.float32))
    locs = np.zeros((batch, 30, 8), np.float32)
    locs[:, 0] = [40, 40, 0.5, 0.5, 3.0, 1.0, 2.0, 6.0]
    locs = jnp.asarray(locs)
    counts = jnp.asarray(np.full(batch, 1, np.int32))

    x0 = jnp.zeros((batch, size, size, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        xs, ys = augment_and_render_batch(key, samples, locs, counts,
                                          size // 4)

        def objective(p):
            outs, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                xs, train=True, mutable=["batch_stats"])
            loss, _ = loss_fn([outs], ys)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            objective, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, sub)
    float(loss)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(15):
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, sub)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / 15 * 1e3)
    os.environ.pop("SCD_DCN_METHOD", None)
    return round(best, 2)


def main():
    enable_compilation_cache()
    out = {}

    print("(a) production DCN shape (32, 16, 16, 512) 3x3 f32:", flush=True)
    out["prod_shape"] = bench_op(32, 16, 16, 512, 512,
                                 ["gather", "onehot", "pallas"])

    print("(b) round-2 probe shape (8, 64, 64, 128) 3x3 f32:", flush=True)
    out["probe_shape"] = bench_op(8, 64, 64, 128, 128,
                                  ["gather", "onehot", "pallas"])

    print("(c) centerOffsetRes10dcn full step 512^2 b32 bf16:", flush=True)
    out["full_step_ms"] = {}
    for method in ("gather", "onehot", "pallas"):
        try:
            out["full_step_ms"][method] = bench_full_step(method)
        except Exception as exc:
            out["full_step_ms"][method] = "error: " + str(exc)[:200]
        print("  {}: {}".format(method, out["full_step_ms"][method]),
              flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dcn_probe_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
