"""Round-4 cornerCPool train-step probe: pool-backward lowering ablation.

The cpool-best-r4 cadence run exposed the corner-pool VJP as the step's
dominant cost: the original scatter-add lowering runs ~760 ms PER POOL at
the production shape (32,128,128,128) on v5e — in any dtype — so the four
pools of the two CornerPool heads ground the full step past 3 s. This
probe measures the full cornerCPoolRes10 train step (512², batch 32, bf16
trunk + f32 pools) under each backward lowering:

- ``pallas``  — one-pass kernel (ops/pallas_kernels.corner_pool_bwd_pallas),
  the TPU default;
- ``scan``    — the three-scan XLA composition (SCD_DISABLE_PALLAS_POOL=1;
  what the cpool-best-r4 run trained with);
- ``scatter`` — the original scatter-add (reconstructed here for the
  record; do not use).

Host-read barrier; best-of-2 rounds of 10 steps. Writes
tools/cpool_step_probe_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scd_resnet_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402


def step_ms(mode: str) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    import scd_resnet_tpu.ops.corner_pool as cp
    from scd_resnet_tpu.data.pipeline import augment_and_render_batch
    from scd_resnet_tpu.models.corner_net import (
        CornerNetCPoolResidual,
        CornerNetLoss,
    )

    if mode == "scan":
        os.environ["SCD_DISABLE_PALLAS_POOL"] = "1"
    else:
        os.environ.pop("SCD_DISABLE_PALLAS_POOL", None)
    if mode == "scatter":
        # reconstruct the original backward for the ablation record
        def scatter_bwd(axis, reverse, x, g):
            idx = cp._running_argmax(x, axis, reverse)
            return (cp._scatter_add_along_axis(x, idx, g, axis),)

        cp._directional_pool.defvjp(cp._pool_fwd, scatter_bwd)
    else:
        cp._directional_pool.defvjp(cp._pool_fwd, cp._pool_bwd)

    batch, size = 32, 512
    model = CornerNetCPoolResidual(compute_dtype="bfloat16")
    loss_fn = CornerNetLoss()
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
                                          size // 4, corner_targets=True)

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
    rounds = 1 if mode == "scatter" else 2  # scatter: seconds per step
    iters = 3 if mode == "scatter" else 10
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, sub)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return round(best, 2)


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--modes", nargs="*",
                        default=["pallas", "scan", "scatter"])
    args = parser.parse_args()

    enable_compilation_cache()
    out = {}
    for mode in args.modes:
        try:
            out[mode] = step_ms(mode)
        except Exception as exc:
            out[mode] = "error: " + str(exc)[:300]
        print(mode, out[mode], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cpool_step_probe_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
