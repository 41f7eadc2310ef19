"""Quantify per-step dispatch overhead: per-call train steps vs a
lax.scan K-step megastep on the real chip.

Round-1 measured the jitted full step at ~48 ms (tools/bwd_profile.json)
but the bench loop achieves only ~55 ms/step (32/581 clips/s) — the gap
is host-side dispatch (pytree flatten of the params dict on one slow CPU
core + axon tunnel call latency). A scan over K steps dispatches once.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/megastep_probe.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scd_resnet_tpu.data.pipeline import augment_and_render_batch
from scd_resnet_tpu.models.center_net_offset import (
    CenterNetLoss,
    CenterNetResidual,
)

BATCH, SIZE, K = 32, 512, 10


def make_state():
    rng = np.random.default_rng(0)
    samples = rng.normal(180.0, 20.0, (BATCH, SIZE, SIZE)).astype(np.float32)
    locs = np.zeros((BATCH, 30, 8), np.float32)
    locs[:, :8] = rng.uniform(4, 100, (BATCH, 8, 8)).astype(np.float32)
    counts = np.full(BATCH, 8, np.int32)

    model = CenterNetResidual(num_layers=10, compute_dtype="bfloat16")
    loss_fn = CenterNetLoss(0.1, 0.1)
    tx = optax.adam(1.25e-4)

    x0 = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)

    def core(params, batch_stats, opt_state, samples, locs, counts, key):
        xs, ys = augment_and_render_batch(key, samples, locs, counts,
                                          SIZE // 4)

        def objective(p):
            outs, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                xs, train=True, mutable=["batch_stats"],
            )
            loss, _ = loss_fn([outs], ys)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            objective, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    return (core, jnp.asarray(samples), jnp.asarray(locs),
            jnp.asarray(counts), params, batch_stats, opt_state)


def main():
    (core, samples, locs, counts, params, batch_stats, opt_state) = (
        make_state()
    )

    single = jax.jit(core, donate_argnums=(0, 1, 2))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def mega(params, batch_stats, opt_state, samples, locs, counts, key):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            sub = jax.random.fold_in(key, i)
            params, batch_stats, opt_state, loss = core(
                params, batch_stats, opt_state, samples, locs, counts, sub)
            return (params, batch_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(K))
        return params, batch_stats, opt_state, losses

    key = jax.random.PRNGKey(1)

    # ---- per-call loop ----
    for i in range(3):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = single(
            params, batch_stats, opt_state, samples, locs, counts, sub)
    float(loss)
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = single(
            params, batch_stats, opt_state, samples, locs, counts, sub)
    float(loss)
    per_call = (time.perf_counter() - t0) / n * 1000
    print("per-call step: {:.2f} ms".format(per_call))

    # ---- megastep ----
    key, sub = jax.random.split(key)
    params, batch_stats, opt_state, losses = mega(
        params, batch_stats, opt_state, samples, locs, counts, sub)
    float(losses[-1])
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, losses = mega(
            params, batch_stats, opt_state, samples, locs, counts, sub)
    float(losses[-1])
    per_mega = (time.perf_counter() - t0) / (reps * K) * 1000
    print("megastep (K={}): {:.2f} ms/step".format(K, per_mega))
    print("dispatch overhead: {:.2f} ms/step".format(per_call - per_mega))


if __name__ == "__main__":
    main()
