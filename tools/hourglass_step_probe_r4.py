"""Round-4 hourglass train-step probe: remat on vs off at batch 32/512².

The full-cadence run made centerOffsetHourglass the accuracy champion
(mIoU 70.7 / AP50 82.3 — CLAUDE.md), so its ~150 ms step is the new
training-throughput frontier. The 1-stack model was trained with
"remat": true for safety (the 2-stack legacy OOMs without it); this
measures whether batch 32 actually fits WITHOUT remat and what the
recompute costs. Host-read barrier; best-of-2 rounds of 10 steps.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scd_resnet_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402


def step_ms(remat: bool, dtype: str, stacks: int = 1) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from scd_resnet_tpu.data.pipeline import augment_and_render_batch
    from scd_resnet_tpu.models.center_net_offset import (
        CenterNetHourglass,
        CenterNetLoss,
    )

    batch, size = 32, 512
    model = CenterNetHourglass(stacks=stacks, remat=remat,
                               compute_dtype=dtype)
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
            loss, _ = loss_fn(outs, ys)
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
        for _ in range(10):
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, sub)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
    return round(best, 2)


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--stacks", type=int, default=1)
    parser.add_argument("--dtypes", nargs="*",
                        default=["float32", "bfloat16"])
    args = parser.parse_args()

    enable_compilation_cache()
    out = {}
    for dtype in args.dtypes:
        for remat in (False, True):
            label = "{}_{}".format(dtype, "remat" if remat else "noremat")
            try:
                out[label] = step_ms(remat, dtype, args.stacks)
            except Exception as exc:
                out[label] = "error: " + str(exc)[:300]
            print(label, out[label], flush=True)
    suffix = "" if args.stacks == 1 else "_stacks{}".format(args.stacks)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "hourglass_step_probe_r4{}.json".format(suffix))
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
