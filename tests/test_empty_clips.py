"""Zero-object clips must flow through augmentation, losses, and decode
without NaNs — the reference's all-negative focal fallback path
(focal.py:46-49) and the masked-L1 zero-denominator guard."""

import jax
import jax.numpy as jnp
import numpy as np

from scd_resnet_tpu.data.pipeline import augment_and_render_batch
from scd_resnet_tpu.models.center_net_offset import (
    CenterNetLoss,
    CenterNetResidual,
    center_net_evaluation,
    decode_center_net,
)

TINY = (16, 16, 32, 64, 128, 64, 64, 64)


def test_empty_batch_trains_without_nans():
    rng = np.random.default_rng(0)
    b, size = 2, 64
    samples = rng.normal(180, 20, (b, size, size)).astype(np.float32)
    locs = np.zeros((b, 5, 8), np.float32)
    counts = np.zeros(b, np.int32)  # no objects at all

    xs, ys = augment_and_render_batch(
        jax.random.PRNGKey(0), samples, locs, counts, 16)
    assert float(ys[0].max()) == 0.0  # empty heatmap
    assert not bool(ys[1].any())      # empty tag mask

    model = CenterNetResidual(num_layers=10, dims=TINY, terminal_hidden=32)
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    loss_fn = CenterNetLoss(0.1, 0.1)

    def objective(p):
        outs, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            xs, train=True, mutable=["batch_stats"])
        loss, stats = loss_fn([outs], ys)
        return loss

    loss, grads = jax.value_and_grad(objective)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))

    # decode + evaluation on the empty batch stays finite-masked
    outs = model.apply(variables, xs, train=False)
    decoded = decode_center_net(outs, k=10)
    metrics = center_net_evaluation(None, ys, *decoded)
    assert float(metrics["objs"].sum()) == 0.0
    _vals, _scores, mask = metrics["iouscore"]
    # no ground truth boxes -> gt area 0 -> nothing passes the pair mask
    assert not bool(np.asarray(mask).any())
    for key in ("ioucenter", "iouoffset", "iouoffsetwo", "ortho"):
        total, count = metrics[key]
        assert np.isfinite(float(total))
