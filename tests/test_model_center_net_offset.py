"""Smoke + semantics tests for the CenterNet-offset model family on tiny
shapes (CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from scd_resnet_tpu.models.center_net_offset import (
    CenterNetLoss,
    CenterNetResidual,
    center_net_evaluation,
    decode_center_net,
)


def _tiny_model():
    # quarter-width dims keep CPU compile time low; 64x64 input -> 16x16 heads
    return CenterNetResidual(num_layers=10, dims=[16, 16, 32, 64, 128, 64, 64, 64],
                             terminal_hidden=32)


def test_forward_shapes_and_loss_grad():
    model = _tiny_model()
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert outs["heatmap"].shape == (2, 16, 16, 1)
    assert outs["regr"].shape == (2, 16, 16, 4)
    assert outs["offset"].shape == (2, 16, 16, 2)

    # heatmap prior init: bias -2.19 => sigmoid ~ 0.1
    p = jax.nn.sigmoid(np.asarray(outs["heatmap"])).mean()
    assert 0.03 < p < 0.3

    k = 5
    heat_gt = jnp.zeros((2, 16, 16, 1)).at[:, 4, 4, 0].set(1.0)
    tag_mask = jnp.zeros((2, k), bool).at[:, 0].set(True)
    regr_gt = jnp.zeros((2, k, 6)).at[:, 0].set(
        jnp.array([0.5, 0.5, 2.0, 1.0, 1.5, 4.0]))
    inds = jnp.zeros((2, k), jnp.int32).at[:, 0].set(4 * 16 + 4)
    ys = [heat_gt, tag_mask, regr_gt, inds]

    loss_fn = CenterNetLoss(0.1, 0.1)

    def compute(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        loss, stats = loss_fn([out], ys)
        return loss

    loss, grads = jax.value_and_grad(compute)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_decode_and_evaluation_pipeline():
    rng = np.random.default_rng(0)
    b, h, w = 2, 16, 16
    out = {
        "heatmap": jnp.array(rng.standard_normal((b, h, w, 1)), jnp.float32),
        "regr": jnp.array(rng.standard_normal((b, h, w, 4)), jnp.float32),
        "offset": jnp.array(rng.standard_normal((b, h, w, 2)), jnp.float32),
    }
    decoded = decode_center_net(out, k=10)
    scores, inds, ys_, xs_, offset, regr, _ = decoded
    assert scores.shape == (b, 10)
    assert offset.shape == (b, 10, 2)
    assert regr.shape == (b, 10, 4)
    # scores sorted descending
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)
    # peak consistency: the top peak really is the max of the sigmoid map
    sig = 1 / (1 + np.exp(-np.asarray(out["heatmap"][..., 0])))
    np.testing.assert_allclose(s[:, 0], sig.reshape(b, -1).max(1), atol=1e-5)

    k = 5
    tag_mask = jnp.zeros((b, k), bool).at[:, :2].set(True)
    regr_gt = jnp.array(rng.random((b, k, 6)), jnp.float32) + 1.0
    gt_inds = jnp.array(rng.integers(0, 128 * 128, (b, k)), jnp.int32)
    heat_gt = jnp.zeros((b, h, w, 1))
    ys = [heat_gt, tag_mask, regr_gt, gt_inds]
    metrics = center_net_evaluation(None, ys, *decoded)
    iou_vals, iou_scores, iou_mask = metrics["iouscore"]
    assert iou_vals.shape == (b, 10, k)
    assert metrics["objs"].shape == (b,)
    assert float(metrics["objs"].sum()) == 4.0
    # masked IoU values, where defined, are within (0, 1]
    m = np.asarray(iou_mask)
    if m.any():
        v = np.asarray(iou_vals)[m]
        assert np.all(v > 0) and np.all(v <= 1 + 1e-6)
