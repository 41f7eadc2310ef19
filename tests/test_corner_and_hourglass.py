"""Corner-family and hourglass model tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from scd_resnet_tpu.data.pipeline import augment_and_render_batch
from scd_resnet_tpu.models.corner_net import (
    CornerNetCombined,
    CornerNetCPoolResidual,
    CornerNetLoss,
    corner_net_evaluation,
    decode_corner_net,
)
from scd_resnet_tpu.models.hourglass import StackHourglass
from scd_resnet_tpu.train.expression import expression_corner_net

TINY = (16, 16, 32, 64, 128, 64, 64, 64)


def _batch(corner=True):
    rng = np.random.default_rng(0)
    b, size, k = 2, 64, 5
    samples = rng.normal(180, 20, (b, size, size)).astype(np.float32)
    locs = np.zeros((b, k, 8), np.float32)
    locs[:, 0] = [8, 8, 0.5, 0.5, 2.0, 1.0, 1.5, 4.0]
    locs[:, 1] = [4, 12, 0.1, 0.1, 1.0, 2.0, 1.0, 3.0]
    counts = np.full(b, 2, np.int32)
    xs, ys = augment_and_render_batch(
        jax.random.PRNGKey(0), jnp.array(samples), jnp.array(locs),
        jnp.array(counts), 16, augment=False, corner_targets=corner,
    )
    return xs, ys


def test_corner_targets_rendered():
    xs, ys = _batch()
    assert len(ys) == 6
    heat, tl, br = ys[0], ys[4], ys[5]
    assert tl.shape == heat.shape == br.shape == (2, 16, 16, 1)
    # corners land left/above and right/below the center respectively
    assert float(tl.max()) == 1.0 and float(br.max()) == 1.0
    ty, tx = np.unravel_index(np.asarray(tl[0, :, :, 0]).argmax(), (16, 16))
    by, bx = np.unravel_index(np.asarray(br[0, :, :, 0]).argmax(), (16, 16))
    assert tx < 8 <= bx and ty < 8 <= by


def test_corner_cpool_forward_loss_decode_eval():
    xs, ys = _batch()
    model = CornerNetCPoolResidual(num_layers=10, dims=TINY)
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    outs, _ = model.apply(variables, xs, train=True, mutable=["batch_stats"])
    assert set(outs) == {"heatmap", "tl", "br"}
    assert outs["tl"].shape == (2, 16, 16, 1)

    loss_fn = CornerNetLoss()
    loss, stats = loss_fn([outs], ys)
    assert np.isfinite(float(loss))

    grads = jax.grad(
        lambda p: loss_fn(
            [model.apply({"params": p,
                          "batch_stats": variables["batch_stats"]},
                         xs, train=True, mutable=["batch_stats"])[0]], ys)[0]
    )(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)

    decoded = decode_corner_net(outs, k=8)
    assert len(decoded) == 13
    metrics = corner_net_evaluation(None, ys, *decoded)
    line = expression_corner_net([jax.device_get(metrics)])
    assert "[heatPeakAP50]" in line and "[brPeakAP75]" in line


def test_corner_combined_slices_channels():
    xs, ys = _batch()
    model = CornerNetCombined(num_layers=10, dims=TINY)
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    outs = model.apply(variables, xs, train=False)
    assert outs["heatmap"].shape == (2, 16, 16, 3)
    loss, _ = CornerNetLoss(combined=True)([outs], ys)
    assert np.isfinite(float(loss))
    decoded = decode_corner_net(outs, k=8, combined=True)
    assert decoded[0].shape == (2, 8)


def test_stack_hourglass_two_stacks():
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    model = StackHourglass(
        hourglass_iterations=2, stacks=2, dimensions=(16, 24, 32),
        modules=(1, 1, 1), prediction_dim=32,
        terminals=(("heatmap", 1, -2.19), ("regr", 4, None)),
        pool_downsample=False,
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0]["heatmap"].shape == (1, 16, 16, 1)
    assert outs[1]["regr"].shape == (1, 16, 16, 4)
