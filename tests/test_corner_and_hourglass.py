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


def test_corner_box_pairing_exact():
    """Planted tl/br/center spikes must pair into the exact gt box and
    yield boxAP50 = 100 in the corner expression (the box-level metric
    the peak APs can't provide)."""
    from scd_resnet_tpu.models.corner_net import pair_corner_boxes

    hs, b, k = 16, 2, 5
    # gt: center (8, 8), |maj| = 3 (majX=3, majY=0), minL = 2
    # -> box tl (5, 6), br (11, 10)
    inds = np.zeros((b, k), np.int32)
    inds[:, 0] = 8 * hs + 8
    regr = np.zeros((b, k, 6), np.float32)
    regr[:, 0, 2], regr[:, 0, 4] = 3.0, 2.0
    mask = np.zeros((b, k), bool)
    mask[:, 0] = True

    def spike(y, x):
        h = np.full((b, hs, hs, 1), -8.0, np.float32)
        h[:, y, x, 0] = 8.0
        return jnp.array(h)

    out_dict = {"heatmap": spike(8, 8), "tl": spike(6, 5), "br": spike(10, 11)}
    heat_gt = np.zeros((b, hs, hs, 1), np.float32)
    heat_gt[:, 8, 8, 0] = 1.0
    tl_gt = np.zeros_like(heat_gt)
    tl_gt[:, 6, 5, 0] = 1.0
    br_gt = np.zeros_like(heat_gt)
    br_gt[:, 10, 11, 0] = 1.0
    ys = [jnp.array(heat_gt), jnp.array(mask), jnp.array(regr),
          jnp.array(inds), jnp.array(tl_gt), jnp.array(br_gt)]

    decoded = decode_corner_net(out_dict, k=4)
    _, _, _, _, tl_s, _, tl_y, tl_x, br_s, _, br_y, br_x, _ = decoded
    boxes, scores = pair_corner_boxes(
        out_dict["heatmap"], tl_s, tl_y, tl_x, br_s, br_y, br_x)
    top = np.asarray(boxes[0, 0])
    assert float(scores[0, 0]) > 0.9
    np.testing.assert_allclose(top, [5.0, 6.0, 11.0, 10.0])

    metrics = corner_net_evaluation(None, ys, *decoded)
    line = expression_corner_net([jax.device_get(metrics)])
    assert "[boxAP50] 100.0" in line, line


def test_corner_box_pairing_center_gate():
    """Pairs whose midpoint has no center-heat support are rejected."""
    from scd_resnet_tpu.models.corner_net import pair_corner_boxes

    b, k, hs = 1, 3, 16
    cold = jnp.full((b, hs, hs, 1), -8.0)  # sigmoid ~ 0 everywhere
    tl_s = jnp.array([[0.9, 0.0, 0.0]])
    br_s = jnp.array([[0.9, 0.0, 0.0]])
    tl_y = tl_x = jnp.array([[2.0, 0.0, 0.0]])
    br_y = br_x = jnp.array([[10.0, 0.0, 0.0]])
    _, scores = pair_corner_boxes(cold, tl_s, tl_y, tl_x, br_s, br_y, br_x)
    assert float(scores.max()) == -1.0


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


def test_stack_hourglass_remat_is_checkpoint_compatible():
    """remat=True (jax.checkpoint per hourglass) must produce the exact
    same parameter tree and outputs as remat=False — the scope names are
    pinned so the config flag can be flipped between runs/resumes — and
    gradients must flow through the rematted stacks."""
    x = jnp.ones((1, 64, 64, 1), jnp.float32) * 0.5
    kwargs = dict(
        hourglass_iterations=2, stacks=2, dimensions=(16, 24, 32),
        modules=(1, 1, 1), prediction_dim=32,
        terminals=(("heatmap", 1, -2.19),), pool_downsample=False,
    )
    plain = StackHourglass(**kwargs)
    remat = StackHourglass(remat=True, **kwargs)
    v_plain = plain.init(jax.random.PRNGKey(0), x, train=False)
    v_remat = remat.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v_plain["params"])
            == jax.tree_util.tree_structure(v_remat["params"]))

    out_plain = plain.apply(v_plain, x, train=False)
    out_remat = remat.apply(v_remat, x, train=False)
    assert jnp.allclose(out_plain[-1]["heatmap"], out_remat[-1]["heatmap"])

    def loss(params):
        outs, _ = remat.apply(
            {"params": params, "batch_stats": v_remat["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return sum(jnp.abs(o["heatmap"]).sum() for o in outs)

    grads = jax.grad(loss)(v_remat["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)


def test_hourglass_bf16_param_tree_matches_f32():
    """compute_dtype only changes activation precision: the parameter and
    batch-stats trees are identical to f32 (checkpoints interchangeable,
    params/BN stats stay f32), outputs come back f32 and finite."""
    import jax
    import jax.numpy as jnp

    from scd_resnet_tpu.models.center_net_offset import CenterNetHourglass

    x = jnp.zeros((1, 128, 128, 1), jnp.float32)
    v32 = CenterNetHourglass(stacks=1).init(jax.random.PRNGKey(0), x,
                                            train=False)
    vbf = CenterNetHourglass(stacks=1, compute_dtype="bfloat16").init(
        jax.random.PRNGKey(0), x, train=False)

    flat32 = jax.tree_util.tree_leaves_with_path(v32)
    flatbf = jax.tree_util.tree_leaves_with_path(vbf)
    assert [p for p, _ in flat32] == [p for p, _ in flatbf]
    for (_, a), (_, b) in zip(flat32, flatbf):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert a.dtype == jnp.float32 or a.dtype == jnp.int32

    outs = CenterNetHourglass(stacks=1, compute_dtype="bfloat16").apply(
        vbf, jnp.ones((1, 128, 128, 1)), train=False)
    for head, val in outs[-1].items():
        assert val.dtype == jnp.float32, head
        assert bool(jnp.isfinite(val).all()), head

    # remat changes neither the tree nor (at f32) the forward values
    vr = CenterNetHourglass(stacks=1, remat=True).init(
        jax.random.PRNGKey(0), x, train=False)
    out_plain = CenterNetHourglass(stacks=1).apply(
        v32, jnp.ones((1, 128, 128, 1)), train=False)
    out_remat = CenterNetHourglass(stacks=1, remat=True).apply(
        vr, jnp.ones((1, 128, 128, 1)), train=False)
    for head in out_plain[-1]:
        np.testing.assert_allclose(out_plain[-1][head], out_remat[-1][head],
                                   atol=0)


def test_compute_dtype_every_family_tree_matches_f32():
    """Every model family exposes compute_dtype (round-4: the corner/center/
    legacy families gained it so their bf16 configs stop silently running
    f32 — factory.py only forwards `precision` when the class has the
    field). bf16 instantiation must keep the f32 param/batch-stats tree
    (checkpoints interchangeable) and emit float32 heads."""
    from scd_resnet_tpu.models.center_net import CenterNetSizeResidual
    from scd_resnet_tpu.models.corner_net import CornerNetResidual
    from scd_resnet_tpu.models.corner_net_legacy import CornerNetLegacy

    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    cases = [
        (CornerNetResidual, dict(dims=TINY)),
        (CornerNetCPoolResidual, dict(dims=TINY)),
        (CornerNetCombined, dict(dims=TINY)),
        (CenterNetSizeResidual, dict(dims=TINY)),
        (CornerNetLegacy, dict(stacks=2, iterations=2,
                               dimensions=(16, 16, 32), modules=(1, 1, 1),
                               prediction_dim=16)),
    ]
    for cls, kw in cases:
        assert hasattr(cls, "compute_dtype"), cls.__name__
        v32 = cls(**kw).init(jax.random.PRNGKey(0), x, True)
        vbf = cls(compute_dtype="bfloat16", **kw).init(
            jax.random.PRNGKey(0), x, True)
        flat32 = jax.tree_util.tree_leaves_with_path(v32)
        flatbf = jax.tree_util.tree_leaves_with_path(vbf)
        assert [p for p, _ in flat32] == [p for p, _ in flatbf], cls.__name__
        for (_, a), (_, b) in zip(flat32, flatbf):
            assert a.shape == b.shape and a.dtype == b.dtype
        outs = cls(compute_dtype="bfloat16", **kw).apply(
            vbf, jnp.ones((1, 64, 64, 1)), False)
        for leaf in jax.tree_util.tree_leaves(outs):
            assert leaf.dtype == jnp.float32, cls.__name__


def test_pair_corner_boxes_center_gate_variants():
    """The three pairing gates (see pair_corner_boxes): a sharp
    (post-convergence) center peak 1-2 px off the floored pair midpoint is
    rejected by the default point gate and accepted by the window and peak
    gates; the peak gate additionally rejects a blurry non-maximal plateau
    that the window gate (measured split-negative round 5) lets through."""
    import jax.numpy as jnp
    import numpy as np

    from scd_resnet_tpu.models.corner_net import pair_corner_boxes

    hs = 16
    # one object: tl=(4,4), br=(11,9) -> floored midpoint (7, 6);
    # the true center peak sits at (8, 7) — off by (1, 1)
    ct = jnp.full((1, hs, hs, 1), -12.0)
    ct = ct.at[0, 7, 8, 0].set(6.0)  # sigmoid ~ 0.998, sharp delta
    tl_s = jnp.asarray([[0.9]]); tl_y = jnp.asarray([[4.0]]); tl_x = jnp.asarray([[4.0]])
    br_s = jnp.asarray([[0.8]]); br_y = jnp.asarray([[9.0]]); br_x = jnp.asarray([[11.0]])
    paired = (0.9 + 0.8) / 2

    _, scores_point = pair_corner_boxes(ct, tl_s, tl_y, tl_x, br_s, br_y,
                                        br_x)
    _, scores_win = pair_corner_boxes(ct, tl_s, tl_y, tl_x, br_s, br_y,
                                      br_x, center_gate="window")
    _, scores_peak = pair_corner_boxes(ct, tl_s, tl_y, tl_x, br_s, br_y,
                                       br_x, center_gate="peak")
    assert float(scores_point[0, 0]) == -1.0  # point gate rejects
    np.testing.assert_allclose(float(scores_win[0, 0]), paired)
    np.testing.assert_allclose(float(scores_peak[0, 0]), paired)

    # a flat low plateau near the midpoint: above threshold everywhere but
    # nowhere a meaningful local max score — all three gates see heat, the
    # point/window gates accept, NMS keeps the plateau's max so peak does
    # too only where a maximum survives with enough score
    far = jnp.full((1, hs, hs, 1), -12.0)
    for gate in ("point", "window", "peak"):
        _, scores_none = pair_corner_boxes(far, tl_s, tl_y, tl_x, br_s,
                                           br_y, br_x, center_gate=gate)
        assert float(scores_none[0, 0]) == -1.0, gate
