"""Legacy model families: size-regression CenterNet and the full original
CornerNet with associative embeddings."""

import os
import jax
import jax.numpy as jnp
import numpy as np

from scd_resnet_tpu.data.pipeline import augment_and_render_batch
from scd_resnet_tpu.models.center_net import (
    CenterNetSizeLoss,
    CenterNetSizeResidual,
    center_net_size_evaluation,
    decode_center_net_size,
)
from scd_resnet_tpu.models.corner_net_legacy import (
    CornerNetLegacy,
    CornerNetLegacyLoss,
    decode_corner_net_legacy,
)

TINY = (16, 16, 32, 64, 128, 64, 64, 64)


def _raw_batch():
    rng = np.random.default_rng(1)
    b, size, k = 2, 64, 5
    samples = rng.normal(180, 20, (b, size, size)).astype(np.float32)
    locs = np.zeros((b, k, 8), np.float32)
    locs[:, 0] = [8, 8, 0.5, 0.5, 2.0, 1.0, 1.5, 4.0]
    locs[:, 1] = [4, 12, 0.1, 0.1, 1.0, 2.0, 1.0, 3.0]
    counts = np.full(b, 2, np.int32)
    return jnp.array(samples), jnp.array(locs), jnp.array(counts)


def test_center_net_size_family():
    samples, locs, counts = _raw_batch()
    xs, ys = augment_and_render_batch(jax.random.PRNGKey(0), samples, locs,
                                      counts, 16, augment=False)
    model = CenterNetSizeResidual(num_layers=10, dims=TINY)
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    outs = model.apply(variables, xs, train=False)
    assert outs["size"].shape == (2, 16, 16, 2)
    loss, stats = CenterNetSizeLoss()([outs], ys)
    assert np.isfinite(float(loss)) and len(stats) == 2
    decoded = decode_center_net_size(outs, k=8)
    assert decoded[4].shape == (2, 8, 2)
    metrics = center_net_size_evaluation(None, ys, *decoded)
    assert "iou" in metrics and "heat" in metrics


def test_legacy_corner_targets_layout():
    samples, locs, counts = _raw_batch()
    xs, ys = augment_and_render_batch(
        jax.random.PRNGKey(0), samples, locs, counts, 16, augment=False,
        corner_targets="legacy",
    )
    tl_heat, br_heat, mask, tl_regr, br_regr, tl_inds, br_inds = ys
    assert tl_heat.shape == (2, 16, 16, 1)
    assert tl_regr.shape == (2, 5, 2)
    # fractional offsets are in [0, 1)
    m = np.asarray(mask)
    fr = np.asarray(tl_regr)[m]
    assert np.all(fr >= 0) and np.all(fr < 1)
    # corner indices decode to pixels left/above the center
    ti = np.asarray(tl_inds)[0, 0]
    assert ti % 16 < 8 and ti // 16 < 8


def test_corner_net_legacy_small():
    samples, locs, counts = _raw_batch()
    xs, ys = augment_and_render_batch(
        jax.random.PRNGKey(0), samples, locs, counts, 16, augment=False,
        corner_targets="legacy",
    )
    model = CornerNetLegacy(
        categories=1, stacks=1, iterations=2,
        dimensions=(8, 12, 16), modules=(1, 1, 1),
        prediction_dim=16,
    )
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    outs = model.apply(variables, xs, train=False)
    assert isinstance(outs, list) and len(outs) == 1
    assert outs[0]["tl_heat"].shape == (2, 16, 16, 1)
    assert outs[0]["tl_tag"].shape == (2, 16, 16, 1)
    assert outs[0]["tl_regr"].shape == (2, 16, 16, 2)

    loss, stats = CornerNetLegacyLoss()(outs, ys)
    assert np.isfinite(float(loss)) and len(stats) == 4

    dets = decode_corner_net_legacy(outs[0], k=6, detection_count=20)
    assert dets.shape == (2, 20, 8)
    d = np.asarray(dets)
    kept = d[:, :, 4] > -1
    if kept.any():
        # kept pairs satisfy br >= tl
        assert np.all(d[:, :, 2][kept] >= d[:, :, 0][kept])
        assert np.all(d[:, :, 3][kept] >= d[:, :, 1][kept])


def test_corner_net_legacy_remat_checkpoint_compatible():
    """remat=True (per-stack jax.checkpoint on hourglasses AND corner
    branches) must match remat=False exactly: same parameter tree (scope
    names pinned) and same outputs, with finite flowing gradients."""
    x = jnp.ones((1, 64, 64, 1), jnp.float32) * 0.3
    kwargs = dict(categories=1, stacks=2, iterations=2,
                  dimensions=(8, 12, 16), modules=(1, 1, 1),
                  prediction_dim=16)
    plain = CornerNetLegacy(**kwargs)
    remat = CornerNetLegacy(remat=True, **kwargs)
    v_plain = plain.init(jax.random.PRNGKey(0), x, train=False)
    v_remat = remat.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v_plain["params"])
            == jax.tree_util.tree_structure(v_remat["params"]))
    out_p = plain.apply(v_plain, x, train=False)
    out_r = remat.apply(v_remat, x, train=False)
    for key in out_p[-1]:
        assert jnp.allclose(out_p[-1][key], out_r[-1][key]), key

    def loss(params):
        outs, _ = remat.apply(
            {"params": params, "batch_stats": v_remat["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return sum(jnp.abs(o["tl_heat"]).sum() + jnp.abs(o["br_tag"]).sum()
                   for o in outs)

    grads = jax.grad(loss)(v_remat["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)

def test_legacy_debug_overlays(tmp_path):
    """-debug overlays are defined for the legacy per-corner batch layout
    (factory.dump_debug_overlays): tl/br markers + box, PNGs written."""
    from types import SimpleNamespace

    from scd_resnet_tpu.train.factory import NetworkFactory

    samples, locs, counts = _raw_batch()
    xs, ys = augment_and_render_batch(
        jax.random.PRNGKey(0), samples, locs, counts, 16, augment=False,
        corner_targets="legacy",
    )
    stub = SimpleNamespace(
        profile=SimpleNamespace(corner_targets="legacy"),
        config=SimpleNamespace(dirResult=str(tmp_path), trainName="ovl"),
        _rebuild_last_batch=lambda: (xs, ys),
    )
    NetworkFactory.dump_debug_overlays(stub, it=7, max_clips=2)
    out = sorted(os.listdir(tmp_path / "debug.ovl"))
    assert out == ["it000007.clip0.png", "it000007.clip1.png"]
