"""Decode and loss semantics vs independent torch/numpy oracles
(reference semantics: models/backbones/utility.py:87-122,
models/losses/{focal,regression,embeddings}.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from scd_resnet_tpu.ops.decode import (
    clamp_sigmoid,
    extract_topk,
    non_maximum_suppression,
    reshape_gather_features,
)
from scd_resnet_tpu.ops.losses import (
    embedding_loss,
    focal_loss,
    l1_loss_mask,
    smooth_l1_loss_mask,
)
from scd_resnet_tpu.ops.corner_pool import bottom_pool, left_pool, right_pool, top_pool


def test_nms_matches_maxpool_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    got = np.asarray(non_maximum_suppression(jnp.array(x), 3))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    hmax = F.max_pool2d(tx, 3, stride=1, padding=1)
    want = (tx * (hmax == tx).float()).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_extract_topk_matches_torch_topk():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    scores, inds, cats, ys, xs = (np.asarray(a) for a in extract_topk(jnp.array(x), 5))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2).reshape(2, -1)
    tscores, tinds = torch.topk(tx, 5)
    np.testing.assert_allclose(scores, tscores.numpy(), atol=1e-6)
    np.testing.assert_array_equal(cats, (tinds // 64).numpy())
    np.testing.assert_array_equal(inds, (tinds % 64).numpy())
    np.testing.assert_array_equal(ys, ((tinds % 64) // 8).float().numpy())
    np.testing.assert_array_equal(xs, ((tinds % 64) % 8).float().numpy())


def test_reshape_gather_features():
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((2, 4, 4, 6)).astype(np.float32)
    ind = np.array([[0, 5, 15], [3, 3, 7]], np.int32)
    got = np.asarray(reshape_gather_features(jnp.array(feat), jnp.array(ind)))
    want = feat.reshape(2, 16, 6)[np.arange(2)[:, None], ind]
    np.testing.assert_allclose(got, want, atol=1e-6)


def _oracle_focal(preds, gt, alpha=2, beta=4):
    pos = gt == 1
    neg = gt < 1
    negw = (1 - gt[neg]) ** beta
    loss = 0.0
    for p in preds:
        pl = (np.log(p[pos]) * (1 - p[pos]) ** alpha).sum()
        nl = (np.log(1 - p[neg]) * p[neg] ** alpha * negw).sum()
        npos = pos.sum()
        loss = loss - (nl if npos == 0 else (pl + nl) / npos)
    return loss


def test_focal_loss_matches_oracle():
    rng = np.random.default_rng(4)
    gt = np.clip(rng.random((2, 8, 8, 1)).astype(np.float32), 0, 0.999)
    gt[0, 2, 3, 0] = 1.0
    gt[1, 5, 5, 0] = 1.0
    p = np.clip(rng.random((2, 8, 8, 1)).astype(np.float32), 1e-4, 1 - 1e-4)
    got = float(focal_loss([jnp.array(p)], jnp.array(gt)))
    want = _oracle_focal([p], gt)
    assert abs(got - want) < 1e-3 * max(1, abs(want))


def test_focal_loss_all_negative_fallback():
    rng = np.random.default_rng(5)
    gt = np.clip(rng.random((1, 8, 8, 1)).astype(np.float32), 0, 0.9)
    p = np.clip(rng.random((1, 8, 8, 1)).astype(np.float32), 1e-4, 1 - 1e-4)
    got = float(focal_loss([jnp.array(p)], jnp.array(gt)))
    want = _oracle_focal([p], gt)
    assert abs(got - want) < 1e-4 * max(1, abs(want))


def test_l1_mask_matches_torch():
    rng = np.random.default_rng(6)
    r = rng.standard_normal((2, 5, 4)).astype(np.float32)
    g = rng.standard_normal((2, 5, 4)).astype(np.float32)
    m = np.array([[1, 1, 0, 0, 0], [1, 1, 1, 0, 0]], bool)
    got = float(l1_loss_mask(jnp.array(r), jnp.array(g), jnp.array(m)))
    tm = torch.from_numpy(m).unsqueeze(2).expand(2, 5, 4)
    want = F.l1_loss(torch.from_numpy(r)[tm], torch.from_numpy(g)[tm],
                     reduction="sum") / (m.sum() + 1e-4)
    assert abs(got - float(want)) < 1e-5


def test_smooth_l1_mask_matches_torch():
    rng = np.random.default_rng(7)
    r = rng.standard_normal((2, 5, 4)).astype(np.float32) * 2
    g = rng.standard_normal((2, 5, 4)).astype(np.float32)
    m = np.array([[1, 0, 1, 0, 0], [1, 1, 1, 1, 0]], bool)
    got = float(smooth_l1_loss_mask(jnp.array(r), jnp.array(g), jnp.array(m)))
    tm = torch.from_numpy(m).unsqueeze(2).expand(2, 5, 4)
    want = F.smooth_l1_loss(torch.from_numpy(r)[tm], torch.from_numpy(g)[tm],
                            reduction="sum") / (m.sum() + 1e-4)
    assert abs(got - float(want)) < 1e-5


def test_embedding_loss_matches_oracle():
    rng = np.random.default_rng(8)
    b, k = 2, 6
    tl = rng.standard_normal((b, k)).astype(np.float32)
    br = rng.standard_normal((b, k)).astype(np.float32)
    m = np.zeros((b, k), bool)
    m[0, :3] = True
    m[1, :2] = True
    pull, push = (float(v) for v in embedding_loss(jnp.array(tl), jnp.array(br),
                                                   jnp.array(m)))
    # numpy oracle following embeddings.py:32-77
    nobj = m.sum(1, keepdims=True).astype(np.float32)
    mean = (tl + br) / 2
    wpull = (((tl - mean) ** 2 / (nobj + 1e-4))[m].sum()
             + ((br - mean) ** 2 / (nobj + 1e-4))[m].sum())
    pm = (m[:, None, :].astype(int) + m[:, :, None].astype(int)) == 2
    n3 = nobj[:, :, None]
    dist = mean[:, None, :] - mean[:, :, None]
    dist = np.maximum(1 - np.abs(dist), 0) - 1 / (n3 + 1e-4)
    dist = dist / ((n3 - 1) * n3 + 1e-4)
    wpush = dist[pm].sum()
    assert abs(pull - wpull) < 1e-4
    assert abs(push - wpush) < 1e-4


def test_corner_pools_match_cummax_oracle():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 5, 7, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(top_pool(jnp.array(x))),
        np.maximum.accumulate(x[:, ::-1], 1)[:, ::-1], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bottom_pool(jnp.array(x))),
        np.maximum.accumulate(x, 1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(left_pool(jnp.array(x))),
        np.maximum.accumulate(x[:, :, ::-1], 2)[:, :, ::-1], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(right_pool(jnp.array(x))),
        np.maximum.accumulate(x, 2), atol=1e-6)


def test_corner_pool_gradient_routes_to_argmax():
    # torch oracle: autograd through an explicit running-max implementation.
    # values are unique so tie-breaking rules can't differ.
    vals = np.array([1.0, 4.0, 2.0, 3.0], np.float32)
    x = vals.reshape(1, 4, 1, 1)  # NHWC: pool runs along H (axis 1)

    def f(z):
        return (top_pool(z) ** 2).sum()

    g = np.asarray(jax.grad(f)(jnp.array(x))).ravel()

    tx = torch.tensor(vals, requires_grad=True)
    outs = [torch.max(tx[i:]) for i in range(4)]
    (torch.stack(outs) ** 2).sum().backward()
    np.testing.assert_allclose(g, tx.grad.numpy(), atol=1e-5)

    # left_pool pools along W (axis 2)
    xw = vals.reshape(1, 1, 4, 1)

    def fw(z):
        return (left_pool(z) ** 2).sum()

    gw = np.asarray(jax.grad(fw)(jnp.array(xw))).ravel()
    np.testing.assert_allclose(gw, tx.grad.numpy(), atol=1e-5)


def test_clamp_sigmoid_bounds():
    x = jnp.array([-100.0, 0.0, 100.0])
    y = np.asarray(clamp_sigmoid(x))
    assert y[0] == 1e-4 and abs(y[1] - 0.5) < 1e-6 and abs(y[2] - (1 - 1e-4)) < 1e-7


def test_pool_scan_backward_matches_scatter_reference():
    """The scatter-free cumsum-difference VJP (ops/corner_pool._pool_bwd)
    must route gradients exactly like the reference scatter-add at the
    first-occurrence argmax — including heavy ties (post-ReLU zeros).
    Values may differ by float summation order only."""
    from scd_resnet_tpu.ops.corner_pool import (
        _pool_bwd,
        _running_argmax,
        _scatter_add_along_axis,
    )

    rng = np.random.default_rng(3)
    # quantized + clamped: many exact ties along both axes
    x = jnp.asarray(np.maximum(rng.integers(-3, 4, (3, 9, 7, 5)), 0),
                    jnp.float32)
    g = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    for axis in (1, 2):
        for rev in (False, True):
            ref = _scatter_add_along_axis(
                x, _running_argmax(x, axis, rev), g, axis)
            new = _pool_bwd(axis, rev, x, g)[0]
            ref, new = np.asarray(ref), np.asarray(new)
            # identical routing: same zero pattern
            np.testing.assert_array_equal(ref == 0, new == 0)
            np.testing.assert_allclose(new, ref, atol=1e-5)
