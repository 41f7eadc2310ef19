"""The space-to-depth stem lowering must compute EXACTLY the standard
7x7/stride-2/pad-3 convolution with the same (7,7,C,F) kernel (layers.py
StemConv7x7S2 — the v5e stem optimization, tools/bwd_profile.json)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from scd_resnet_tpu.models.layers import StemConv7x7S2


def test_s2d_stem_matches_reference_conv():
    for h, w, c, f in ((64, 64, 1, 8), (96, 64, 2, 4)):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c))
        stem = StemConv7x7S2(f)
        variables = stem.init(jax.random.PRNGKey(1), x)
        kernel = variables["params"]["kernel"]
        assert kernel.shape == (7, 7, c, f)

        got = stem.apply(variables, x)
        ref = jax.lax.conv_general_dilated(
            x, jnp.asarray(kernel), window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        assert got.shape == ref.shape == (2, h // 2, w // 2, f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_backbone_param_tree_unchanged():
    """The stem still lives at ResNetBackbone_0/Conv_0/kernel with the
    (7,7,1,64)-shaped parameter — checkpoints and the torch converter see
    no difference."""
    from scd_resnet_tpu.models.center_net_offset import CenterNetResidual

    model = CenterNetResidual(num_layers=10,
                              dims=(16, 16, 32, 64, 128, 64, 64, 64),
                              terminal_hidden=32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1)), train=False)
    kernel = variables["params"]["ResNetBackbone_0"]["Conv_0"]["kernel"]
    assert kernel.shape == (7, 7, 1, 16)


def test_subpixel_conv_transpose_matches_flax():
    from scd_resnet_tpu.models.layers import SubpixelConvTranspose4x4S2

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8, 3))
    ref_mod = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME",
                               use_bias=False)
    variables = ref_mod.init(jax.random.PRNGKey(3), x)
    ref = ref_mod.apply(variables, x)

    sub = SubpixelConvTranspose4x4S2(5)
    got = sub.apply({"params": {"kernel": variables["params"]["kernel"]}}, x)
    assert got.shape == ref.shape == (2, 12, 16, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_heads_match_per_head_convs():
    """The fused terminal-head path must equal per-head Conv3x3+ReLU+Conv1x1
    applied with the same (unchanged-tree) parameters."""
    from scd_resnet_tpu.models.center_net_offset import CenterNetResidual

    model = CenterNetResidual(num_layers=10,
                              dims=(8, 8, 16, 32, 64, 32, 32, 32),
                              terminal_hidden=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    outs = model.apply(variables, x, train=False)

    backbone = variables["params"]["ResNetBackbone_0"]
    # recompute each head from the trunk features via plain convs
    trunk_model = CenterNetResidual(num_layers=10,
                                    dims=(8, 8, 16, 32, 64, 32, 32, 32),
                                    terminal_hidden=16)
    # rebuild trunk output by zeroing heads? Instead: use the backbone with
    # terminals=() through ResNetBackbone directly.
    from scd_resnet_tpu.models.resnet import ResNetBackbone

    trunk = ResNetBackbone(10, (), (8, 8, 16, 32, 64, 32, 32, 32))
    feats = trunk.apply(
        {"params": {k: v for k, v in backbone.items()
                    if k not in ("heatmap", "regr", "offset")},
         "batch_stats": variables["batch_stats"]["ResNetBackbone_0"]},
        x, train=False)

    for name, width in (("heatmap", 1), ("regr", 4), ("offset", 2)):
        head = backbone[name]
        h = jax.lax.conv_general_dilated(
            feats, head["Conv_0"]["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + head["Conv_0"]["bias"]
        h = jax.nn.relu(h)
        y = jax.lax.conv_general_dilated(
            h, head["Conv_1"]["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + head["Conv_1"]["bias"]
        assert outs[name].shape == y.shape
        np.testing.assert_allclose(np.asarray(outs[name]), np.asarray(y),
                                   atol=1e-5, rtol=1e-5)


def test_max_pool_gradient_matches_torch_tie_routing():
    """The stem maxpool gradient must match torch MaxPool2d's, INCLUDING
    on tied inputs (post-relu zeros tie constantly): both XLA's
    SelectAndScatter and torch route the gradient to the first window
    maximum in raster order. Guards any future pool-lowering swap — a
    plain autodiff max chain would silently SPLIT gradients across ties
    (JAX's balanced-eq max JVP). Reference: torch MaxPool2d used at
    models/backbones/residuals.py:61."""
    import torch

    from scd_resnet_tpu.models.layers import max_pool_2x2_s2, max_pool_3x3_s2

    rng = np.random.default_rng(0)
    cases = [
        (max_pool_3x3_s2, dict(kernel_size=3, stride=2, padding=1)),
        (max_pool_2x2_s2, dict(kernel_size=2, stride=2)),
    ]
    for pool, torch_kw in cases:
        for x_np in (
            rng.normal(size=(2, 16, 16, 3)).astype(np.float32),
            # heavy ties: integer-valued and zero-heavy like relu output
            np.maximum(rng.integers(-2, 3, size=(2, 16, 16, 3)), 0)
            .astype(np.float32),
        ):
            x = jnp.asarray(x_np)
            y = pool(x)
            dy_np = rng.normal(size=y.shape).astype(np.float32)
            g = jax.grad(
                lambda x: jnp.sum(pool(x) * jnp.asarray(dy_np)))(x)

            xt = torch.tensor(x_np.transpose(0, 3, 1, 2),
                              requires_grad=True)
            yt = torch.nn.functional.max_pool2d(xt, **torch_kw)
            yt.backward(torch.tensor(dy_np.transpose(0, 3, 1, 2)))
            np.testing.assert_array_equal(
                np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(g), xt.grad.numpy().transpose(0, 2, 3, 1),
                atol=1e-5, rtol=1e-5)


def test_s2d_stem_odd_sizes_fall_back_exactly():
    """Odd spatial inputs can't split into 2x2 blocks; the module must
    fall back to the plain lowering with the same kernel parameter."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 65, 63, 1))
    stem = StemConv7x7S2(8)
    variables = stem.init(jax.random.PRNGKey(5), x)
    got = stem.apply(variables, x)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(variables["params"]["kernel"]), (2, 2),
        ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == ref.shape == (1, 33, 32, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
