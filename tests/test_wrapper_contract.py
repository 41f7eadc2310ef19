"""The deployment wrapper's 10-row output contract
(trainer/wrappers/centerOffsetResidual.py:11-23 — the exact rows test.py
unpacks) and the StableHLO export round trip."""

import numpy as np
import jax
import jax.numpy as jnp

from scd_resnet_tpu.infer.wrapper import load_traced, make_wrapper, save_traced
from scd_resnet_tpu.models.center_net_offset import (
    CenterNetResidual,
    decode_center_net,
)

TINY = (16, 16, 32, 64, 128, 64, 64, 64)


def test_wrapper_rows_match_decode(tmp_path):
    model = CenterNetResidual(num_layers=10, dims=TINY, terminal_hidden=32)
    x = jnp.array(
        np.random.default_rng(0).standard_normal((2, 64, 64, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    wrapper = make_wrapper(model, variables["params"],
                           variables["batch_stats"])
    rows = np.asarray(wrapper(x))
    assert rows.shape == (10, 2, 100)

    outs = model.apply(variables, x, train=False)
    scores, inds, ys, xs, offset, regr, _ = decode_center_net(outs)
    np.testing.assert_allclose(rows[0], np.asarray(scores), atol=1e-5)
    np.testing.assert_allclose(rows[1], np.asarray(inds, np.float32), atol=0)
    np.testing.assert_allclose(rows[2], np.asarray(ys), atol=0)
    np.testing.assert_allclose(rows[3], np.asarray(xs), atol=0)
    np.testing.assert_allclose(rows[4], np.asarray(regr[:, :, 0]), atol=1e-5)
    np.testing.assert_allclose(rows[5], np.asarray(regr[:, :, 1]), atol=1e-5)
    np.testing.assert_allclose(rows[6], np.asarray(regr[:, :, 2]), atol=1e-5)
    np.testing.assert_allclose(rows[7], np.asarray(regr[:, :, 3]), atol=1e-5)
    np.testing.assert_allclose(rows[8], np.asarray(offset[:, :, 0]), atol=1e-5)
    np.testing.assert_allclose(rows[9], np.asarray(offset[:, :, 1]), atol=1e-5)

    # StableHLO export/import round trip reproduces the wrapper outputs
    path = str(tmp_path / "tiny.pt")
    save_traced(path, wrapper, (2, 64, 64, 1))
    loaded, shape = load_traced(path)
    assert shape == (2, 64, 64, 1)
    np.testing.assert_allclose(loaded(np.asarray(x)), rows, atol=1e-5)


def test_dcn_model_exports_stablehlo(tmp_path):
    """The DCN-prologue model must survive the export path: the
    reference ships a dedicated ONNX-exportable DCN rewrite
    (models/backbones/deformable/dcn_v2_onnx.py) because its custom
    autograd op breaks tracing; here the bilinear-gather DCN is ordinary
    jax, so the SAME model exports through the SAME StableHLO path."""
    model = CenterNetResidual(num_layers=10, dims=TINY, terminal_hidden=32,
                              dcn=True)
    x = jnp.array(
        np.random.default_rng(1).standard_normal((1, 64, 64, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    wrapper = make_wrapper(model, variables["params"],
                           variables["batch_stats"])
    rows = np.asarray(wrapper(x))
    assert rows.shape == (10, 1, 100)

    path = str(tmp_path / "tiny_dcn.pt")
    save_traced(path, wrapper, (1, 64, 64, 1))
    loaded, shape = load_traced(path)
    assert shape == (1, 64, 64, 1)
    np.testing.assert_allclose(loaded(np.asarray(x)), rows, atol=1e-5)


def _init_wrap(model, family, batch=1, decode=None):
    x = jnp.array(
        np.random.default_rng(2).standard_normal((batch, 64, 64, 1)),
        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    wrapper = make_wrapper(model, variables["params"],
                           variables.get("batch_stats", {}), family=family,
                           decode=decode)
    return wrapper, x


def test_corner_family_contract(tmp_path):
    """corner contract: (12, B, K) = ct/tl/br x [score, ind, y, x]
    (cornerNet.py:272-304), exported and reloaded with the contract name
    in the bundle header."""
    from scd_resnet_tpu.models.corner_net import CornerNetResidual

    wrapper, x = _init_wrap(
        CornerNetResidual(num_layers=10, dims=TINY), "corner")
    rows = np.asarray(wrapper(x))
    assert rows.shape == (12, 1, 100)
    # scores rows are post-sigmoid probabilities
    for h in range(3):
        assert (rows[4 * h] >= 0).all() and (rows[4 * h] <= 1).all()
        # y/x rows land on the 16x16 heatmap grid
        assert rows[4 * h + 2].max() < 16 and rows[4 * h + 3].max() < 16

    path = str(tmp_path / "corner.pt")
    save_traced(path, wrapper, (1, 64, 64, 1), family="corner")
    loaded, shape = load_traced(path)
    assert loaded.contract == "corner"
    assert loaded.rows[4] == "tlScores"
    np.testing.assert_allclose(loaded(np.asarray(x)), rows, atol=1e-5)


def test_center_size_family_contract(tmp_path):
    """centerSize contract: (6, B, K) = [ctS, ctI, ctY, ctX, sizeW, sizeH]
    — the reference's own commented unpack (test.py:102)."""
    from scd_resnet_tpu.models.center_net import CenterNetSizeResidual

    wrapper, x = _init_wrap(
        CenterNetSizeResidual(num_layers=10, dims=TINY), "centerSize")
    rows = np.asarray(wrapper(x))
    assert rows.shape == (6, 1, 100)

    path = str(tmp_path / "size.pt")
    save_traced(path, wrapper, (1, 64, 64, 1), family="centerSize")
    loaded, _ = load_traced(path)
    assert loaded.contract == "centerSize"
    np.testing.assert_allclose(loaded(np.asarray(x)), rows, atol=1e-5)


def test_corner_legacy_family_contract(tmp_path):
    """cornerLegacy contract: (B, 1000, 8) associative-embedding paired
    boxes (cornerNetLegacy.py:332-446)."""
    from scd_resnet_tpu.models.corner_net_legacy import CornerNetLegacy

    wrapper, x = _init_wrap(
        CornerNetLegacy(categories=1, stacks=1, iterations=2,
                        dimensions=(16, 24, 32), modules=(1, 1, 1)),
        "cornerLegacy")
    dets = np.asarray(wrapper(x))
    assert dets.shape == (1, 1000, 8)
    # rejected pairs carry score -1; scores otherwise are mean tl/br probs
    assert dets[..., 4].max() <= 1.0

    path = str(tmp_path / "legacy.pt")
    save_traced(path, wrapper, (1, 64, 64, 1), family="cornerLegacy")
    loaded, _ = load_traced(path)
    assert loaded.contract == "cornerLegacy"
    np.testing.assert_allclose(loaded(np.asarray(x)), dets, atol=1e-5)


def test_make_wrapper_for_registry_profiles():
    """make_wrapper_for dispatches every registry family, including the
    combined-corner profile whose decode is pre-bound with
    combined=True."""
    import dataclasses

    import jax as _jax

    from scd_resnet_tpu.infer.wrapper import make_wrapper_for
    from scd_resnet_tpu.train.registry import get_model_profile

    x = jnp.array(
        np.random.default_rng(3).standard_normal((1, 64, 64, 1)),
        jnp.float32)

    cases = {
        "centerOffsetRes10q": (10, 1, 100),
        "cornerCombinedRes10": (12, 1, 100),
        "centerRes10": (6, 1, 100),
    }
    for name, want in cases.items():
        profile = get_model_profile(name)
        if name != "centerOffsetRes10q":  # shrink for the 1-core CPU
            profile = dataclasses.replace(
                profile, model_params={**profile.model_params, "dims": TINY})
        model = profile.build()
        variables = model.init(_jax.random.PRNGKey(0), x, train=False)
        wrapped, family = make_wrapper_for(
            profile, variables["params"], variables.get("batch_stats", {}))
        assert family == profile.family
        assert np.asarray(wrapped(x)).shape == want
