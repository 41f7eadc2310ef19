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
