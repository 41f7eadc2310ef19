"""End-to-end parity against the REFERENCE's own torch code.

tools/gen_reference_goldens.py runs /root/reference's actual
``models/centerNetOffset.py`` chain (CenterNetResidual forward +
``decodeCenterNet``, centerNetOffset.py:150-251) on a fixed seeded clip in
a subprocess and dumps the state_dict plus outputs. Here the state_dict is
converted with ``convert_center_net_residual`` and the flax model + decode
must reproduce the reference's head maps and decoded
scores/indices/coords/regressions.

This upgrades tests/test_torch_convert.py (which builds its own
reference-NAMED torch net) to "matches the reference's actual code".
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from scd_resnet_tpu.core.torch_convert import convert_center_net_residual
from scd_resnet_tpu.models.center_net_offset import (
    CenterNetResidual,
    decode_center_net,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


@pytest.mark.parametrize("depth", [10, 18, 50])
def test_reference_forward_and_decode_parity(depth, tmp_path):
    if not os.path.isdir(os.path.join(REFERENCE, "models")):
        pytest.skip("reference checkout not available")
    golden = str(tmp_path / f"golden{depth}.npz")
    subprocess.run(
        [sys.executable, os.path.join("tools", "gen_reference_goldens.py"),
         golden, str(depth), "128", REFERENCE],
        check=True, cwd=REPO, timeout=600,
    )
    z = np.load(golden)
    state_dict = {k[len("sd."):]: z[k] for k in z.files if k.startswith("sd.")}
    params, batch_stats = convert_center_net_residual(state_dict, depth)

    # the reverse converter must reproduce the reference's own state_dict
    # bit-for-bit (the train-here / deploy-on-reference interop path)
    from scd_resnet_tpu.core.torch_convert import export_center_net_residual

    back = export_center_net_residual(params, batch_stats, depth)
    assert set(back) == set(state_dict)
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue  # informational counter, exported as 0
        np.testing.assert_array_equal(back[key], value, err_msg=key)

    model = CenterNetResidual(num_layers=depth)
    x = jnp.asarray(z["clip"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    outs = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )

    for head in ("heatmap", "regr", "offset"):
        ours = np.asarray(outs[head]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, z[head], atol=5e-4, rtol=1e-3)

    scores, indices, ys, xs, offset, regression, _ = decode_center_net(
        outs, k=100
    )
    scores, indices, ys, xs, offset, regression = (
        np.asarray(a) for a in (scores, indices, ys, xs, offset, regression)
    )
    # NMS zeroes every non-peak cell; when fewer than K peaks survive, the
    # tail lanes are ties at exactly 0 whose ordering is arbitrary in BOTH
    # frameworks (and discarded by the 0.3 score threshold downstream,
    # test.py:107) — compare the meaningful positive-score prefix per row
    for b in range(scores.shape[0]):
        n = int((z["dec_scores"][b] > 0).sum())
        assert n > 50, f"degenerate golden: only {n} surviving peaks"
        np.testing.assert_array_equal(indices[b, :n], z["dec_inds"][b, :n])
        np.testing.assert_array_equal(ys[b, :n], z["dec_y"][b, :n])
        np.testing.assert_array_equal(xs[b, :n], z["dec_x"][b, :n])
        # 5e-5: f32 accumulation spread through the deepest (Res50) chain
        # (measured 1.9e-5 max) — indices/coords above are exact-equal
        np.testing.assert_allclose(scores[b, :n], z["dec_scores"][b, :n],
                                   atol=5e-5)
        np.testing.assert_allclose(offset[b, :n], z["dec_offset"][b, :n],
                                   atol=5e-4)
        np.testing.assert_allclose(regression[b, :n], z["dec_regr"][b, :n],
                                   atol=5e-4)


@pytest.mark.parametrize("stacks", [1, 2])
def test_reference_hourglass_parity(stacks, tmp_path):
    """Hourglass-family interop (round-5 VERDICT #3): the reference's
    StackHourglass chain (models/centerNetOffset.py:78-101 over
    stackHourglass.py:130-272) converts both directions — import parity
    on every stack's heads + decode, and a bit-exact reverse export.

    Small geometry (3 iterations, 32-dim, same equal-dims-at-level-0
    pattern as production so the stride-2-only skip case is exercised);
    the walk in torch_convert is dimension-agnostic, and the full-size
    champion export runs through tools/export_checkpoint.py."""
    if not os.path.isdir(os.path.join(REFERENCE, "models")):
        pytest.skip("reference checkout not available")
    golden = str(tmp_path / f"hg{stacks}.npz")
    subprocess.run(
        [sys.executable, os.path.join("tools", "gen_reference_goldens.py"),
         golden, "10", "128", REFERENCE,
         "--model", "hourglass", "--stacks", str(stacks), "--small"],
        check=True, cwd=REPO, timeout=600,
    )
    z = np.load(golden)
    state_dict = {k[len("sd."):]: z[k] for k in z.files if k.startswith("sd.")}

    from scd_resnet_tpu.core.torch_convert import (
        convert_center_net_hourglass,
        export_center_net_hourglass,
    )
    from scd_resnet_tpu.models.center_net_offset import decode_center_net
    from scd_resnet_tpu.models.hourglass import StackHourglass

    params, batch_stats = convert_center_net_hourglass(
        state_dict, stacks=stacks, iterations=3, modules=(1, 1, 1, 2))

    # reverse export reproduces the reference's state_dict bit-for-bit
    back = export_center_net_hourglass(
        params, batch_stats, stacks=stacks, iterations=3, modules=(1, 1, 1, 2))
    assert set(back) == set(state_dict)
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[key], value, err_msg=key)

    model = StackHourglass(
        hourglass_iterations=3, stacks=stacks, dimensions=(32, 32, 48, 64),
        modules=(1, 1, 1, 2), prediction_dim=64,
        terminals=(("heatmap", 1, -2.19), ("regr", 4, None),
                   ("offset", 2, None)),
        pool_downsample=False,
    )
    x = jnp.asarray(z["clip"].transpose(0, 2, 3, 1))
    outs = model.apply(
        {"params": params["StackHourglass_0"],
         "batch_stats": batch_stats["StackHourglass_0"]}, x, train=False)

    for s in range(stacks):
        for head in ("heatmap", "regr", "offset"):
            ours = np.asarray(outs[s][head]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(ours, z[f"{head}.{s}"], atol=5e-4,
                                       rtol=1e-3)

    # decode consumes the final stack (stackHourglass.py:252, PARITY.md)
    scores, indices, ys, xs, offset, regression, _ = decode_center_net(
        outs[-1], k=100)
    scores, indices = np.asarray(scores), np.asarray(indices)
    for b in range(scores.shape[0]):
        n = int((z["dec_scores"][b] > 0).sum())
        assert n > 20, f"degenerate golden: only {n} surviving peaks"
        np.testing.assert_array_equal(indices[b, :n], z["dec_inds"][b, :n])
        np.testing.assert_allclose(scores[b, :n], z["dec_scores"][b, :n],
                                   atol=5e-5)
