"""Deployment wrapper and model export/import.

The reference flattens the decode output into a single stacked tensor for
TorchScript tracing — rows ``[ctScores, ctInds, ctY, ctX, majX, majY,
minL, rad, offX, offY]``, shape (10, B, K) — the exact contract test.py
unpacks (trainer/wrappers/centerOffsetResidual.py:5-23, test.py:103).

The TPU-native analog of TorchScript/libtorch is ``jax.export``: the
wrapped decode forward is jit-compiled and serialized as StableHLO, which
loads and executes without any model code (and is callable from C++ via
PJRT). ``save_traced`` writes that blob plus a small JSON header;
``load_traced`` returns a ready callable.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def make_wrapper(model, params, batch_stats) -> Callable:
    """fn(batch NHWC) -> (10, B, K) stacked decode rows."""
    from scd_resnet_tpu.models.center_net_offset import (
        as_stack_list,
        decode_center_net,
    )

    def wrapped(inputs):
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs, train=False
        )
        scores, inds, ys, xs, offset, regr, _ = decode_center_net(
            as_stack_list(outs)[-1]
        )
        rows = [
            scores,
            inds.astype(jnp.float32),
            ys,
            xs,
            regr[:, :, 0],  # major axis x
            regr[:, :, 1],  # major axis y
            regr[:, :, 2],  # minor axis length
            regr[:, :, 3],  # radius
            offset[:, :, 0],
            offset[:, :, 1],
        ]
        return jnp.stack(rows)

    return wrapped


def save_traced(path: str, wrapped_fn: Callable, input_shape: Tuple[int, ...],
                platforms=None) -> None:
    """Serialize the jitted wrapper as StableHLO (TorchScript-export analog,
    trace.py:60-66)."""
    spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jax_export.export(jax.jit(wrapped_fn), **kwargs)(spec)
    blob = exported.serialize()
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("meta.json", json.dumps({
            "format": "scd-resnet-tpu.traced.v1",
            "input_shape": list(input_shape),
        }))
        zf.writestr("module.stablehlo", blob)


def load_traced(path: str) -> Tuple[Callable, Tuple[int, ...]]:
    """Load a traced model; returns (callable, input_shape)."""
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        blob = zf.read("module.stablehlo")
    exported = jax_export.deserialize(blob)
    fn = jax.jit(exported.call)

    def call(batch) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(batch, jnp.float32)))

    return call, tuple(meta["input_shape"])


def load_wrapper(checkpoint_path: str, arch: str) -> Callable:
    """Checkpoint -> decode wrapper for the named model profile.

    The shared serving loader (test.py -c and serve.py -c): native
    checkpoints load directly; anything the native loader rejects is
    retried through the torch state_dict converter (the reference's .pth
    files), with a warning so genuinely corrupt native checkpoints are
    not silently misrouted.
    """
    from scd_resnet_tpu.core.checkpoint import load_params_only
    from scd_resnet_tpu.core.logging import Logger
    from scd_resnet_tpu.train.registry import get_model_profile

    profile = get_model_profile(arch)
    net = profile.build()
    try:
        params, batch_stats = load_params_only(checkpoint_path)
    except Exception as exc:
        from scd_resnet_tpu.core.torch_convert import convert_pth_file

        Logger.warn(":: wrapper :: not a native checkpoint ({}); trying "
                    "the torch state_dict converter".format(exc))
        params, batch_stats = convert_pth_file(
            checkpoint_path, profile.model_params.get("num_layers", 10))
    return make_wrapper(net, params, batch_stats)
