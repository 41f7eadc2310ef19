"""Deployment wrappers and model export/import — one contract per family.

The reference flattens the decode output into a single stacked tensor for
TorchScript tracing, but only ships the centerOffset wrapper — rows
``[ctScores, ctInds, ctY, ctX, majX, majY, minL, rad, offX, offY]``,
shape (10, B, K), the exact contract test.py unpacks
(trainer/wrappers/centerOffsetResidual.py:5-23, test.py:103) — leaving
every other family unexportable (SURVEY.md defect #6). Here each
trainable family defines a stacked contract (``CONTRACTS``):

- ``centerOffset``: (10, B, K) as above;
- ``centerSize``:   (6, B, K) ``[ctS, ctI, ctY, ctX, sizeW, sizeH]``
  — the reference's own commented unpack line (test.py:102); sizes in
  heatmap units x SIZE_REGR_FACTOR training scale (centerNet.py:47);
- ``corner``:       (12, B, K) ``[ctS, ctI, ctY, ctX, tlS, tlI, tlY,
  tlX, brS, brI, brY, brX]`` — three per-head top-K blocks
  (cornerNet.py:272-304);
- ``cornerLegacy``: (B, 1000, 8) associative-embedding paired boxes
  ``[tlX, tlY, brX, brY, score, tlS, brS, cat]``
  (cornerNetLegacy.py:332-446).

The TPU-native analog of TorchScript/libtorch is ``jax.export``: the
wrapped decode forward is jit-compiled and serialized as StableHLO, which
loads and executes without any model code (and is callable from C++ via
PJRT). ``save_traced`` writes that blob plus a small JSON header
(including the contract name); ``load_traced`` returns a ready callable
with ``.contract`` set.
"""

from __future__ import annotations

import json
import zipfile
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

# family -> human-readable row description of the stacked export tensor
CONTRACTS = {
    "centerOffset": ["ctScores", "ctInds", "ctY", "ctX", "majX", "majY",
                     "minL", "rad", "offX", "offY"],
    "centerSize": ["ctScores", "ctInds", "ctY", "ctX", "sizeW", "sizeH"],
    "corner": ["ctScores", "ctInds", "ctY", "ctX", "tlScores", "tlInds",
               "tlY", "tlX", "brScores", "brInds", "brY", "brX"],
    "cornerLegacy": ["(B, 1000, 8): tlX, tlY, brX, brY, score, tlScore, "
                     "brScore, category"],
}


def make_wrapper(model, params, batch_stats,
                 family: str = "centerOffset",
                 decode: Callable = None) -> Callable:
    """fn(batch NHWC) -> the family's stacked decode tensor (CONTRACTS).

    ``decode`` overrides the family's default decode (used for profile
    variants like the combined corner model whose decode is pre-bound)."""
    from scd_resnet_tpu.models.center_net_offset import as_stack_list

    def final_stack(inputs):
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs,
            train=False
        )
        # decode consumes the final stack (PARITY.md documented
        # divergence: the reference decodes outs[0])
        return as_stack_list(outs)[-1]

    if family == "centerOffset":
        from scd_resnet_tpu.models.center_net_offset import decode_center_net

        dec = decode or decode_center_net

        def wrapped(inputs):
            scores, inds, ys, xs, offset, regr, _ = dec(final_stack(inputs))
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

    elif family == "centerSize":
        from scd_resnet_tpu.models.center_net import decode_center_net_size

        dec = decode or decode_center_net_size

        def wrapped(inputs):
            scores, inds, ys, xs, regression, _ = dec(final_stack(inputs))
            return jnp.stack([
                scores, inds.astype(jnp.float32), ys, xs,
                regression[:, :, 0], regression[:, :, 1],
            ])

    elif family == "corner":
        from scd_resnet_tpu.models.corner_net import decode_corner_net

        dec = decode or decode_corner_net

        def wrapped(inputs):
            rows = dec(final_stack(inputs))[:12]  # drop trailing out_dict
            return jnp.stack([
                r.astype(jnp.float32) if r.dtype != jnp.float32 else r
                for r in rows
            ])

    elif family == "cornerLegacy":
        from scd_resnet_tpu.models.corner_net_legacy import (
            decode_corner_net_legacy,
        )

        dec = decode or decode_corner_net_legacy

        def wrapped(inputs):
            return dec(final_stack(inputs))

    else:
        raise KeyError(
            "unknown wrapper family '{}'; known: {}".format(
                family, sorted(CONTRACTS)))

    return wrapped


def make_wrapper_for(profile, params, batch_stats) -> Tuple[Callable, str]:
    """(wrapped_fn, family) for a registry ModelProfile — the per-family
    export surface trace.py and test.py -c use. The profile's own decode
    (already bound with e.g. ``combined=True``) is preferred; the legacy
    profile's list-contract decode is unwrapped to the raw tensor."""
    family = profile.family
    decode = profile.decode
    if family == "cornerLegacy":
        decode = None  # use the raw-(B,1000,8) decode, not the list shim
    return (
        make_wrapper(profile.build(), params, batch_stats, family=family,
                     decode=decode),
        family,
    )


def save_traced(path: str, wrapped_fn: Callable, input_shape: Tuple[int, ...],
                platforms=None, family: str = "centerOffset") -> None:
    """Serialize the jitted wrapper as StableHLO (TorchScript-export analog,
    trace.py:60-66). ``family`` names the output contract (CONTRACTS)."""
    spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jax_export.export(jax.jit(wrapped_fn), **kwargs)(spec)
    blob = exported.serialize()
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("meta.json", json.dumps({
            "format": "scd-resnet-tpu.traced.v1",
            "input_shape": list(input_shape),
            "contract": family,
            "rows": CONTRACTS.get(family),
        }))
        zf.writestr("module.stablehlo", blob)


def load_traced(path: str) -> Tuple[Callable, Tuple[int, ...]]:
    """Load a traced model; returns (callable, input_shape). The callable
    carries ``.contract`` (family name; pre-round-3 bundles default to
    "centerOffset") and ``.rows`` (row labels)."""
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        blob = zf.read("module.stablehlo")
    exported = jax_export.deserialize(blob)
    fn = jax.jit(exported.call)

    def call(batch) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(batch, jnp.float32)))

    call.contract = meta.get("contract", "centerOffset")
    call.rows = meta.get("rows") or CONTRACTS.get(call.contract)
    return call, tuple(meta["input_shape"])


def load_wrapper(checkpoint_path: str, arch: str) -> Callable:
    """Checkpoint -> decode wrapper for the named model profile (the
    profile's family contract; ``.contract`` is set on the callable).

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
    try:
        params, batch_stats = load_params_only(checkpoint_path)
    except Exception as exc:
        from scd_resnet_tpu.core.torch_convert import convert_pth_file

        Logger.warn(":: wrapper :: not a native checkpoint ({}); trying "
                    "the torch state_dict converter".format(exc))
        params, batch_stats = convert_pth_file(
            checkpoint_path, profile.model_params.get("num_layers", 10))
    wrapped, family = make_wrapper_for(profile, params, batch_stats)
    wrapped.contract = family
    wrapped.rows = CONTRACTS.get(family)
    return wrapped
