"""trace.py — export a trained checkpoint as a deployable decode model.

CLI mirror of the reference exporter (reference: trace.py:14-33):
``python trace.py out.pt -a centerOffsetRes10 -m model.pth -s '24 1 512 512'
[-wrapped]``.

Instead of TorchScript, the wrapper-flattened decode forward is
jit-compiled and serialized as StableHLO via ``jax.export`` — loadable by
test.py (or any PJRT C++ host) without model code. EVERY trainable family
exports (infer/wrapper.CONTRACTS): centerOffset (10, B, K), centerSize
(6, B, K), corner (12, B, K), cornerLegacy (B, 1000, 8) — the reference
only shipped trainer/wrappers/centerOffsetResidual.py:11-23 (SURVEY.md
defect #6). ``-s`` accepts the reference's NCHW shape string and maps it
to NHWC internally. ``-wrapped`` is accepted for CLI compatibility (our
checkpoints never carry a DataParallel prefix).
"""

from __future__ import annotations

import argparse
import os
import sys
from pprint import pprint


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="trace.py - export a deployable (StableHLO) decode model."
    )
    parser.add_argument("output", type=str,
                        help="output .pt file (serialized StableHLO bundle)")
    parser.add_argument("-a", dest="modelArchitecture", type=str,
                        required=True,
                        help="architecture/profile name, e.g. centerOffsetRes10")
    parser.add_argument("-m", dest="model", type=str, required=True,
                        help="path to the trained checkpoint (.pth)")
    parser.add_argument("-s", dest="inputShape", type=str, required=True,
                        help="input tensor shape, NCHW space-separated, "
                        "e.g. '24 1 512 512'")
    parser.add_argument("-gpu", dest="useGPU", const=True, default=False,
                        action="store_const")
    parser.add_argument("-wrapped", dest="isWrapped", const=True,
                        default=False, action="store_const",
                        help="accepted for reference-CLI compatibility")
    return parser.parse_args()


def begin(settings):
    import jax

    from scd_resnet_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from scd_resnet_tpu.core.checkpoint import load_params_only
    from scd_resnet_tpu.core.logging import Logger
    from scd_resnet_tpu.infer.wrapper import (
        CONTRACTS,
        make_wrapper_for,
        save_traced,
    )
    from scd_resnet_tpu.train.registry import get_model_profile

    profile = get_model_profile(settings["architecture"])
    Logger.info("Loaded model profile: {} (wrapper family: {})".format(
        settings["architecture"], profile.family))

    if not os.path.exists(settings["model"]):
        Logger.err(":: trace.py :: checkpoint does not exist: {}".format(
            settings["model"]))
        sys.exit(1)
    try:
        params, batch_stats = load_params_only(settings["model"])
    except Exception:
        # reference-era torch .pth: convert the state_dict layout
        from scd_resnet_tpu.core.torch_convert import convert_pth_file

        Logger.warn(":: trace.py :: not a native checkpoint; converting "
                    "torch state_dict")
        num_layers = profile.model_params.get("num_layers", 10)
        params, batch_stats = convert_pth_file(settings["model"], num_layers)

    n, c, h, w = settings["shape"]
    input_shape = (n, h, w, c)
    wrapper, family = make_wrapper_for(profile, params, batch_stats)

    dummy = jax.numpy.zeros(input_shape, jax.numpy.float32)
    out = jax.jit(wrapper)(dummy)
    Logger.log(
        "The loaded model accepts input {} and outputs {} "
        "(contract '{}': {})".format(
            input_shape, tuple(out.shape), family, CONTRACTS[family]
        )
    )
    save_traced(settings["output"], wrapper, input_shape, family=family)
    Logger.log("Output saved to {}".format(settings["output"]))


def main():
    from scd_resnet_tpu.core.logging import Logger

    args = parse_arguments()
    Logger.info(":: trace.py :: convert .pth checkpoints to deployable models")
    settings = {
        "useGPU": args.useGPU,
        "wrapped": args.isWrapped,
        "model": args.model,
        "architecture": args.modelArchitecture,
        "output": args.output,
        "shape": [int(i) for i in args.inputShape.split(" ")],
    }
    pprint(settings, indent=4)
    begin(settings)
    Logger.info(":: trace.py :: model generation completed")


if __name__ == "__main__":
    main()
