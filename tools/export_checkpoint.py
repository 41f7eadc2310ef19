"""Export a framework checkpoint as a reference-loadable torch .pth.

The interop counterpart of the auto-converting import path (test.py -c /
trace.py accept reference torch checkpoints directly): this writes OUR
trained centerOffset-family params + BN stats in the reference's module
naming (models/backbones/residuals.py + models/centerNetOffset.py), so
the result loads into the reference's CenterNetResidual with strict
load_state_dict and traces through its own trace.py/test.py.

Usage:
    python tools/export_checkpoint.py ckpt.pth out.pth -a centerOffsetRes18
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="export a checkpoint as a reference torch .pth")
    parser.add_argument("checkpoint", help="framework checkpoint (.pth)")
    parser.add_argument("output", help="torch state_dict output (.pth)")
    parser.add_argument("-a", dest="arch", default="centerOffsetRes10",
                        help="model profile (centerOffset residual family)")
    args = parser.parse_args()

    from scd_resnet_tpu.core.checkpoint import load_params_only
    from scd_resnet_tpu.core.logging import Logger
    from scd_resnet_tpu.core.torch_convert import (
        export_center_net_hourglass,
        export_pth_file,
    )
    from scd_resnet_tpu.train.registry import get_model_profile

    profile = get_model_profile(args.arch)
    is_hourglass = profile.model_cls.__name__ == "CenterNetHourglass"
    if profile.family != "centerOffset" or profile.model_params.get("dcn"):
        Logger.err("export covers the plain centerOffset residual + "
                   "hourglass families (the reference's own deployable "
                   "architectures); got '{}'".format(args.arch))
        sys.exit(1)
    params, batch_stats = load_params_only(args.checkpoint)
    if is_hourglass:
        import numpy as np
        import torch

        stacks = profile.model_params.get("stacks", 1)
        sd = export_center_net_hourglass(params, batch_stats, stacks=stacks)
        torch.save(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
            args.output)
        Logger.log("wrote {} (reference StackHourglass naming, {} stack(s), "
                   "{} tensors)".format(args.output, stacks, len(sd)))
    else:
        export_pth_file(args.output, params, batch_stats,
                        num_layers=profile.model_params.get("num_layers", 10))
        Logger.log("wrote {} (reference {}-layer naming)".format(
            args.output, profile.model_params.get("num_layers", 10)))


if __name__ == "__main__":
    main()
