"""Run the REFERENCE's own torch code (models/centerNetOffset.py +
models/backbones/residuals.py under /root/reference) on a fixed seeded clip
and dump goldens: the state_dict, the head outputs, and the
``decodeCenterNet`` outputs (centerNetOffset.py:219-251).

Used by tests/test_reference_parity.py to prove the converted flax model +
decode reproduce the reference's actual code, not a re-implementation.
Runs as a subprocess so the reference's top-level module names
(models/, datasets/, configuration, ...) never collide with this repo's
compat shims.

Usage: python tools/gen_reference_goldens.py <out.npz> <num_layers> [size]
"""

import sys
import types


def _stub_torchvision():
    """The image is torch-cpu only; the reference imports torchvision at
    module top but never touches it on the model/decode path."""
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    tv.transforms = transforms
    transforms.functional = functional
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    # stdlib modules removed in py>=3.12 that the reference imports but
    # never uses on the model/decode path
    for name in ("imp",):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    try:
        from distutils.log import error, warn  # noqa: F401
    except ImportError:
        distutils = types.ModuleType("distutils")
        log = types.ModuleType("distutils.log")
        log.error = print
        log.warn = print
        distutils.log = log
        sys.modules["distutils"] = distutils
        sys.modules["distutils.log"] = log


def _build_reference_hourglass(stacks: int, small: bool):
    """The reference's hourglass CenterNet chain
    (models/centerNetOffset.py:78-101 over stackHourglass.py:130-272).
    ``stacks`` generalizes its hardcoded hourglassStacks=1 so the
    2-stack (champion-family) inter-stack layers get goldens too;
    ``small`` shrinks iterations/dims for test-suite compile budgets while
    keeping the same structural pattern (equal dims at level 0, so the
    stride-2-only skip case is exercised)."""
    import torch

    from models.backbones.convolutions import Convolution
    from models.backbones.residuals import Residual
    from models.backbones.stackHourglass import StackHourglass
    from models.centerNetOffset import (
        heatmapTerminalHg,
        makeHourglassLayer,
        makePoolLayer,
        offsetRegressionTerminalHg,
        sizeRegressionTerminalHg,
    )

    if small:
        iters, dims, mods = 3, [32, 32, 48, 64], [1, 1, 1, 2]
        pred_dim = 64
    else:
        iters, dims, mods = (
            5, [128, 128, 192, 192, 192, 256], [2, 2, 2, 2, 2, 4])
        pred_dim = 256
    model = StackHourglass(
        iters, stacks, dims, mods, 1,
        hourglassPool=makePoolLayer,
        hourglassBefore=makeHourglassLayer,
        hourglassLayer=Residual, predictionConvDim=pred_dim,
        beforeBackbone=torch.nn.Sequential(
            Convolution(7, 1, 128, stride=2),
            Residual(3, 128, dims[0], stride=2),
        ),
        terminals=[heatmapTerminalHg, sizeRegressionTerminalHg,
                   offsetRegressionTerminalHg],
        decoder=None,
    )
    return model, (iters, dims, mods, pred_dim)


def main(out_path: str, num_layers: int, size: int, reference_root: str,
         model_kind: str = "resnet", stacks: int = 1, small: bool = False):
    sys.path.insert(0, reference_root)
    _stub_torchvision()

    import numpy as np
    import torch

    from models.centerNetOffset import CenterNetResidual, decodeCenterNet

    torch.manual_seed(0)
    geometry = None
    if model_kind == "hourglass":
        model, geometry = _build_reference_hourglass(stacks, small)
    else:
        model = CenterNetResidual(num_layers)
    # Re-randomize EVERY tensor with a seeded numpy RNG: the reference's own
    # init leaves the heatmap logits nearly constant (sigmoid(-2.19) with
    # ~1e-3 spread), which makes top-K ordering a float-tie lottery. Wider
    # weights give well-separated scores so decode parity is meaningful;
    # BN running stats move off their (0, 1) init so eval-mode
    # normalization is exercised too.
    rng = np.random.default_rng(7)

    def fill(t, arr):
        t.copy_(torch.from_numpy(arr.astype(np.float32)))

    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim >= 2:  # conv / deconv kernels: kaiming-ish
                fan_in = int(np.prod(p.shape[1:]))
                fill(p, rng.normal(0, np.sqrt(2.0 / fan_in), p.shape))
            elif name.endswith(".bias"):
                fill(p, rng.normal(0, 0.5, p.shape))
            else:  # BN scale
                fill(p, rng.uniform(0.8, 1.2, p.shape))

    clip = rng.normal(0.0, 1.0, (2, 1, size, size)).astype(np.float32)

    # calibrate BN running stats to the actual activation statistics
    # (momentum=1 -> running = this batch) so the eval-mode forward keeps
    # O(1) activations instead of collapsing/saturating through the
    # un-normalized BN chain
    for module in model.modules():
        if isinstance(module, torch.nn.BatchNorm2d):
            module.momentum = 1.0

    def hourglass_forward(x):
        # drives the reference's own modules with the per-stack terminal
        # indexing of evalNetwork (stackHourglass.py:252: terminal[ind]) —
        # its trainNetwork applies the WHOLE terminal Sequential per stack
        # (stackHourglass.py:217), which only type-checks at nstack=1
        inter = model.preprocess(x)
        outs = []
        for ind in range(model.hourglassStacks):
            kp = model.hourglassStack[ind](inter)
            cnv = model.redimConvolution[ind](kp)
            outs.append({t: model.terminalLayers[t][ind](cnv)
                         for t in model.terminalLayers})
            if ind < model.hourglassStacks - 1:
                inter = (model.shortcutLayers[ind](inter)
                         + model.convPrevHourglass[ind](cnv))
                inter = model.relu(inter)
                inter = model.interHourglassLayers[ind](inter)
        return outs

    def forward(x):
        if model_kind == "hourglass":
            return hourglass_forward(x)
        return model(x, decode=False)

    model.train()
    with torch.no_grad():
        forward(torch.from_numpy(clip))
    model.eval()
    with torch.no_grad():
        outs = forward(torch.from_numpy(clip))
        heads = outs[-1]  # decode consumes the final stack
        scores, inds, ys, xs, offset, regression, _ = decodeCenterNet(
            dict(heads), K=100
        )

    payload = {
        "clip": clip,
        "dec_scores": scores.numpy(),
        "dec_inds": inds.numpy(),
        "dec_y": ys.numpy(),
        "dec_x": xs.numpy(),
        "dec_offset": offset.numpy(),
        "dec_regr": regression.numpy(),
    }
    if model_kind == "hourglass":
        payload["stacks"] = np.asarray(stacks)
        payload["geometry"] = np.asarray(
            [geometry[0], geometry[3]] + list(geometry[2]))
        for s, out in enumerate(outs):
            for head in ("heatmap", "regr", "offset"):
                payload[f"{head}.{s}"] = out[head].numpy()
    else:
        for head in ("heatmap", "regr", "offset"):
            payload[head] = heads[head].numpy()
    for key, value in model.state_dict().items():
        payload["sd." + key] = value.numpy()
    np.savez_compressed(out_path, **payload)
    print("wrote", out_path)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out")
    parser.add_argument("depth", nargs="?", type=int, default=10)
    parser.add_argument("size", nargs="?", type=int, default=128)
    parser.add_argument("root", nargs="?", default="/root/reference")
    parser.add_argument("--model", default="resnet",
                        choices=["resnet", "hourglass"])
    parser.add_argument("--stacks", type=int, default=1)
    parser.add_argument("--small", action="store_true",
                        help="3-iteration/32-dim hourglass (test budgets)")
    a = parser.parse_args()
    main(a.out, a.depth, a.size, a.root, model_kind=a.model,
         stacks=a.stacks, small=a.small)
