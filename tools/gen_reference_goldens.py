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


def main(out_path: str, num_layers: int, size: int, reference_root: str):
    sys.path.insert(0, reference_root)
    _stub_torchvision()

    import numpy as np
    import torch

    from models.centerNetOffset import CenterNetResidual, decodeCenterNet

    torch.manual_seed(0)
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
    model.train()
    with torch.no_grad():
        model(torch.from_numpy(clip), decode=False)
    model.eval()
    with torch.no_grad():
        outs = model(torch.from_numpy(clip), decode=False)
        heads = outs[0]
        scores, inds, ys, xs, offset, regression, _ = decodeCenterNet(
            dict(heads), K=100
        )

    payload = {
        "clip": clip,
        "heatmap": heads["heatmap"].numpy(),
        "regr": heads["regr"].numpy(),
        "offset": heads["offset"].numpy(),
        "dec_scores": scores.numpy(),
        "dec_inds": inds.numpy(),
        "dec_y": ys.numpy(),
        "dec_x": xs.numpy(),
        "dec_offset": offset.numpy(),
        "dec_regr": regression.numpy(),
    }
    for key, value in model.state_dict().items():
        payload["sd." + key] = value.numpy()
    np.savez_compressed(out_path, **payload)
    print("wrote", out_path)


if __name__ == "__main__":
    out = sys.argv[1]
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    root = sys.argv[4] if len(sys.argv) > 4 else "/root/reference"
    main(out, depth, size, root)
