"""Torch `.pth` checkpoint converter for reference-trained CenterNet models.

The reference ships (referenced, at least) a TorchScript/`.pth` checkpoint
family (`pretrained/model70.pt`, README.md:100) whose state_dict follows the
module naming of models/backbones/residuals.py + models/centerNetOffset.py:

    [module.]preprocess.{0,1}.*                 stem conv + BN
    [module.]layer{1..4}.{i}.conv1/bn1/conv2/bn2[/downsample.{0,1}].*
        (BasicBlock depths 10-34; Bottleneck depths 50-152 add conv3/bn3 —
        residuals.py:122-165)
    [module.]deconvolutionLayers.{3j,3j+1}.*    deconv + BN triplets
    [module.]heatmap.{0,2}.* / regr.{0,2}.* / offset.{0,2}.*   heads

This module maps that layout onto the flax parameter tree of
``CenterNetResidual`` so reference-trained weights run in this framework
(the F1-parity workflow). Layout transforms:

- conv weights OIHW -> HWIO;
- transposed-conv weights (in, out, kh, kw) -> spatially flipped
  (kh, kw, in, out) — verified numerically against torch;
- BN weight/bias -> scale/bias params; running_mean/var -> batch stats.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from scd_resnet_tpu.models.resnet import RESNET_SPEC


def _conv(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _deconv(w) -> np.ndarray:
    # (in, out, kh, kw) -> flipped (kh, kw, in, out); see module docstring
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 0, 1)[::-1, ::-1])


def _vec(w) -> np.ndarray:
    return np.asarray(w)


def convert_center_net_residual(state_dict: Dict[str, Any], num_layers: int = 10
                                ) -> Tuple[Dict, Dict]:
    """Convert a reference CenterNetResidual state_dict.

    Args:
      state_dict: torch state_dict (tensors or numpy arrays); a leading
        ``module.`` prefix (DataParallel/DDP wrapping, networkFactory.py:134)
        is stripped.
      num_layers: ResNet depth (any RESNET_SPEC depth: BasicBlock 10-34 or
        Bottleneck 50/101/152 — the same table loadPretrained spans,
        networkFactory.py:278-288).

    Returns:
      (params, batch_stats) nested dicts loadable into
      ``CenterNetResidual(num_layers=...)`` variables.
    """
    sd = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        sd[key] = np.asarray(value)

    block, stages = RESNET_SPEC[num_layers]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value

    root = "ResNetBackbone_0"

    def bn(torch_prefix, flax_path):
        put(params, (root, *flax_path, "BatchNorm_0", "scale"),
            _vec(sd[torch_prefix + ".weight"]))
        put(params, (root, *flax_path, "BatchNorm_0", "bias"),
            _vec(sd[torch_prefix + ".bias"]))
        put(stats, (root, *flax_path, "BatchNorm_0", "mean"),
            _vec(sd[torch_prefix + ".running_mean"]))
        put(stats, (root, *flax_path, "BatchNorm_0", "var"),
            _vec(sd[torch_prefix + ".running_var"]))

    # stem
    put(params, (root, "Conv_0", "kernel"), _conv(sd["preprocess.0.weight"]))
    bn("preprocess.1", ("BatchNorm_0",))

    # stages; flax auto-numbers submodules in call order, so the block's
    # own convs come first and the projection shortcut (when present) is
    # the next Conv/BatchNorm index after them
    n_convs = 3 if block.expansion != 1 else 2
    blk = 0
    for stage_idx, repeats in enumerate(stages):
        for i in range(repeats):
            t = f"layer{stage_idx + 1}.{i}"
            f = f"{block.__name__}_{blk}"
            for j in range(n_convs):
                put(params, (root, f, f"Conv_{j}", "kernel"),
                    _conv(sd[t + f".conv{j + 1}.weight"]))
                bn(t + f".bn{j + 1}", (f, f"BatchNorm_{j}"))
            if t + ".downsample.0.weight" in sd:
                put(params, (root, f, f"Conv_{n_convs}", "kernel"),
                    _conv(sd[t + ".downsample.0.weight"]))
                bn(t + ".downsample.1", (f, f"BatchNorm_{n_convs}"))
            blk += 1

    # deconvs: Sequential indices 0,1,2 / 3,4,5 / 6,7,8 = deconv, BN, ReLU
    for j in range(3):
        put(params, (root, f"ConvTranspose_{j}", "kernel"),
            _deconv(sd[f"deconvolutionLayers.{3 * j}.weight"]))
        bn(f"deconvolutionLayers.{3 * j + 1}", (f"BatchNorm_{j + 1}",))

    # heads: Sequential(Conv3x3, ReLU, Conv1x1) -> indices 0 and 2
    for head in ("heatmap", "regr", "offset"):
        put(params, (root, head, "Conv_0", "kernel"),
            _conv(sd[head + ".0.weight"]))
        put(params, (root, head, "Conv_0", "bias"), _vec(sd[head + ".0.bias"]))
        put(params, (root, head, "Conv_1", "kernel"),
            _conv(sd[head + ".2.weight"]))
        put(params, (root, head, "Conv_1", "bias"), _vec(sd[head + ".2.bias"]))

    return params, stats


def convert_pth_file(path: str, num_layers: int = 10) -> Tuple[Dict, Dict]:
    """Load a torch .pth and convert (requires torch importable)."""
    import torch

    state_dict = torch.load(path, map_location="cpu")
    return convert_center_net_residual(state_dict, num_layers)


# ---- hourglass family ------------------------------------------------------
#
# The reference constructs its hourglass CenterNet through
# models/centerNetOffset.py:78-101 (CenterNetHourglass) on top of
# models/backbones/stackHourglass.py:130-272 (StackHourglass) and
# models/backbones/hourglass.py:61-114 (recursive Hourglass). Its torch
# module names:
#
#     preprocess.{0,1}                  Convolution(conv,bn) + Residual
#     hourglassStack.{s}.               recursive per stack:
#       preserveCurrentDimension.{i}    stackLayers of Residual
#       changeDimension.{i}             makeHourglassLayer (stride-2 first)
#       embeddedHourglass[.{i}]         recurse | central stackLayers
#       changeDimensionBack.{i}         stackLayersReverted
#     redimConvolution.{s}              Convolution(conv,bn)
#     {heatmap,regr,offset}.{s}.{0,1}   convolutionConv1x1 terminal
#     shortcutLayers.{s}.{0,1}          1x1 conv + BN      (stacks > 1)
#     convPrevHourglass.{s}.{0,1}       1x1 conv + BN      (stacks > 1)
#     interHourglassLayers.{s}          Residual           (stacks > 1)
#
# Torch Residual fields conv1/bn1/conv2/bn2[/skip.{0,1}] map onto our flax
# Residual's Conv_0/BatchNorm_0/Conv_1/BatchNorm_1[/Conv_2/BatchNorm_2]
# (models/resnet.py:41-61); the skip exists iff the torch keys exist.

HOURGLASS_TERMINALS = ("heatmap", "regr", "offset")
HOURGLASS_ITERATIONS = 5
HOURGLASS_MODULES = (2, 2, 2, 2, 2, 4)


def convert_center_net_hourglass(
    state_dict: Dict[str, Any], stacks: int = 1,
    iterations: int = HOURGLASS_ITERATIONS,
    modules: Tuple[int, ...] = HOURGLASS_MODULES,
    terminals: Tuple[str, ...] = HOURGLASS_TERMINALS,
) -> Tuple[Dict, Dict]:
    """Convert a reference CenterNetHourglass/StackHourglass state_dict to
    ``CenterNetHourglass(stacks=...)`` flax variables. ``iterations`` and
    ``modules`` default to the reference's production geometry
    (centerNetOffset.py:80-85); the walk itself is dimension-agnostic."""
    sd = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        sd[key] = np.asarray(value)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value

    root = "StackHourglass_0"

    def bn(torch_prefix, flax_path):
        # flax_path names the OUTER layers.BatchNorm scope; the wrapped
        # nn.BatchNorm adds an inner BatchNorm_0 level
        put(params, (root, *flax_path, "BatchNorm_0", "scale"),
            _vec(sd[torch_prefix + ".weight"]))
        put(params, (root, *flax_path, "BatchNorm_0", "bias"),
            _vec(sd[torch_prefix + ".bias"]))
        put(stats, (root, *flax_path, "BatchNorm_0", "mean"),
            _vec(sd[torch_prefix + ".running_mean"]))
        put(stats, (root, *flax_path, "BatchNorm_0", "var"),
            _vec(sd[torch_prefix + ".running_var"]))

    def residual(t, flax_path):
        put(params, (root, *flax_path, "Conv_0", "kernel"),
            _conv(sd[t + ".conv1.weight"]))
        bn(t + ".bn1", (*flax_path, "BatchNorm_0"))
        put(params, (root, *flax_path, "Conv_1", "kernel"),
            _conv(sd[t + ".conv2.weight"]))
        bn(t + ".bn2", (*flax_path, "BatchNorm_1"))
        if t + ".skip.0.weight" in sd:
            put(params, (root, *flax_path, "Conv_2", "kernel"),
                _conv(sd[t + ".skip.0.weight"]))
            bn(t + ".skip.1", (*flax_path, "BatchNorm_2"))

    def conv_block(t, flax_path):
        # reference Convolution(conv, bn) -> ConvBlock(Conv_0, BatchNorm_0)
        put(params, (root, *flax_path, "Conv_0", "kernel"),
            _conv(sd[t + ".conv.weight"]))
        bn(t + ".bn", (*flax_path, "BatchNorm_0"))

    def hourglass(t, flax_path, iters, mods):
        for i in range(mods[0]):
            residual(f"{t}.preserveCurrentDimension.{i}",
                     (*flax_path, "ResidualStack_0", f"Residual_{i}"))
        for i in range(mods[0]):
            residual(f"{t}.changeDimension.{i}",
                     (*flax_path, "ResidualStack_1", f"Residual_{i}"))
        if iters > 1:
            hourglass(f"{t}.embeddedHourglass",
                      (*flax_path, "Hourglass_0"), iters - 1, mods[1:])
        else:
            for i in range(mods[1]):
                residual(f"{t}.embeddedHourglass.{i}",
                         (*flax_path, "ResidualStack_2", f"Residual_{i}"))
        for i in range(mods[0]):
            residual(f"{t}.changeDimensionBack.{i}",
                     (*flax_path, "ResidualStackReverted_0", f"Residual_{i}"))

    # preprocess: Convolution(7, s2) + Residual(s2)
    conv_block("preprocess.0", ("ConvBlock_0",))
    residual("preprocess.1", ("Residual_0",))

    for s in range(stacks):
        hourglass(f"hourglassStack.{s}", (f"Hourglass_{s}",),
                  iterations, tuple(modules))
        conv_block(f"redimConvolution.{s}", (f"ConvBlock_{s + 1}",))
        for head in terminals:
            # convolutionConv1x1: Convolution(3, batchNorm=False -> biased
            # conv, empty bn) + Conv2d 1x1 (utility.py:61-65)
            put(params, (root, f"{head}_{s}", "ConvBlock_0", "Conv_0",
                         "kernel"), _conv(sd[f"{head}.{s}.0.conv.weight"]))
            put(params, (root, f"{head}_{s}", "ConvBlock_0", "Conv_0",
                         "bias"), _vec(sd[f"{head}.{s}.0.conv.bias"]))
            put(params, (root, f"{head}_{s}", "Conv_0", "kernel"),
                _conv(sd[f"{head}.{s}.1.weight"]))
            put(params, (root, f"{head}_{s}", "Conv_0", "bias"),
                _vec(sd[f"{head}.{s}.1.bias"]))
        if s < stacks - 1:
            put(params, (root, f"Conv_{2 * s}", "kernel"),
                _conv(sd[f"shortcutLayers.{s}.0.weight"]))
            bn(f"shortcutLayers.{s}.1", (f"BatchNorm_{2 * s}",))
            put(params, (root, f"Conv_{2 * s + 1}", "kernel"),
                _conv(sd[f"convPrevHourglass.{s}.0.weight"]))
            bn(f"convPrevHourglass.{s}.1", (f"BatchNorm_{2 * s + 1}",))
            residual(f"interHourglassLayers.{s}", (f"Residual_{s + 1}",))

    return params, stats


def export_center_net_hourglass(
    params: Dict, batch_stats: Dict, stacks: int = 1,
    iterations: int = HOURGLASS_ITERATIONS,
    modules: Tuple[int, ...] = HOURGLASS_MODULES,
    terminals: Tuple[str, ...] = HOURGLASS_TERMINALS,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_center_net_hourglass`: flax trees -> a
    reference-named torch state_dict, so hourglass checkpoints trained here
    (including the champion centerOffsetHourglass2) deploy on the
    reference's TorchScript/libtorch path (trace.py:35-66)."""
    root = "StackHourglass_0"
    p = params[root]
    s_ = batch_stats[root]
    sd: Dict[str, np.ndarray] = {}

    def get(tree, path):
        node = tree
        for part in path:
            node = node[part]
        return node

    def bn(torch_prefix, flax_path):
        node_p = get(p, flax_path)["BatchNorm_0"]
        node_s = get(s_, flax_path)["BatchNorm_0"]
        sd[torch_prefix + ".weight"] = np.asarray(node_p["scale"])
        sd[torch_prefix + ".bias"] = np.asarray(node_p["bias"])
        sd[torch_prefix + ".running_mean"] = np.asarray(node_s["mean"])
        sd[torch_prefix + ".running_var"] = np.asarray(node_s["var"])
        sd[torch_prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def residual(t, flax_path):
        node = get(p, flax_path)
        sd[t + ".conv1.weight"] = _conv_inv(node["Conv_0"]["kernel"])
        bn(t + ".bn1", (*flax_path, "BatchNorm_0"))
        sd[t + ".conv2.weight"] = _conv_inv(node["Conv_1"]["kernel"])
        bn(t + ".bn2", (*flax_path, "BatchNorm_1"))
        if "Conv_2" in node:
            sd[t + ".skip.0.weight"] = _conv_inv(node["Conv_2"]["kernel"])
            bn(t + ".skip.1", (*flax_path, "BatchNorm_2"))

    def conv_block(t, flax_path):
        sd[t + ".conv.weight"] = _conv_inv(get(p, flax_path)["Conv_0"]["kernel"])
        bn(t + ".bn", (*flax_path, "BatchNorm_0"))

    def hourglass(t, flax_path, iters, mods):
        for i in range(mods[0]):
            residual(f"{t}.preserveCurrentDimension.{i}",
                     (*flax_path, "ResidualStack_0", f"Residual_{i}"))
        for i in range(mods[0]):
            residual(f"{t}.changeDimension.{i}",
                     (*flax_path, "ResidualStack_1", f"Residual_{i}"))
        if iters > 1:
            hourglass(f"{t}.embeddedHourglass",
                      (*flax_path, "Hourglass_0"), iters - 1, mods[1:])
        else:
            for i in range(mods[1]):
                residual(f"{t}.embeddedHourglass.{i}",
                         (*flax_path, "ResidualStack_2", f"Residual_{i}"))
        for i in range(mods[0]):
            residual(f"{t}.changeDimensionBack.{i}",
                     (*flax_path, "ResidualStackReverted_0", f"Residual_{i}"))

    conv_block("preprocess.0", ("ConvBlock_0",))
    residual("preprocess.1", ("Residual_0",))

    for s in range(stacks):
        hourglass(f"hourglassStack.{s}", (f"Hourglass_{s}",),
                  iterations, tuple(modules))
        conv_block(f"redimConvolution.{s}", (f"ConvBlock_{s + 1}",))
        for head in terminals:
            node = p[f"{head}_{s}"]
            sd[f"{head}.{s}.0.conv.weight"] = _conv_inv(
                node["ConvBlock_0"]["Conv_0"]["kernel"])
            sd[f"{head}.{s}.0.conv.bias"] = np.asarray(
                node["ConvBlock_0"]["Conv_0"]["bias"])
            sd[f"{head}.{s}.1.weight"] = _conv_inv(node["Conv_0"]["kernel"])
            sd[f"{head}.{s}.1.bias"] = np.asarray(node["Conv_0"]["bias"])
        if s < stacks - 1:
            sd[f"shortcutLayers.{s}.0.weight"] = _conv_inv(
                p[f"Conv_{2 * s}"]["kernel"])
            bn(f"shortcutLayers.{s}.1", (f"BatchNorm_{2 * s}",))
            sd[f"convPrevHourglass.{s}.0.weight"] = _conv_inv(
                p[f"Conv_{2 * s + 1}"]["kernel"])
            bn(f"convPrevHourglass.{s}.1", (f"BatchNorm_{2 * s + 1}",))
            residual(f"interHourglassLayers.{s}", (f"Residual_{s + 1}",))

    return sd


def _conv_inv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def _deconv_inv(w) -> np.ndarray:
    # inverse of _deconv: unflip spatially, (kh, kw, in, out) -> (in, out, kh, kw)
    return np.ascontiguousarray(
        np.asarray(w)[::-1, ::-1].transpose(2, 3, 0, 1))


def export_center_net_residual(params: Dict, batch_stats: Dict,
                               num_layers: int = 10) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_center_net_residual`: flax parameter and
    batch-stats trees -> a reference-named torch state_dict (numpy values,
    loadable with ``load_state_dict`` into the reference's
    ``CenterNetResidual`` after ``torch.from_numpy`` — see
    ``export_pth_file``).

    Closes the interop loop: models trained HERE deploy on the
    reference's own TorchScript/libtorch path (trace.py:35-66), and
    reference-side analyses (their test.py) can score our checkpoints.
    """
    block, stages = RESNET_SPEC[num_layers]
    root = "ResNetBackbone_0"
    p = params[root]
    s = batch_stats[root]
    sd: Dict[str, np.ndarray] = {}

    def bn(torch_prefix, flax_path):
        node_p, node_s = p, s
        for part in flax_path:
            node_p = node_p[part]
            node_s = node_s[part]
        node_p = node_p["BatchNorm_0"]
        node_s = node_s["BatchNorm_0"]
        sd[torch_prefix + ".weight"] = np.asarray(node_p["scale"])
        sd[torch_prefix + ".bias"] = np.asarray(node_p["bias"])
        sd[torch_prefix + ".running_mean"] = np.asarray(node_s["mean"])
        sd[torch_prefix + ".running_var"] = np.asarray(node_s["var"])
        # torch BN tracks batches as int64; the value is ignored with
        # momentum-based updates but strict load_state_dict expects it
        sd[torch_prefix + ".num_batches_tracked"] = np.asarray(0,
                                                               np.int64)

    sd["preprocess.0.weight"] = _conv_inv(p["Conv_0"]["kernel"])
    bn("preprocess.1", ("BatchNorm_0",))

    n_convs = 3 if block.expansion != 1 else 2
    blk = 0
    for stage_idx, repeats in enumerate(stages):
        for i in range(repeats):
            t = f"layer{stage_idx + 1}.{i}"
            f = f"{block.__name__}_{blk}"
            for j in range(n_convs):
                sd[t + f".conv{j + 1}.weight"] = _conv_inv(
                    p[f][f"Conv_{j}"]["kernel"])
                bn(t + f".bn{j + 1}", (f, f"BatchNorm_{j}"))
            if f"Conv_{n_convs}" in p[f]:
                sd[t + ".downsample.0.weight"] = _conv_inv(
                    p[f][f"Conv_{n_convs}"]["kernel"])
                bn(t + ".downsample.1", (f, f"BatchNorm_{n_convs}"))
            blk += 1

    for j in range(3):
        sd[f"deconvolutionLayers.{3 * j}.weight"] = _deconv_inv(
            p[f"ConvTranspose_{j}"]["kernel"])
        bn(f"deconvolutionLayers.{3 * j + 1}", (f"BatchNorm_{j + 1}",))

    for head in ("heatmap", "regr", "offset"):
        sd[head + ".0.weight"] = _conv_inv(p[head]["Conv_0"]["kernel"])
        sd[head + ".0.bias"] = np.asarray(p[head]["Conv_0"]["bias"])
        sd[head + ".2.weight"] = _conv_inv(p[head]["Conv_1"]["kernel"])
        sd[head + ".2.bias"] = np.asarray(p[head]["Conv_1"]["bias"])

    return sd


def export_pth_file(path: str, params: Dict, batch_stats: Dict,
                    num_layers: int = 10) -> str:
    """Write a reference-loadable torch ``.pth`` from flax trees."""
    import torch

    sd = export_center_net_residual(params, batch_stats, num_layers)
    # np.array copy: jax buffers can surface as non-writable views, which
    # torch.from_numpy warns about
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               path)
    return path
