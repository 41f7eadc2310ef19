"""Compile the REFERENCE's own C++ native ops (corner pooling torch
extensions, DCNv2 CPU extension) and record golden inputs/outputs.

This upgrades the corner-pool / DCN test oracles from "matches a
re-implementation of the algorithm" to "matches the reference's actual
compiled native code":

- cornerPooling: /root/reference/models/backbones/cornerPooling/source/
  {top,bottom,left,right}Pool.cpp compile as-is (forward only — the C++
  backward allocates ``torch::CUDA`` tensors, GPU-only by construction,
  topPool.cpp:44-45).
- DCNv2: /root/reference/models/backbones/deformable/source/cpu/*.cpp
  compile after four MECHANICAL torch-2.x API renames applied to a
  scratch copy (never to the reference tree): ``.data<T>()`` →
  ``.data_ptr<T>()``, ``THArgCheck(c,n,m)`` → ``TORCH_CHECK(c,m)``,
  ``AT_DISPATCH_FLOATING_TYPES(t.type(), ...)`` → ``(t.scalar_type(),
  ...)``, and dropping the defunct ``#include <TH/TH.h>``. No numerical
  code is touched. Forward AND backward golden paths are recorded
  (dcn_v2_forward/backward, dcn_v2_psroi_pooling_forward/backward).

Outputs ``tests/goldens/native_goldens.npz`` consumed by
tests/test_native_goldens.py. Build artifacts cache under
``workspace/native_build`` (gitignored); a warm re-run takes seconds.

Usage: python tools/gen_native_goldens.py [out.npz]
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("SCD_REFERENCE_ROOT", "/root/reference")
BUILD_ROOT = os.path.join(REPO, "workspace", "native_build")


def _compile_corner_pools():
    from torch.utils.cpp_extension import load

    src_dir = os.path.join(
        REFERENCE, "models", "backbones", "cornerPooling", "source")
    mods = {}
    for name in ("topPool", "bottomPool", "leftPool", "rightPool"):
        bd = os.path.join(BUILD_ROOT, name)
        os.makedirs(bd, exist_ok=True)
        mods[name] = load(
            name="ref_{}".format(name),
            sources=[os.path.join(src_dir, name + ".cpp")],
            build_directory=bd, verbose=False,
        )
    return mods


_DCN_PATCHES = [
    (re.compile(r"\.data<([^>]*)>\(\)"), r".data_ptr<\1>()"),
    (re.compile(r"THArgCheck\((.*), *[0-9]+, *(\"[^\"]*\")\)"),
     r"TORCH_CHECK(\1, \2)"),
    (re.compile(r"AT_DISPATCH_FLOATING_TYPES\((\w+)\.type\(\)"),
     r"AT_DISPATCH_FLOATING_TYPES(\1.scalar_type()"),
    (re.compile(r"#include <TH/TH\.h>"), ""),
    # CORRECTNESS fix, not an API rename: the CPU-port forward accumulates
    # into an UNINITIALIZED at::empty output ("output_n = at::add(output_n,
    # ones_T)", dcn.cpp:65-110), producing garbage — the original CUDA path
    # zero-initializes via gemm beta=0. Zero the buffer so the golden is
    # the well-defined value the CUDA path computes.
    (re.compile(r"auto output = at::empty\("), "auto output = at::zeros("),
]


def _compile_dcn():
    from torch.utils.cpp_extension import load

    src_root = os.path.join(REFERENCE, "models", "backbones", "deformable",
                            "source")
    bd = os.path.join(BUILD_ROOT, "dcn")
    dst = os.path.join(bd, "src")
    os.makedirs(os.path.join(dst, "cpu"), exist_ok=True)
    for rel in ["vision.cpp", "dcnv2.h"]:
        shutil.copy(os.path.join(src_root, rel), os.path.join(dst, rel))
    for path in glob.glob(os.path.join(src_root, "cpu", "*")):
        out = os.path.join(dst, "cpu", os.path.basename(path))
        with open(path) as f:
            text = f.read()
        if path.endswith(".cpp"):
            for pat, rep in _DCN_PATCHES:
                text = pat.sub(rep, text)
        with open(out, "w") as f:
            f.write(text)
    return load(
        name="ref_dcn",
        sources=[os.path.join(dst, "vision.cpp")]
        + sorted(glob.glob(os.path.join(dst, "cpu", "*.cpp"))),
        build_directory=bd,
        extra_cflags=["-O2"],
        extra_include_paths=[dst],
        verbose=False,
    )


def main(out_path: str) -> None:
    import torch

    payload = {}
    rng = np.random.default_rng(7)

    # ---- corner pooling forwards (B, C, H, W), non-square on purpose ----
    pools = _compile_corner_pools()
    x = rng.standard_normal((2, 3, 6, 9)).astype(np.float32)
    payload["pool_x"] = x
    for name, mod in pools.items():
        payload["pool_{}_out".format(name)] = (
            mod.forward(torch.from_numpy(x))[0].numpy()
        )

    # ---- DCNv2 conv forward + backward ----
    dcn = _compile_dcn()
    b, cin, h, w = 2, 4, 7, 9
    cout, kh, kw = 5, 3, 3
    stride, pad, dil, dg = 1, 1, 1, 1
    ho = (h + 2 * pad - dil * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * pad - dil * (kw - 1) - 1) // stride + 1
    inp = rng.standard_normal((b, cin, h, w)).astype(np.float32)
    weight = (rng.standard_normal((cout, cin, kh, kw)) * 0.3).astype(
        np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    # non-integer offsets within ±1.5 exercise every bilinear branch
    offset = (rng.standard_normal((b, dg * 2 * kh * kw, ho, wo)) * 0.75
              ).astype(np.float32)
    mask = rng.random((b, dg * kh * kw, ho, wo)).astype(np.float32)
    grad_out = rng.standard_normal((b, cout, ho, wo)).astype(np.float32)

    args = (torch.from_numpy(inp), torch.from_numpy(weight),
            torch.from_numpy(bias), torch.from_numpy(offset),
            torch.from_numpy(mask))
    geom = (kh, kw, stride, stride, pad, pad, dil, dil, dg)
    out = dcn.dcn_v2_forward(*args, *geom)
    # return order is {input, offset, mask, weight, bias} (dcn.cpp:269-271)
    grads = dcn.dcn_v2_backward(*args, torch.from_numpy(grad_out), *geom)
    payload.update(
        dcn_input=inp, dcn_weight=weight, dcn_bias=bias, dcn_offset=offset,
        dcn_mask=mask, dcn_grad_out=grad_out, dcn_out=out.numpy(),
        dcn_grad_input=grads[0].numpy(), dcn_grad_offset=grads[1].numpy(),
        dcn_grad_mask=grads[2].numpy(), dcn_grad_weight=grads[3].numpy(),
        dcn_grad_bias=grads[4].numpy(),
        dcn_geom=np.array(geom, np.int64),
    )

    # ---- deformable PSROI pooling forward + backward ----
    # the CPU kernel supports only group_size=1 / channels == output_dim
    # (dcn.roipool.cpp:302 assert) — the exact configuration the
    # reference's own testcpu.py:149-156 exercises
    output_dim, group_size, pooled_size = 3, 1, 3
    part_size, sample_per_part = 3, 4
    spatial_scale, trans_std = 0.25, 0.1
    ph, pw = 10, 12
    pool_in = rng.standard_normal((2, output_dim, ph, pw)).astype(np.float32)
    rois = np.array(
        [[0, 2, 2, 14, 12], [1, 0, 4, 20, 16], [0, 6, 0, 10, 18]],
        np.float32,
    )
    trans = (rng.standard_normal(
        (len(rois), 2, part_size, part_size)) * 0.8).astype(np.float32)
    pgrad = rng.standard_normal(
        (len(rois), output_dim, pooled_size, pooled_size)).astype(np.float32)

    pargs = (torch.from_numpy(pool_in), torch.from_numpy(rois),
             torch.from_numpy(trans))
    for tag, no_trans in (("", 0), ("_nt", 1)):
        pgeom = (no_trans, spatial_scale, output_dim, group_size,
                 pooled_size, part_size, sample_per_part, trans_std)
        pout, pcount = dcn.dcn_v2_psroi_pooling_forward(*pargs, *pgeom)
        pgrads = dcn.dcn_v2_psroi_pooling_backward(
            torch.from_numpy(pgrad), *pargs, pcount, *pgeom)
        payload.update({
            "psroi_out" + tag: pout.numpy(),
            "psroi_count" + tag: pcount.numpy(),
            "psroi_grad_input" + tag: pgrads[0].numpy(),
            "psroi_grad_trans" + tag: pgrads[1].numpy(),
        })
    payload.update(
        psroi_input=pool_in, psroi_rois=rois, psroi_trans=trans,
        psroi_grad_out=pgrad,
        psroi_geom=np.array(
            [output_dim, group_size, pooled_size, part_size,
             sample_per_part], np.int64),
        psroi_scales=np.array([spatial_scale, trans_std], np.float64),
    )

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **payload)
    print("wrote {} ({} arrays)".format(out_path, len(payload)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else os.path.join(REPO, "tests", "goldens", "native_goldens.npz"))
