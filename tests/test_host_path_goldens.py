"""Golden-pin the inference host path (grayscale + hybrid reflect pad +
overlap tiling + per-clip standardization) against the REFERENCE's own
recipe executed by tools/gen_host_path_goldens.py at the canonical
3072 x 2056 slide geometry — the geometry where the reference's hardcoded
OpenCV border fix-up (test.py:79-82) is well-defined (see the generator's
docstring for why 3072, not the docstring-typo 3092).

This upgrades the pad_reflect_hybrid docstring claim ("reproduces the
reference's served behavior") from tested-in-spirit to bit-exact."""

import os
import subprocess
import sys

import numpy as np
import pytest

from scd_resnet_tpu.infer.analyse import slide_geometry, tile_slide
from scd_resnet_tpu.ops.image import grayscale_inference, pad_reflect_hybrid

REFERENCE = os.environ.get("SCD_REFERENCE_ROOT", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    out = str(tmp_path_factory.mktemp("goldens") / "host_path.npz")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_host_path_goldens.py"),
         out, REFERENCE],
        check=True, cwd=REPO,
    )
    return np.load(out)


def test_grayscale_matches_reference(golden):
    ours = grayscale_inference(golden["color"])
    np.testing.assert_array_equal(ours, golden["gray"])


def test_hybrid_pad_matches_reference_fixup(golden):
    clip_h, clip_v, pad_lr, pad_tb = golden["geometry"]
    ours = pad_reflect_hybrid(golden["gray"], int(pad_lr), int(pad_tb))
    np.testing.assert_array_equal(ours, golden["padded"])


def test_tiled_normalized_clips_match_reference(golden):
    gray = golden["gray"]
    clips, clip_h, clip_v, pad_lr, pad_tb = tile_slide(gray)
    assert (clip_h, clip_v, pad_lr, pad_tb) == tuple(golden["geometry"])
    assert slide_geometry(gray.shape[1], gray.shape[0]) == \
        tuple(golden["geometry"])
    ref = golden["clips"]
    assert clips.shape == ref.shape
    # identical float32 arithmetic on both sides up to summation order in
    # the mean/variance reductions
    np.testing.assert_allclose(clips, ref, atol=2e-5)