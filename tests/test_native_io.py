"""Native reader vs Python reader equivalence on a synthetic archive."""

import numpy as np
import pytest

from scd_resnet_tpu.data.archive import read_archive
from scd_resnet_tpu.data.native_io import gather_batch, get_library, read_archive_native
from scd_resnet_tpu.data.synthetic import make_archive


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nat") / "tiny.d")
    make_archive(path, num_images=2, reps=2, clips_per_image=3, size=64)
    return path


def test_native_library_builds():
    assert get_library() is not None, "native libscdio.so failed to build"


def test_makefile_forces_fp_contract_off():
    """-ffp-contract=off is what keeps scdio_grayscale_u8 bit-exact to
    numpy's double arithmetic; an inherited CXXFLAGS must not drop it, so
    the Makefile must append it unconditionally (+=), not only default it
    in the overridable ?= line."""
    import os
    import re

    from scd_resnet_tpu.data import native_io

    makefile = os.path.join(native_io._NATIVE_DIR, "Makefile")
    with open(makefile) as fh:
        text = fh.read()
    assert re.search(r"^override CXXFLAGS\s*\+=.*-ffp-contract=off", text,
                     re.M), (
        "Makefile must force -ffp-contract=off via `override CXXFLAGS +=` "
        "(bit-exact grayscale depends on it even under an inherited or "
        "command-line CXXFLAGS)"
    )
    # flags-only changes must rebuild auto-built libraries
    assert re.search(r"^libscdio\.so:.*\bMakefile\b", text, re.M), (
        "libscdio.so rule must list the Makefile as a prerequisite"
    )


def test_native_matches_python_reader(archive):
    py = read_archive(archive, prefer_native=False)
    nat = read_archive_native(archive)
    assert nat is not None
    assert py[0] == nat[0]  # names
    np.testing.assert_allclose(py[1], nat[1], atol=0)  # samples bit-equal
    np.testing.assert_allclose(py[2], nat[2], atol=0)  # locs
    np.testing.assert_array_equal(py[3], nat[3])  # counts


def test_gather_batch_matches_numpy(archive):
    _, samples, _, _ = read_archive(archive, prefer_native=False)
    idx = np.array([3, 0, 7, 2], np.int64)
    got = gather_batch(samples, idx)
    np.testing.assert_array_equal(got, samples[idx])


def test_corrupt_archive_falls_back(tmp_path):
    # garbage bytes with a plausible size: the native reader must return
    # None (triggering the Python fallback), not crash
    bad = tmp_path / "bad.d"
    bad.write_bytes(b"\x00" * 4096)
    assert read_archive_native(str(bad)) is None

    # truncated real archive: valid EOCD magic may survive in the tail of
    # a half-written file; reader must still reject cleanly
    good = tmp_path / "good.d"
    make_archive(str(good), num_images=1, reps=1, clips_per_image=2, size=64)
    data = good.read_bytes()
    trunc = tmp_path / "trunc.d"
    trunc.write_bytes(data[: len(data) // 3] + data[-100:])
    assert read_archive_native(str(trunc)) is None
