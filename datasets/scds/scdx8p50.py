"""Dataset-variant shim: re-export of the 'scdx8p50' dataset profile
under the reference's public import path (reference interface:
datasets/scds/scdx8p50.py — module-level constants at scdx16p100.py:46-60 are
imported by model files, e.g. models/centerNetOffset.py:43)."""

from scd_resnet_tpu.data.dataset import SCDDataset as _SCDDataset

MAXTAGLEN = 30

TARGETSIZE = 512
TARGETSIZEH = 256
HEATMAPSIZE = 128
DOWNSAMPLE = int(TARGETSIZE / HEATMAPSIZE)
THRESHOLDIOU = 0.5

TESTSET = 5760
REALTIMETEST = 5760

ARGUMENTRATIO = 8
PARTITION = 0.50

TRAINSUBSET = 'train8p50'


def SCD(zipPath, useGPU=True, dataSplit=None, **kwargs):
    """Reference call signature: SCD(zipPath, useGPU, dataSplit)
    (scdx16p100.py:64). ``useGPU`` is accepted for compatibility — arrays
    are placed on the accelerator by the training step's shardings."""
    return _SCDDataset(
        zipPath,
        dataSplit,
        argument_ratio=ARGUMENTRATIO,
        partition=PARTITION,
        train_subset=TRAINSUBSET,
        **kwargs,
    )


dataset = SCD
