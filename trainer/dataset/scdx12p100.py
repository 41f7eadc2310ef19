"""Profile shim: re-export of the 'scdx12p100' dataset profile
(reference interface: trainer/dataset/scdx12p100.py)."""

from scd_resnet_tpu.data.dataset import SCDDataset as _SCDDataset
from scd_resnet_tpu.train.registry import get_dataset_profile as _get

_profile = _get("scdx12p100")


def dataset(zipPath, useGPU=True, dataSplit=None, **kwargs):
    """Reference call signature: dataset(zipPath, useGPU, dataSplit)
    (scdx16p100.py:64). ``useGPU`` is accepted for compatibility — arrays
    are placed on the accelerator by the training step's shardings."""
    return _SCDDataset(
        zipPath,
        dataSplit,
        argument_ratio=_profile.argument_ratio,
        partition=_profile.partition,
        train_subset=_profile.train_subset,
        **kwargs,
    )
