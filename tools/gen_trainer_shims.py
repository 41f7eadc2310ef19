"""Generate the trainer/ profile shim modules.

The reference exposes profiles as importable modules
(``trainer.model.<name>`` / ``trainer.dataset.<name>`` /
``trainer.wrappers.<name>`` — networkFactory.py:50-68, trace.py:58). This
framework keeps those import paths working as thin re-exports from the
typed registry. Run this script after adding profiles to the registry.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scd_resnet_tpu.train.registry import DATASET_PROFILES, MODEL_PROFILES

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
ROOT = os.path.join(REPO, "trainer")
SCDS = os.path.join(REPO, "datasets", "scds")

MODEL_TMPL = '''"""Profile shim: re-export of the '{name}' model profile
(reference interface: trainer/model/{name}.py)."""

from scd_resnet_tpu.train.registry import get_model_profile as _get

_profile = _get("{name}")
model = _profile.model_cls
modelParams = _profile.model_params
loss = _profile.loss
decode = _profile.decode
evaluation = _profile.evaluation
expression = _profile.expression
'''

DATASET_TMPL = '''"""Profile shim: re-export of the '{name}' dataset profile
(reference interface: trainer/dataset/{name}.py)."""

from scd_resnet_tpu.data.dataset import SCDDataset as _SCDDataset
from scd_resnet_tpu.train.registry import get_dataset_profile as _get

_profile = _get("{name}")


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
'''

SCDS_TMPL = '''"""Dataset-variant shim: re-export of the '{name}' dataset profile
under the reference's public import path (reference interface:
datasets/scds/{name}.py — module-level constants at scdx16p100.py:46-60 are
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

ARGUMENTRATIO = {argument_ratio}
PARTITION = {partition:.2f}

TRAINSUBSET = '{train_subset}'


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
'''

WRAPPER = '''"""Deployment wrapper shim (reference interface:
trainer/wrappers/centerOffsetResidual.py — the 10-row decode contract)."""

from scd_resnet_tpu.infer.wrapper import make_wrapper


class Wrapper:
    """Flattens decode output to the stacked 10-row tensor. Construct with
    (model, params, batch_stats); call with an NHWC batch."""

    def __init__(self, model, params, batch_stats):
        self._fn = make_wrapper(model, params, batch_stats)

    def __call__(self, inputs):
        return self._fn(inputs)
'''


def write(path, text):
    with open(path, "w") as f:
        f.write(text)


def main():
    for sub in ("", "model", "dataset", "wrappers"):
        write(os.path.join(ROOT, sub, "__init__.py"), "")
    for name in sorted(MODEL_PROFILES):
        write(os.path.join(ROOT, "model", name + ".py"),
              MODEL_TMPL.format(name=name))
    for name in sorted(DATASET_PROFILES):
        write(os.path.join(ROOT, "dataset", name + ".py"),
              DATASET_TMPL.format(name=name))
    os.makedirs(SCDS, exist_ok=True)
    write(os.path.join(SCDS, "__init__.py"), "")
    for name, prof in sorted(DATASET_PROFILES.items()):
        write(os.path.join(SCDS, name + ".py"),
              SCDS_TMPL.format(name=name,
                               argument_ratio=prof.argument_ratio,
                               partition=prof.partition,
                               train_subset=prof.train_subset))
    for wrapper_name in ("centerOffsetResidual",):
        write(os.path.join(ROOT, "wrappers", wrapper_name + ".py"), WRAPPER)
    print("generated shims for {} models, {} datasets".format(
        len(MODEL_PROFILES), len(DATASET_PROFILES)))


if __name__ == "__main__":
    main()
