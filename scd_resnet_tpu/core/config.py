"""Experiment configuration.

Accepts the exact ``exp.json`` schema of the reference framework
(reference: configuration.py:11-44 declares the keys and defaults;
configuration.py:150-153 merges user JSON, dropping unknown keys;
``{key}`` template expansion happens in the property getters,
e.g. ``dirDatafile = "{dirDataset}{datasetName}.d"`` at configuration.py:42).

Differences from the reference, on purpose:

- unknown keys emit a warning instead of being silently dropped;
- directory getters still create the directory on access (the training
  engine relies on this), but only for the writable dirs;
- the configured ``learningRate`` is honored from step 0 for Adam as well
  (the reference constructs Adam without an ``lr`` argument —
  networkFactory.py:79-82 — so fresh runs silently start at torch's
  default 1e-3; SURVEY.md "known defects" #2 tells us to fix this).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

from scd_resnet_tpu.core.logging import Logger

# Keys and default values of the exp.json schema, kept identical to the
# reference so any reference experiment file loads verbatim.
_DEFAULTS: Dict[str, Any] = {
    "datasetName": None,
    "modelName": None,
    "trainName": None,
    # training
    "learningRate": 0.00025,
    "learningRateDecay": [80000],
    "learningRateDecayRate": [10],
    "currentIter": 0,
    "iterations": 117000,
    "validation": 200,
    "snapshot": 2000,
    "batchSize": 32,
    "validationBatchSize": 160,
    "naming": "{modelName}.{trainName}.{currentIter}.pth",
    "namingOptimizer": "{naming}.{optimizer}.pth",
    "pretrain": None,
    "optimizer": "adam",
    # directories
    "dirData": "trainer.dataset.{datasetName}",
    "dirModel": "trainer.model.{modelName}",
    "dirTemp": "/temp/",
    "dirPretrain": "/pretrain/",
    "dirConfig": "/configs/",
    "dirResult": "/results/",
    "dirDataset": "/datasets/",
    "dirDatafile": "{dirDataset}{datasetName}.d",
    "dirDataSplitProfile": "{dirDataset}{datasetName}.split.json",
    "useGPU": False,
    # train.py -debug: dump augmented-batch overlay PNGs at validation
    # boundaries (the reference declared the flag "enable debug features,
    # including visualization" but consumed it nowhere — train.py:41-42,96)
    "debug": False,
    # extensions over the reference schema:
    # conv-path compute precision — "float32" | "bfloat16" (MXU-native;
    # params/BN stay f32)
    "precision": "float32",
    # dataset placement — "auto" | "device" (HBM-resident shards) | "host"
    "residency": "auto",
    # HBM budget per device for the resident dataset (training + validation
    # clips), leaving the rest for parameters/activations; v5e has 16 GB
    "residencyBudgetGB": 8.0,
    # in-memory/HBM clip storage — "float32" | "float16" | "uint8"
    "storageDtype": "float16",
    # rematerialize activations in the backward pass (memory for FLOPs).
    # Models exposing a `remat` field (the hourglass families) checkpoint
    # PER STACK/BRANCH — much lower peak than wrapping the whole forward,
    # which is the fallback for models without the field. Parameter names
    # are pinned, so checkpoints are identical with the flag on or off.
    "remat": False,
    # base PRNG seed for init/shuffling/augmentation
    "seed": 42,
    # track the best validation checkpoint: when set to a metric name
    # from the family's [It] report line (e.g. "AP50", "mIoU",
    # "boxAP50"), every validation pass compares it and persists the
    # best-so-far state to {modelName}.{trainName}.best.pth. Motivated
    # by the round-4 corner finding: boxAP50 peaks mid-run and decays
    # under the centerOffset-tuned schedule, so the final snapshot is
    # not the production checkpoint for that family.
    "bestSnapshotMetric": None,
    "bestSnapshotMode": "max",  # "max" | "min" (for MAE-style metrics)
    # multi-axis device mesh, the one-knob analog of the reference's DDP
    # world size (networkFactory.py:134). null -> a 1-D "data" mesh over
    # every device whose size divides the batch (the default, pure DP).
    # e.g. "meshShape": [4, 2], "meshAxes": ["data", "model"] trains
    # DP=4 x TP=2: the batch shards over "data", wide kernels (last dim
    # >= 64, divisible) shard their output channels over "model", and
    # GSPMD inserts the ICI collectives (parallel/mesh.py rules).
    "meshShape": None,
    "meshAxes": None,
    # GPipe microbatch count when the mesh has a 'pipe' axis (stage = one
    # hourglass stack; bubble fraction = (S-1)/(M+S-1)). null -> 2 x stages.
    "pipelineMicrobatches": None,
}


class Configuration:
    """Mutable experiment configuration with template-expanding getters."""

    def __init__(self) -> None:
        self.config: Dict[str, Any] = dict(_DEFAULTS)
        # lists are mutable; don't share them across instances
        self.config["learningRateDecay"] = list(_DEFAULTS["learningRateDecay"])
        self.config["learningRateDecayRate"] = list(_DEFAULTS["learningRateDecayRate"])

    # ---- merge / mutate ------------------------------------------------

    def update_config(self, config_obj: Dict[str, Any]) -> None:
        for key, value in config_obj.items():
            if key in self.config:
                self.config[key] = value
            else:
                Logger.warn(
                    ":: config :: ignoring unknown configuration key '{}'".format(key)
                )

    # reference-compatible alias (configuration.py:150)
    updateConfig = update_config

    def update_iteration(self, it: int) -> None:
        self.config["currentIter"] = int(it)

    updateIteration = update_iteration

    def update(self, name: str, value: Any) -> None:
        self.config[name] = value

    @classmethod
    def from_json(cls, path: str) -> "Configuration":
        cfg = cls()
        with open(path, "r") as f:
            cfg.update_config(json.load(f))
        return cfg

    # ---- template expansion --------------------------------------------

    def _fmt(self, key: str) -> str:
        return str(self.config[key]).format(**self.config)

    def _dir(self, key: str) -> str:
        path = self.config[key]
        if not os.path.exists(path):
            os.makedirs(path, exist_ok=True)
        return path

    # ---- getters (mirroring the reference property surface) -------------

    @property
    def pretrain(self) -> Optional[str]:
        if self.config["pretrain"] is not None:
            return self.config["dirPretrain"] + self.config["pretrain"]
        return None

    @property
    def datasetName(self) -> Optional[str]:
        return self.config["datasetName"]

    @property
    def modelName(self) -> Optional[str]:
        return self.config["modelName"]

    @property
    def trainName(self) -> Optional[str]:
        return self.config["trainName"]

    @property
    def learningRate(self) -> float:
        return self.config["learningRate"]

    @property
    def learningRateDecay(self) -> List[int]:
        return self.config["learningRateDecay"]

    @property
    def learningRateDecayRate(self) -> List[float]:
        return self.config["learningRateDecayRate"]

    @property
    def totalIterations(self) -> int:
        return self.config["iterations"]

    @property
    def snapshotFrequency(self) -> int:
        return self.config["snapshot"]

    @property
    def validationFrequency(self) -> int:
        return self.config["validation"]

    @property
    def batchSize(self) -> int:
        return self.config["batchSize"]

    @property
    def validationBatchSize(self) -> int:
        return self.config["validationBatchSize"]

    @property
    def currentIteration(self) -> int:
        return self.config["currentIter"]

    @property
    def naming(self) -> str:
        return self._fmt("naming")

    @property
    def optimizer(self) -> str:
        return self._fmt("optimizer")

    @property
    def namingOptimizer(self) -> str:
        return self.config["namingOptimizer"]

    @property
    def storageDtype(self) -> str:
        return self.config["storageDtype"]

    @property
    def bestSnapshotMetric(self) -> Optional[str]:
        return self.config["bestSnapshotMetric"]

    @property
    def bestSnapshotMode(self) -> str:
        return self.config["bestSnapshotMode"]

    @property
    def dirData(self) -> str:
        return self._fmt("dirData")

    @property
    def dirModel(self) -> str:
        return self._fmt("dirModel")

    @property
    def dirTemp(self) -> str:
        return self._dir("dirTemp")

    @property
    def dirResult(self) -> str:
        return self._dir("dirResult")

    @property
    def dirConfig(self) -> str:
        return self._dir("dirConfig")

    @property
    def dirDatafile(self) -> str:
        return self._fmt("dirDatafile")

    @property
    def dirDataSplitProfile(self) -> str:
        return self._fmt("dirDataSplitProfile")

    def useGPU(self):
        """Reference-compatible accessor (configuration.py:147-148 defines
        this as a method, shadowing the config key)."""
        return self.config["useGPU"]


# Global default instance, matching the reference's module-level singleton
# (configuration.py:161). Entry points merge the experiment JSON into it.
default_config = Configuration()
