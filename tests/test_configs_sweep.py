"""Every shipped experiment config must load cleanly and resolve to
registered model/dataset profiles (the exp74-86 sweep)."""

import glob
import json
import os

from scd_resnet_tpu.core.config import Configuration
from scd_resnet_tpu.train.registry import get_dataset_profile, get_model_profile

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def test_sweep_configs_resolve():
    paths = sorted(glob.glob(os.path.join(REPO, "configs", "exp[0-9]*.json")))
    # resume variants (exp80.resume.json) are preemption artifacts, not
    # sweep members — validate them too, but count only the base 13
    assert sum("resume" not in p for p in paths) == 13  # exp74..exp86
    for path in paths:
        cfg = Configuration()
        with open(path) as f:
            cfg.update_config(json.load(f))
        get_model_profile(cfg.modelName)
        profile = get_dataset_profile(cfg.datasetName)
        # naming template expands without error
        assert cfg.naming.endswith(".pth")
        assert cfg.dirDatafile.endswith(cfg.datasetName + ".d")
        assert 0 < profile.partition <= 1.0
