"""Reference-compatible module path: the configuration singleton
(reference: configuration.py). Re-exports the framework config."""

from scd_resnet_tpu.core.config import Configuration
from scd_resnet_tpu.core.config import default_config as defaultConfig

__all__ = ["Configuration", "defaultConfig"]
