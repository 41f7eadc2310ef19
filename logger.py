"""Reference-compatible module path: ANSI logger (reference: logger.py)."""

from scd_resnet_tpu.core.logging import Logger

__all__ = ["Logger"]
