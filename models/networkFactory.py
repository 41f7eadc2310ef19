"""Reference-compatible module path (reference: models/networkFactory.py):
the training engine."""

from scd_resnet_tpu.train.factory import NetworkFactory

__all__ = ["NetworkFactory"]
