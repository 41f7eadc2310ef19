"""Deployment wrapper shim (reference interface:
trainer/wrappers/centerOffsetResidual.py — the 10-row decode contract)."""

from scd_resnet_tpu.infer.wrapper import make_wrapper


class Wrapper:
    """Flattens decode output to the stacked 10-row tensor. Construct with
    (model, params, batch_stats); call with an NHWC batch."""

    def __init__(self, model, params, batch_stats):
        self._fn = make_wrapper(model, params, batch_stats)

    def __call__(self, inputs):
        return self._fn(inputs)
