"""Profile shim: re-export of the 'centerOffsetHourglass2' model profile
(reference interface: trainer/model/centerOffsetHourglass2.py)."""

from scd_resnet_tpu.train.registry import get_model_profile as _get

_profile = _get("centerOffsetHourglass2")
model = _profile.model_cls
modelParams = _profile.model_params
loss = _profile.loss
decode = _profile.decode
evaluation = _profile.evaluation
expression = _profile.expression
