"""Profile shim: re-export of the 'centerOffsetRes50h' model profile
(reference interface: trainer/model/centerOffsetRes50h.py)."""

from scd_resnet_tpu.train.registry import get_model_profile as _get

_profile = _get("centerOffsetRes50h")
model = _profile.model_cls
modelParams = _profile.model_params
loss = _profile.loss
decode = _profile.decode
evaluation = _profile.evaluation
expression = _profile.expression
