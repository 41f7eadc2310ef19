"""Profile shim: re-export of the 'centerOffsetRes10dcn' model profile
(reference interface: trainer/model/centerOffsetRes10dcn.py)."""

from scd_resnet_tpu.train.registry import get_model_profile as _get

_profile = _get("centerOffsetRes10dcn")
model = _profile.model_cls
modelParams = _profile.model_params
loss = _profile.loss
decode = _profile.decode
evaluation = _profile.evaluation
expression = _profile.expression
