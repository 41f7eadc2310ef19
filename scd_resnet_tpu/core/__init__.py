from scd_resnet_tpu.core.config import Configuration, default_config
from scd_resnet_tpu.core.logging import Logger
