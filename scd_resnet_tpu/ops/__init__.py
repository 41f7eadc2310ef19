from scd_resnet_tpu.ops.radius import center_threshold_radius, corner_threshold_radius
from scd_resnet_tpu.ops.gaussian import render_heatmap
from scd_resnet_tpu.ops.decode import (
    clamp_sigmoid,
    extract_topk,
    gather_features,
    non_maximum_suppression,
    reshape_gather_features,
)
from scd_resnet_tpu.ops.losses import (
    embedding_loss,
    focal_loss,
    l1_loss_mask,
    smooth_l1_loss_mask,
)
from scd_resnet_tpu.ops.augment import (
    gaussian_noise,
    normalize,
    uniform_noise,
    variance_jitter,
)
from scd_resnet_tpu.ops.corner_pool import (
    bottom_pool,
    left_pool,
    right_pool,
    top_pool,
)
from scd_resnet_tpu.ops.dcn import (
    deform_conv2d,
    deform_psroi_pooling,
)
