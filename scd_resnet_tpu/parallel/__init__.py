from scd_resnet_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch_arrays,
)
from scd_resnet_tpu.parallel.pipeline import (
    HourglassPipelineStage,
    init_stage_stack,
    pipeline_apply,
    sequential_apply,
)
