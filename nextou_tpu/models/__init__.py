from nextou_tpu.models.spec import (
    GNNBlockSpec,
    StageSpec,
    DecoderStageSpec,
    ModelSpec,
    build_model_spec,
    knn_schedule,
)
from nextou_tpu.models.nextou import NexToU
