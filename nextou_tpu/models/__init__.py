from nextou_tpu.models.spec import (
    GNNBlockSpec,
    StageSpec,
    DecoderStageSpec,
    ModelSpec,
    build_model_spec,
    knn_schedule,
)
from nextou_tpu.models.nextou import NexToU
from nextou_tpu.models.plain_unet import PlainConvUNet, build_plain_unet_spec
from nextou_tpu.models.residual_unet import (
    ResidualEncoderUNet,
    build_residual_encoder_unet_spec,
)
