from nextou_tpu.losses.dice import soft_dice_loss
from nextou_tpu.losses.ce import cross_entropy_loss
from nextou_tpu.losses.ti import TILossSpec, ti_loss, critical_voxels_map
from nextou_tpu.losses.compound import CompoundLossSpec, dc_ce_ti_loss
from nextou_tpu.losses.deep_supervision import (
    deep_supervision_weights,
    downsample_target,
    deep_supervised_loss,
)
