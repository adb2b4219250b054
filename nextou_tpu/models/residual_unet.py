"""ResidualEncoderUNet: residual-encoder nnU-Net variant.

The reference trainer's network mapping names it next to PlainConvUNet and
NexToU (``nnUNetTrainer_NexToU.py:8,34,45,69,89``) though its hardcoded
``segmentation_network_class_name = 'NexToU'`` (``:30``) means the reference
never instantiates it; it is the plans-selectable
``dynamic_network_architectures`` architecture of the nnU-Net v2 substrate.
Layout: a stride-1 stem conv block to ``features_per_stage[0]``, encoder
stages of BasicBlockD residual blocks (``n_blocks_per_stage`` — the plans'
``n_conv_per_stage_encoder``; first block strided, last norm zero-initialized
per ``init_last_bn_before_add_to_0``), and the same plain conv decoder +
deep-supervision heads as PlainConvUNet.

No voxel-level torch parity test exists for this class (the real
``dynamic_network_architectures`` package is not available on this box and
the reference never constructs it); coverage is shape/gradient/identity-init
tests in ``tests/test_model.py``.
"""

from __future__ import annotations

from typing import Sequence

from nextou_tpu.models.nextou import NexToU
from nextou_tpu.models.plain_unet import build_plain_unet_spec
from nextou_tpu.models.spec import ModelSpec
import dataclasses


def build_residual_encoder_unet_spec(
    *,
    in_channels: int,
    patch_size: Sequence[int],
    n_stages: int,
    features_per_stage: Sequence[int],
    kernel_sizes: Sequence[Sequence[int]],
    strides: Sequence[Sequence[int]],
    n_blocks_per_stage: Sequence[int],
    n_conv_per_stage_decoder: Sequence[int],
    num_classes: int,
    deep_supervision: bool = True,
) -> ModelSpec:
    spec = build_plain_unet_spec(
        in_channels=in_channels,
        patch_size=patch_size,
        n_stages=n_stages,
        features_per_stage=features_per_stage,
        kernel_sizes=kernel_sizes,
        strides=strides,
        n_conv_per_stage=n_blocks_per_stage,
        n_conv_per_stage_decoder=n_conv_per_stage_decoder,
        num_classes=num_classes,
        deep_supervision=deep_supervision,
    )
    encoder = tuple(
        dataclasses.replace(st, residual=True) for st in spec.encoder
    )
    return dataclasses.replace(
        spec, encoder=encoder, stem_features=features_per_stage[0]
    )


class ResidualEncoderUNet(NexToU):
    """Same interpreter; residual-encoder spec. Distinct class so network
    selection by name works like the reference's mapping."""
