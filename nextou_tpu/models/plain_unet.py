"""PlainConvUNet: the nnU-Net baseline architecture.

The reference's plans name ``PlainConvUNet`` for the non-NexToU
configurations (``nnUNetPlans.json`` 2d/3d_lowres/3d_fullres;
``nnUNetTrainer_NexToU.py:96-101`` keeps it in its class mapping). Sharing
the NexToU spec machinery: a PlainConvUNet is a ModelSpec with no GNN blocks
and the full conv count per stage.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

from nextou_tpu.models.spec import (
    DecoderStageSpec,
    ModelSpec,
    StageSpec,
    _stage_shapes,
)
from nextou_tpu.models.nextou import NexToU


def build_plain_unet_spec(
    *,
    in_channels: int,
    patch_size: Sequence[int],
    n_stages: int,
    features_per_stage: Sequence[int],
    kernel_sizes: Sequence[Sequence[int]],
    strides: Sequence[Sequence[int]],
    n_conv_per_stage: Sequence[int],
    n_conv_per_stage_decoder: Sequence[int],
    num_classes: int,
    deep_supervision: bool = True,
) -> ModelSpec:
    spatial_dims = len(patch_size)
    shapes = _stage_shapes(patch_size, strides)
    encoder = tuple(
        StageSpec(
            features=features_per_stage[s],
            kernel_size=tuple(kernel_sizes[s]),
            stride=tuple(strides[s]),
            n_conv=n_conv_per_stage[s],
            img_shape=shapes[s],
            gnn=(),
        )
        for s in range(n_stages)
    )
    decoder = tuple(
        DecoderStageSpec(
            features=features_per_stage[-(s + 1)],
            transp_stride=tuple(strides[-s]),
            kernel_size=tuple(kernel_sizes[-(s + 1)]),
            n_conv=n_conv_per_stage_decoder[s - 1],
            img_shape=shapes[n_stages - (s + 1)],
            gnn=(),
        )
        for s in range(1, n_stages)
    )
    return ModelSpec(
        spatial_dims=spatial_dims,
        in_channels=in_channels,
        num_classes=num_classes,
        patch_size=tuple(patch_size),
        encoder=encoder,
        decoder=decoder,
        groups=4 if spatial_dims == 2 else 6,
        deep_supervision=deep_supervision,
    )


class PlainConvUNet(NexToU):
    """Same interpreter; conv-only spec. Kept as a distinct class so network
    selection by name works like the reference's mapping."""
