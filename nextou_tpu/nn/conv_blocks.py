"""Plain conv blocks: the nnU-Net ``StackedConvBlocks`` equivalent.

Each block is conv -> norm -> LeakyReLU (conv_bias=True, BatchNorm eps 1e-5,
LeakyReLU slope 1e-2), matching what the reference trainer configures
(``nnUNetTrainer_NexToU.py:52-58``) on top of
``dynamic_network_architectures.StackedConvBlocks``. Channels-last; padding
is the explicit symmetric ``(k-1)//2`` torch uses — NOT 'SAME', which pads
(0, 1) instead of (1, 1) for k=3/stride=2 and shifts the sampling grid of
every strided conv by one voxel relative to the reference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax

import flax.linen as nn

from nextou_tpu.nn.layers import ActLayer, FoldedConv, make_norm


class ConvNormAct(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "batch"
    act_name: str = "leakyrelu"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        x = FoldedConv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = make_norm(self.norm, train=train, name="norm", dtype=self.dtype)(x)
        return ActLayer(self.act_name, name="act")(x)


class StackedConvBlocks(nn.Module):
    """``num_convs`` ConvNormAct blocks; only the first is strided."""

    num_convs: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "batch"
    act_name: str = "leakyrelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        ones = (1,) * len(self.kernel_size)
        for i in range(self.num_convs):
            x = ConvNormAct(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=tuple(self.first_stride) if i == 0 else ones,
                norm=self.norm,
                act_name=self.act_name,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train=train)
        return x
