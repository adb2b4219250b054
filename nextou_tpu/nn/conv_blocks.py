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


class ResidualBlock(nn.Module):
    """BasicBlockD-style residual block.

    ``act(norm2(conv2(act(norm1(conv1(x))))) + skip(x))`` where conv1
    carries the stride and skip is identity unless the stride or channel
    count changes (then a strided 1x1 conv + norm, no activation) — the
    semantics of ``dynamic_network_architectures`` ``BasicBlockD`` that the
    reference trainer's ResidualEncoderUNet mapping entry names
    (``nnUNetTrainer_NexToU.py:8,45``). ``zero_init_last_norm`` mirrors
    ``init_last_bn_before_add_to_0`` (``:89``): norm2's scale starts at 0 so
    every block is initially ``act(skip(x))``.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "batch"
    act_name: str = "leakyrelu"
    use_bias: bool = True
    zero_init_last_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        k = tuple(self.kernel_size)
        s = tuple(self.strides)
        pad = tuple(((kk - 1) // 2, (kk - 1) // 2) for kk in k)
        y = FoldedConv(
            features=self.features, kernel_size=k, strides=s, padding=pad,
            use_bias=self.use_bias, dtype=self.dtype, name="conv1",
        )(x)
        y = make_norm(self.norm, train=train, name="norm1", dtype=self.dtype)(y)
        y = ActLayer(self.act_name, name="act1")(y)
        y = FoldedConv(
            features=self.features, kernel_size=k, strides=(1,) * len(k),
            padding=pad, use_bias=self.use_bias, dtype=self.dtype,
            name="conv2",
        )(y)
        y = make_norm(
            self.norm, train=train, name="norm2", dtype=self.dtype,
            zero_init_scale=self.zero_init_last_norm,
        )(y)
        if any(st != 1 for st in s) or x.shape[-1] != self.features:
            skip = FoldedConv(
                features=self.features, kernel_size=(1,) * len(k), strides=s,
                padding=((0, 0),) * len(k), use_bias=False, dtype=self.dtype,
                name="skip_conv",
            )(x)
            skip = make_norm(
                self.norm, train=train, name="skip_norm", dtype=self.dtype
            )(skip)
        else:
            skip = x
        return ActLayer(self.act_name, name="act2")(y + skip)


class StackedResidualBlocks(nn.Module):
    """``num_blocks`` ResidualBlocks; only the first is strided
    (``dynamic_network_architectures`` ``StackedResidualBlocks`` layout)."""

    num_blocks: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "batch"
    act_name: str = "leakyrelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        ones = (1,) * len(self.kernel_size)
        for i in range(self.num_blocks):
            x = ResidualBlock(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=tuple(self.first_stride) if i == 0 else ones,
                norm=self.norm,
                act_name=self.act_name,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train=train)
        return x


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
