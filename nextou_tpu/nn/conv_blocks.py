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
    # stage-persistent fold (see StackedConvBlocks): input/output arrive/
    # leave with this many leading spatial axes folded into the batch.
    # Only valid with BatchNorm, whose (batch+spatial)-per-channel reduction
    # is the same set folded or not.
    pre_folded: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        if self.pre_folded:
            assert self.norm == "batch", self.norm
        x = FoldedConv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size),
            use_bias=self.use_bias,
            dtype=self.dtype,
            pre_folded=self.pre_folded,
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
    """``num_convs`` ConvNormAct blocks; only the first is strided.

    Stage-persistent fold (``NEXTOU_STAGE_FOLD``): when every conv in the
    stage has pointwise leading axes (kernel 1, stride 1 — nnU-Net's
    anisotropic (1,3,3) stages), the per-conv fold/unfold inside FoldedConv
    makes XLA relayout the full-res feature map at every block boundary:
    the conv prefers folded-batch-on-lanes {0,3,2,1} (B*D=128 fills the
    lanes where C=33 cannot) while the unfold reshape needs dim 0 major —
    3x 363 MB copies = 9.3 ms/step at the flagship stem (round-5 trace,
    PERF.md seam inventory). This path folds ONCE at stage entry and
    unfolds ONCE at exit; convs run with ``pre_folded`` (full-rank params,
    importer unchanged) and BatchNorm statistics are fold-invariant (the
    per-channel reduction covers batch+spatial either way). Requires
    norm='batch'; instance norm would need fold-aware statistics.
    """

    num_convs: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "batch"
    act_name: str = "leakyrelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        import os

        k = tuple(self.kernel_size)
        s0 = tuple(self.first_stride)
        n_fold = 0
        if (
            os.environ.get("NEXTOU_STAGE_FOLD", "0") == "1"
            and os.environ.get("NEXTOU_NO_FOLD", "0") != "1"
            and self.norm == "batch"
        ):
            while n_fold < len(k) - 1 and k[n_fold] == 1 and s0[n_fold] == 1:
                n_fold += 1
        lead = None
        if n_fold:
            parts = x if isinstance(x, (tuple, list)) else (x,)
            lead = parts[0].shape[: 1 + n_fold]
            folded = tuple(
                p.reshape(-1, *p.shape[1 + n_fold :]) for p in parts
            )
            x = folded if len(folded) > 1 else folded[0]
        ones = (1,) * len(k)
        for i in range(self.num_convs):
            x = ConvNormAct(
                features=self.features,
                kernel_size=k,
                strides=s0 if i == 0 else ones,
                norm=self.norm,
                act_name=self.act_name,
                dtype=self.dtype,
                pre_folded=n_fold,
                name=f"block_{i}",
            )(x, train=train)
        if n_fold:
            x = x.reshape(*lead, *x.shape[1:])
        return x
