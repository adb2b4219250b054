"""The NexToU hybrid conv/GNN U-Net as a flax module.

A thin interpreter over :class:`nextou_tpu.models.spec.ModelSpec` (the shape
program). Mirrors the reference network (``NexToU.py:11-63``,
``NexToU_Encoder_Decoder.py:34-366``): plain-conv early stages, the 4 deepest
encoder stages (and 3 deepest decoder stages) get PoolGNN + SwinGNN blocks;
transp-conv upsampling with skip concatenation; one 1x1 seg head per decoder
stage, all built regardless of deep supervision so checkpoints always reload
(reference ``:302-305``).

Layout is channels-last ``(B, *spatial, C)`` — the TPU conv layout. Compute
dtype is configurable (bf16 for speed); params and norm statistics stay fp32.
Optionally remats each stage to trade FLOPs for HBM during training.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from nextou_tpu.models.spec import ModelSpec, StageSpec, DecoderStageSpec, GNNBlockSpec
from nextou_tpu.nn.conv_blocks import (
    ConvNormAct,
    StackedConvBlocks,
    StackedResidualBlocks,
)
from nextou_tpu.nn.graphers import FFN, PoolGrapher, SwinGrapher
from nextou_tpu.nn.layers import conv_he_normal, ShuffleConvTranspose


class _GNNBlocks(nn.Module):
    """A sequence of [Grapher -> FFN] pairs for one stage."""

    blocks: tuple[GNNBlockSpec, ...]
    features: int
    spec: ModelSpec
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        s = self.spec
        for i, b in enumerate(self.blocks):
            if b.kind == "pool":
                x = PoolGrapher(
                    img_shape=tuple(x.shape[1:-1]),
                    pool_size=b.pool_size,
                    k=b.k,
                    dilation=b.dilation,
                    reduce_ratio=b.reduce_ratio,
                    act_name=s.act,
                    norm=s.gnn_norm,
                    norm_op=s.norm_op,
                    use_bias=s.use_bias,
                    stochastic=s.stochastic,
                    epsilon=s.epsilon,
                    drop_path=b.drop_path,
                    groups=s.groups,
                    dtype=self.dtype,
                    name=f"grapher_{i}",
                )(x, train=train)
            else:
                x = SwinGrapher(
                    window_size=b.window_size,
                    shift_size=b.shift_size,
                    k=b.k,
                    dilation=b.dilation,
                    act_name=s.act,
                    norm_op=s.norm_op,
                    use_bias=s.use_bias,
                    stochastic=s.stochastic,
                    epsilon=s.epsilon,
                    drop_path=b.drop_path,
                    groups=s.groups,
                    dtype=self.dtype,
                    name=f"grapher_{i}",
                )(x, train=train)
            x = FFN(
                hidden_features=self.features * 4,
                out_features=self.features,
                act_name=s.act,
                drop_path=b.drop_path,
                norm=s.norm_op,
                dtype=self.dtype,
                name=f"ffn_{i}",
            )(x, train=train)
        return x


class EncoderStage(nn.Module):
    stage: StageSpec
    spec: ModelSpec
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        st = self.stage
        blocks = StackedResidualBlocks if st.residual else StackedConvBlocks
        x = blocks(
            st.n_conv,
            features=st.features,
            kernel_size=st.kernel_size,
            first_stride=st.stride,
            norm=self.spec.norm_op,
            dtype=self.dtype,
            name="convs",
        )(x, train=train)
        if st.gnn:
            x = _GNNBlocks(
                blocks=st.gnn,
                features=st.features,
                spec=self.spec,
                dtype=self.dtype,
                name="gnn",
            )(x, train)
        return x


class DecoderStage(nn.Module):
    stage: DecoderStageSpec
    spec: ModelSpec
    dtype: Any = None
    # None -> env default (ON). Split ON wins BOTH contexts (round-4
    # on-chip A/Bs, PERF.md): bare forward 141.5 vs 154.5 ms and fused
    # sliding window 0.443 vs 0.474 s/volume — no builder should pass
    # False except to reproduce the A/B.
    split_concat: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool) -> jax.Array:
        st = self.stage
        x = ShuffleConvTranspose(
            features=st.features,
            kernel_size=st.transp_stride,
            strides=st.transp_stride,
            use_bias=self.spec.use_bias,
            dtype=self.dtype,
            name="transpconv",
        )(x)
        use_split = (
            self.split_concat
            if self.split_concat is not None
            else os.environ.get("NEXTOU_SPLIT_CONCAT", "1") == "1"
        )
        if use_split:
            # feed (upsampled, skip) as a tuple: the first conv computes
            # conv(concat(...)) as a sum of two per-part convs with sliced
            # weights (FoldedConv tuple input) — skips materializing the
            # concat, whose layout the round-3 trace showed driving the
            # stage-2 decoder conv to 24 TF/s vs the encoder twin's 83.
            # Default ON since the round-4 in-model A/B: 141.5 vs 154.5 ms
            # flagship batch-2 forward (tools/exp_ab_layout.py, PERF.md).
            x = (x, skip.astype(x.dtype))
        else:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = StackedConvBlocks(
            num_convs=st.n_conv,
            features=st.features,
            kernel_size=st.kernel_size,
            first_stride=(1,) * len(st.kernel_size),
            norm=self.spec.norm_op,
            dtype=self.dtype,
            name="convs",
        )(x, train=train)
        if st.gnn:
            x = _GNNBlocks(
                blocks=st.gnn,
                features=st.features,
                spec=self.spec,
                dtype=self.dtype,
                name="gnn",
            )(x, train)
        return x


class SegHead(nn.Module):
    """1x1 segmentation head (param-compatible with ``nn.Conv``: 'kernel'
    (*1s, Cin, num_classes) + 'bias').

    ``channel_major=True`` emits (B, num_classes, *spatial) f32 via an
    einsum, so the small class dim never sits on the TPU lane axis (see
    ``NexToU.channel_major_logits``)."""

    num_classes: int
    spatial_dims: int
    channel_major: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kshape = (1,) * self.spatial_dims + (x.shape[-1], self.num_classes)
        kernel = self.param("kernel", conv_he_normal, kshape, jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_classes,), jnp.float32
        )
        dt = self.dtype or x.dtype
        w = kernel.reshape(x.shape[-1], self.num_classes).astype(dt)
        if self.channel_major:
            out = jnp.einsum("b...i,ic->bc...", x.astype(dt), w)
            # stay in compute dtype: the loss upcasts after its (B, C, V)
            # reshape; f32 DS logits would cost ~2x the HBM for nothing
            # (they were computed in `dt` anyway)
            return out + bias.astype(dt).reshape(
                (1, self.num_classes) + (1,) * self.spatial_dims
            )
        out = x.astype(dt) @ w + bias.astype(dt)
        # Emit logits in the compute dtype: the inference path softmaxes in
        # f32 anyway (infer/sliding_window.py upcasts), and a bf16 logit
        # volume is half the HBM + none of the f32 layout copies the round-3
        # trace showed at full res. Parity: the torch reference's final conv
        # under autocast emits fp16 logits too. NEXTOU_F32_LOGITS=1 restores
        # the old f32 emission (f32-dtype models are unaffected either way).
        if os.environ.get("NEXTOU_F32_LOGITS", "0") == "1":
            return out.astype(jnp.float32)
        return out


_REMAT_BIG_BYTES = 64 * 1024 * 1024  # bf16 bytes per batch element


def _remat_flags(spec: ModelSpec, mode) -> tuple[list[bool], list[bool]]:
    """Per-stage remat decisions for mode in {False, True, 'big'}."""
    import math as _math

    n_e, n_d = len(spec.encoder), len(spec.decoder)
    if mode is True:
        return [True] * n_e, [True] * n_d
    if not mode:
        return [False] * n_e, [False] * n_d
    assert mode == "big", mode
    shape = list(spec.patch_size)
    enc_bytes = []
    for st in spec.encoder:
        shape = [a // b for a, b in zip(shape, st.stride)]
        enc_bytes.append(_math.prod(shape) * st.features * 2)
    enc = [b >= _REMAT_BIG_BYTES for b in enc_bytes]
    # decoder stage i computes at encoder stage n_e-2-i resolution/features
    dec = [enc_bytes[n_e - 2 - i] >= _REMAT_BIG_BYTES for i in range(n_d)]
    return enc, dec


class NexToU(nn.Module):
    """Full encoder/decoder network.

    ``__call__`` returns a list of logits [full-res, ..., lowest-res] when
    ``spec.deep_supervision`` (reference decoder output order ``:331-337``),
    else a single full-res logits array.
    """

    spec: ModelSpec
    dtype: Any = jnp.float32
    # False: store all activations; True: remat every stage (~1.4x step
    # time); "big": remat only stages whose input/output feature map exceeds
    # _REMAT_BIG_BYTES — they hold most of the activation memory (the
    # high-resolution conv stages) while the cheap-to-store deep/GNN stages
    # keep their activations, so the recompute overhead stays small.
    remat: Any = False
    # Emit logits as (B, num_classes, *spatial) instead of channels-last.
    # TPU tiling pads the minor-most dims to (8, 128): a small class count on
    # the lane axis inflates the full-res f32 logits 9.1x in HBM (measured,
    # C=14 flagship) — with spatial minor the padding is ~1x. The training
    # path uses this; inference keeps channels-last (softmax/blending reads).
    channel_major_logits: bool = False
    # Decoder concat lowering: None -> NEXTOU_SPLIT_CONCAT env (default
    # split). See DecoderStage.split_concat.
    split_concat: bool | None = None

    def compute_conv_feature_map_size(self, input_size=None) -> int:
        """Total conv output elements of a forward pass — the VRAM proxy
        nnU-Net uses for auto-configuration (reference ``NexToU.py:59-63``).
        ``input_size`` defaults to the spec's patch size."""
        from nextou_tpu.plans.planner import compute_conv_feature_map_size

        s = self.spec
        return compute_conv_feature_map_size(
            list(input_size or s.patch_size),
            [st.features for st in s.encoder],
            [list(st.stride) for st in s.encoder],
            [st.n_conv + len(st.gnn) for st in s.encoder],
            [st.n_conv + len(st.gnn) for st in s.decoder],
            num_classes=s.num_classes,
        )

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        s = self.spec
        assert x.shape[1:-1] == s.patch_size, (
            f"input spatial {x.shape[1:-1]} != spec patch {s.patch_size}"
        )
        x = x.astype(self.dtype)

        enc_flags, dec_flags = _remat_flags(s, self.remat)
        enc_r = nn.remat(EncoderStage, static_argnums=(2,))
        dec_r = nn.remat(DecoderStage, static_argnums=(3,))

        if s.stem_features is not None:
            # ResidualEncoder's stride-1 stem conv block before stage 0
            x = ConvNormAct(
                features=s.stem_features,
                kernel_size=s.encoder[0].kernel_size,
                strides=(1,) * s.spatial_dims,
                norm=s.norm_op,
                dtype=self.dtype,
                name="stem",
            )(x, train=train)

        skips = []
        for i, st in enumerate(s.encoder):
            cls = enc_r if enc_flags[i] else EncoderStage
            x = cls(stage=st, spec=s, dtype=self.dtype, name=f"enc_{i}")(
                x, train
            )
            skips.append(x)

        seg_outputs = []
        x = skips[-1]
        n_dec = len(s.decoder)
        for i, st in enumerate(s.decoder):
            cls = dec_r if dec_flags[i] else DecoderStage
            x = cls(
                stage=st, spec=s, dtype=self.dtype,
                split_concat=self.split_concat, name=f"dec_{i}",
            )(x, skips[-(i + 2)], train)
            # all seg heads are always *built* so params always exist
            head = SegHead(
                num_classes=s.num_classes,
                spatial_dims=s.spatial_dims,
                channel_major=self.channel_major_logits,
                dtype=self.dtype,
                name=f"seg_head_{i}",
            )
            if s.deep_supervision or i == n_dec - 1:
                seg_outputs.append(head(x))
            else:
                # initialize params without computing over the full map
                dummy = jnp.zeros(
                    (1,) + (1,) * s.spatial_dims + (x.shape[-1],), self.dtype
                )
                _ = head(dummy)

        seg_outputs = seg_outputs[::-1]  # highest resolution first
        if not s.deep_supervision:
            return seg_outputs[0]
        return seg_outputs
