"""Grapher blocks: FFN, SwinGrapher (windowed local GNN), PoolGrapher (global
pooled GNN).

Re-designs of ``NexToU_Encoder_Decoder.py:368-390,695-933``:

- fc1/fc2 are 1x1 convs = channel Dense layers, followed by the trainer's
  norm_op (BatchNorm, ``nnUNetTrainer_NexToU.py:54``),
- SwinGrapher: cyclic shift -> window partition -> fc1 -> DyGraphConv within
  each window -> fc2 -> window reverse -> unshift -> DropPath + residual.
  NOTE: its internal graph-conv norm is hardcoded to 'batch', overriding the
  OptInit 'instance' (reference ``:714``) — preserved here.
- PoolGrapher: fc1 -> PoolDyGraphConv over the full (max-pooled) map -> fc2 ->
  DropPath + residual.
- The relative-position kNN bias is a fixed (non-trainable) table stored in
  the 'constants' collection, precomputed host-side at init.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from nextou_tpu.core.pos_embed import relative_pos_bias
from nextou_tpu.core.window import window_partition, window_reverse
from nextou_tpu.nn.layers import ActLayer, make_norm, DropPath, he_normal_init
from nextou_tpu.nn.graph_conv import DyGraphConv, PoolDyGraphConv


class _Fc(nn.Module):
    """1x1 conv + norm (the reference's fc1/fc2 Sequential)."""

    features: int
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        x = nn.Dense(
            self.features,
            use_bias=True,
            kernel_init=he_normal_init((-2,)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x)
        return make_norm(self.norm, train=train, name="norm", dtype=self.dtype)(x)


class FFN(nn.Module):
    """fc1 -> act -> fc2 with norms and DropPath residual (reference :368-390)."""

    hidden_features: int
    out_features: int | None = None
    act_name: str = "relu"
    drop_path: float = 0.0
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        shortcut = x
        out_features = self.out_features or x.shape[-1]
        x = _Fc(self.hidden_features, self.norm, self.dtype, name="fc1")(x, train=train)
        x = ActLayer(self.act_name, name="act")(x)
        x = _Fc(out_features, self.norm, self.dtype, name="fc2")(x, train=train)
        return DropPath(self.drop_path, name="drop_path")(x, train=train) + shortcut


def _rel_pos_constant(mod: nn.Module, channels: int, n: int, n_reduced: int, dims: int):
    """Fixed kNN distance-bias table in the 'constants' collection.

    The variable name encodes (channels, dims); together with the leaf shape
    (n, n_reduced) it makes the table reconstructable from the variable tree
    alone — ``nextou_tpu.utils.init`` uses this to materialize constants
    without tracing the model (fast init path).
    """
    from nextou_tpu.utils import init as init_util

    def make():
        if init_util.shape_only():
            return jnp.zeros((n, n_reduced), jnp.float32)
        return jnp.asarray(relative_pos_bias(channels, n, n_reduced, dims))

    v = mod.variable("constants", f"relative_pos_c{channels}_d{dims}", make)
    return v.value


class SwinGrapher(nn.Module):
    """Windowed local GNN block over a channels-last spatial map."""

    window_size: Sequence[int]
    shift_size: Sequence[int]
    k: int = 9
    dilation: int = 1
    act_name: str = "leakyrelu"
    norm_op: str = "batch"  # fc1/fc2 norm (trainer's norm_op)
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    drop_path: float = 0.0
    use_relative_pos: bool = True
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        shortcut = x
        sp = x.shape[1:-1]
        C = x.shape[-1]
        dims = len(sp)
        window = tuple(self.window_size)
        shift = tuple(self.shift_size)
        n = math.prod(window)

        if max(shift) > 0:
            x = jnp.roll(x, [-s for s in shift], axis=tuple(range(1, 1 + dims)))
        xw = window_partition(x, window)  # (B*nW, *window, C)
        xw = _Fc(C, self.norm_op, self.dtype, name="fc1")(xw, train=train)

        rel = (
            _rel_pos_constant(self, C, n, n, dims) if self.use_relative_pos else None
        )
        xw = DyGraphConv(
            out_features=2 * C,
            k=self.k,
            dilation=self.dilation,
            reduce_ratio=1,
            act_name=self.act_name,
            norm="batch",  # reference hardcodes batch here (:714)
            use_bias=self.use_bias,
            stochastic=self.stochastic,
            epsilon=self.epsilon,
            groups=self.groups,
            dtype=self.dtype,
            name="graph_conv",
        )(xw, rel, train=train)
        xw = _Fc(C, self.norm_op, self.dtype, name="fc2")(xw, train=train)

        x = window_reverse(xw, window, sp)
        if max(shift) > 0:
            x = jnp.roll(x, list(shift), axis=tuple(range(1, 1 + dims)))
        return DropPath(self.drop_path, name="drop_path")(x, train=train) + shortcut


class Grapher(nn.Module):
    """Plain (non-windowed, non-pooled) grapher: fc1 -> DyGraphConv over the
    full map -> fc2, DropPath residual.

    Parity note: defined by the reference (``NexToU_Encoder_Decoder.py:
    553-632``) but never instantiated by NexToU — only Swin/Pool graphers
    are used. Provided for ViG-style models built on this framework.
    """

    k: int = 9
    dilation: int = 1
    reduce_ratio: int = 1
    act_name: str = "leakyrelu"
    norm: str = "instance"
    norm_op: str = "batch"
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    drop_path: float = 0.0
    use_relative_pos: bool = False
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        shortcut = x
        sp = x.shape[1:-1]
        C = x.shape[-1]
        dims = len(sp)
        x = _Fc(C, self.norm_op, self.dtype, name="fc1")(x, train=train)
        rel = None
        if self.use_relative_pos:
            n = math.prod(sp)
            n_reduced = math.prod(s // self.reduce_ratio for s in sp)
            rel = _rel_pos_constant(self, C, n, n_reduced, dims)
        x = DyGraphConv(
            out_features=2 * C,
            k=self.k,
            dilation=self.dilation,
            reduce_ratio=self.reduce_ratio,
            act_name=self.act_name,
            norm=self.norm,
            use_bias=self.use_bias,
            stochastic=self.stochastic,
            epsilon=self.epsilon,
            groups=self.groups,
            dtype=self.dtype,
            name="graph_conv",
        )(x, rel, train=train)
        x = _Fc(C, self.norm_op, self.dtype, name="fc2")(x, train=train)
        return DropPath(self.drop_path, name="drop_path")(x, train=train) + shortcut


class PoolGrapher(nn.Module):
    """Global pooled GNN block over a channels-last spatial map."""

    img_shape: Sequence[int]
    pool_size: Sequence[int]
    k: int = 9
    dilation: int = 1
    reduce_ratio: int = 1
    act_name: str = "leakyrelu"
    norm: str = "instance"  # graph-conv norm (OptInit.norm)
    norm_op: str = "batch"  # fc1/fc2 norm (trainer's norm_op)
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    drop_path: float = 0.0
    use_relative_pos: bool = True
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        shortcut = x
        sp = x.shape[1:-1]
        C = x.shape[-1]
        dims = len(sp)
        assert tuple(sp) == tuple(self.img_shape), (sp, self.img_shape)

        x = _Fc(C, self.norm_op, self.dtype, name="fc1")(x, train=train)

        rel = None
        if self.use_relative_pos:
            # node count after max-pool; candidate count after avg-pool(r)
            pooled_sp = [s // p for s, p in zip(sp, self.pool_size)]
            n = math.prod(pooled_sp)
            n_reduced = math.prod(s // self.reduce_ratio for s in pooled_sp)
            rel = _rel_pos_constant(self, C, n, n_reduced, dims)

        x = PoolDyGraphConv(
            out_features=2 * C,
            pool_size=self.pool_size,
            k=self.k,
            dilation=self.dilation,
            reduce_ratio=self.reduce_ratio,
            act_name=self.act_name,
            norm=self.norm,
            use_bias=self.use_bias,
            stochastic=self.stochastic,
            epsilon=self.epsilon,
            groups=self.groups,
            dtype=self.dtype,
            name="graph_conv",
        )(x, rel, train=train)
        x = _Fc(C, self.norm_op, self.dtype, name="fc2")(x, train=train)
        return DropPath(self.drop_path, name="drop_path")(x, train=train) + shortcut
