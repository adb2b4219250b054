"""Graph convolution modules: MRConv, DyGraphConv, PoolDyGraphConv.

Channels-last re-designs of the reference modules
(``/root/reference/network_architecture/NexToU_Encoder_Decoder.py:392-551``):

- :class:`MRConv` — max-relative aggregation with the reference's exact
  channel interleaving (``:409``: output channel order x0, m0, x1, m1, ...),
- :class:`DyGraphConv` — dynamic kNN graph + MRConv, with optional avg-pooled
  candidate-set reduction ``r`` (``:463-465``),
- :class:`PoolDyGraphConv` — max-pool (size 2 per even axis) before the graph,
  channel-doubled max-unpool scatter-back after (``:490-551``). The unpool is
  an argmax one-hot scatter (static shapes, no dynamic indexing) — the TPU
  equivalent of ``MaxUnpool`` with duplicated indices.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from nextou_tpu.core.graph import batched_index_select, dilated_knn_graph
from nextou_tpu.nn.layers import GroupedMLP


def avg_pool(x: jax.Array, r: int) -> jax.Array:
    """Channels-last average pool, kernel = stride = r, VALID (floor).

    Matches ``F.avg_pool{2,3}d(x, r, r)`` on the pooled extents.
    """
    nd = x.ndim - 2
    window = (1,) + (r,) * nd + (1,)
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, window, window, "VALID"
    )
    return (summed / float(r**nd)).astype(x.dtype)


def _window_split(x: jax.Array, pool: Sequence[int]) -> jax.Array:
    """(B, *sp, C) -> (B, *sp//pool, prod(pool), C), row-major window scan
    (same order torch's pooling scans a window, so argmax tie-breaking
    matches MaxPool's returned indices)."""
    B, C = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    nd = len(pool)
    shape = [B]
    for s, p in zip(sp, pool):
        assert s % p == 0, (sp, pool)
        shape += [s // p, p]
    shape.append(C)
    x = x.reshape(shape)
    perm = (
        [0]
        + [1 + 2 * i for i in range(nd)]
        + [2 + 2 * i for i in range(nd)]
        + [1 + 2 * nd]
    )
    x = jnp.transpose(x, perm)
    out_sp = [s // p for s, p in zip(sp, pool)]
    return x.reshape(B, *out_sp, math.prod(pool), C)


def _window_merge(x: jax.Array, pool: Sequence[int]) -> jax.Array:
    """Inverse of :func:`_window_split`: (B, *sp2, P, C) -> (B, *sp, C)."""
    B, C = x.shape[0], x.shape[-1]
    sp2 = x.shape[1:-2]
    nd = len(pool)
    x = x.reshape(B, *sp2, *pool, C)
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm.append(1 + 2 * nd)
    x = jnp.transpose(x, perm)
    out_sp = [s * p for s, p in zip(sp2, pool)]
    return x.reshape(B, *out_sp, C)


def max_pool_with_argmax(x: jax.Array, pool: Sequence[int]):
    """Max pool returning per-window argmax (first-max, like torch).

    Returns (pooled (B, *sp2, C), argmax int32 (B, *sp2, C) in [0, prod(pool))).
    """
    w = _window_split(x, pool)  # (B, *sp2, P, C)
    pooled = jnp.max(w, axis=-2)
    arg = jnp.argmax(w, axis=-2).astype(jnp.int32)
    return pooled, arg


def max_unpool_scatter(
    values: jax.Array, argmax: jax.Array, pool: Sequence[int]
) -> jax.Array:
    """Scatter ``values`` (B, *sp2, C) back to (B, *sp, C) at the positions in
    ``argmax`` (B, *sp2, Ci) with zeros elsewhere. ``C`` may be a multiple of
    ``Ci`` — index channels repeat (the reference duplicates indices for its
    channel-doubled output, ``NexToU_Encoder_Decoder.py:536``)."""
    P = math.prod(pool)
    C = values.shape[-1]
    Ci = argmax.shape[-1]
    assert C % Ci == 0, (C, Ci)
    if C != Ci:
        argmax = jnp.tile(argmax, C // Ci)
    onehot = jax.nn.one_hot(argmax, P, dtype=values.dtype, axis=-2)  # (..., P, C)
    return _window_merge(values[..., None, :] * onehot, pool)


class MRConv(nn.Module):
    """Max-Relative graph conv on node tensors (B, N, C).

    Accepts either neighbor indices (``nn_idx``, the XLA gather path) or a
    precomputed per-channel neighbor max (``max_neighbors``, the fused Pallas
    path) — the two are equivalent because
    ``max_j(x_j - x_i) = (max_j x_j) - x_i``.
    """

    out_features: int
    act_name: str = "relu"
    norm: str | None = None
    use_bias: bool = True
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        nn_idx: jax.Array | None = None,
        y: jax.Array | None = None,
        *,
        max_neighbors: jax.Array | None = None,
        train: bool,
    ) -> jax.Array:
        B, N, C = x.shape
        if max_neighbors is not None:
            maxrel = max_neighbors - x
        else:
            x_j = batched_index_select(x if y is None else y, nn_idx)
            maxrel = jnp.max(x_j - x[:, :, None, :], axis=2)
        # interleave [x_0, m_0, x_1, m_1, ...] (reference :409)
        h = jnp.stack([x, maxrel], axis=-1).reshape(B, N, 2 * C)
        return GroupedMLP(
            channels=(2 * C, self.out_features),
            act_name=self.act_name,
            norm=self.norm,
            use_bias=self.use_bias,
            groups=self.groups,
            dtype=self.dtype,
            name="nn",
        )(h, train=train)


def _mrconv_aggregate(mod, x_nodes, y_nodes, relative_pos, train):
    """Shared Dy/Pool graph-conv body: build the kNN graph and apply MRConv.

    Uses the fused Pallas kNN+max kernel when exact (dilation == 1 — always
    true for <= 8-stage NexToU configs; the stochastic shuffle is a no-op
    there because MRConv's max is permutation-invariant). Falls back to the
    XLA top_k + gather path otherwise.
    """
    from nextou_tpu.kernels import knn_max_neighbors

    # Cast nodes to the module compute dtype BEFORE the kNN. The grapher's
    # fc1 BatchNorm emits f32 regardless of model dtype (layers.py::make_norm)
    # and every downstream matmul casts to `dtype` anyway; doing it here (a)
    # approximates the torch reference under AMP — autocast downcasts only
    # the inner-product matmul to fp16 while F.normalize and the
    # sum-of-squares terms stay fp32 on the BN output (torch_edge.py under
    # no_grad inside the autocast region), so quantizing the features
    # themselves to bf16 is slightly coarser; selection can differ from the
    # AMP reference at tie-gap-level noise only, and the fused/fallback
    # paths stay mutually consistent — and (b) keeps the fused kernel's
    # neighbor gather on the exact 1-pass bf16 path — f32 values force a
    # 6-pass HIGHEST gather that costs ~50 ms/step across the flagship
    # model (PERF.md).
    if mod.dtype is not None:
        x_nodes = x_nodes.astype(mod.dtype)
        if y_nodes is not None:
            y_nodes = y_nodes.astype(mod.dtype)

    mrconv = MRConv(
        out_features=mod.out_features,
        act_name=mod.act_name,
        norm=mod.norm,
        use_bias=mod.use_bias,
        groups=mod.groups,
        dtype=mod.dtype,
        name="gconv",
    )
    if mod.fused and mod.dilation == 1:
        maxy = knn_max_neighbors(
            x_nodes, mod.k, y=y_nodes, relative_pos=relative_pos, train=train
        )
        return mrconv(x_nodes, None, y_nodes, max_neighbors=maxy, train=train)

    use_stoch = mod.stochastic and train and mod.dilation > 1
    rng = mod.make_rng("graph") if use_stoch else None
    nn_idx = dilated_knn_graph(
        x_nodes,
        mod.k,
        dilation=mod.dilation,
        y=y_nodes,
        relative_pos=relative_pos,
        stochastic=use_stoch,
        epsilon=mod.epsilon,
        rng=rng,
    )
    return mrconv(x_nodes, nn_idx, y_nodes, train=train)


class DyGraphConv(nn.Module):
    """Dynamic-graph MRConv over a channels-last spatial map."""

    out_features: int
    k: int = 9
    dilation: int = 1
    reduce_ratio: int = 1
    act_name: str = "relu"
    norm: str | None = None
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    groups: int = 1
    fused: bool = True  # fused Pallas kNN+max path (exact when dilation == 1)
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, relative_pos: jax.Array | None = None, *, train: bool
    ) -> jax.Array:
        B, C = x.shape[0], x.shape[-1]
        sp = x.shape[1:-1]
        n = math.prod(sp)
        x_nodes = x.reshape(B, n, C)
        y_nodes = None
        if self.reduce_ratio > 1:
            y_nodes = avg_pool(x, self.reduce_ratio).reshape(B, -1, C)
        out = _mrconv_aggregate(self, x_nodes, y_nodes, relative_pos, train)
        return out.reshape(B, *sp, self.out_features)


class PoolDyGraphConv(nn.Module):
    """DyGraphConv over a max-pooled node set, with unpool scatter-back.

    ``pool_size`` comes from the shape program (2 per even axis iff the map
    has more than ``4**d * prod(bottleneck)`` voxels, reference ``:490-502``).
    """

    out_features: int
    pool_size: Sequence[int]
    k: int = 9
    dilation: int = 1
    reduce_ratio: int = 1
    act_name: str = "relu"
    norm: str | None = None
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    groups: int = 1
    fused: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, relative_pos: jax.Array | None = None, *, train: bool
    ) -> jax.Array:
        B, C = x.shape[0], x.shape[-1]
        pool = tuple(self.pool_size)
        pooled, arg = max_pool_with_argmax(x, pool)
        sp2 = pooled.shape[1:-1]
        n = math.prod(sp2)
        x_nodes = pooled.reshape(B, n, C)
        y_nodes = None
        if self.reduce_ratio > 1:
            y_nodes = avg_pool(pooled, self.reduce_ratio).reshape(B, -1, C)
        out = _mrconv_aggregate(self, x_nodes, y_nodes, relative_pos, train)
        out = out.reshape(B, *sp2, self.out_features)
        return max_unpool_scatter(out, arg, pool)
