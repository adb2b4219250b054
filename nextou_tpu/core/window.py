"""Window partition / reverse for the Swin-style local GNN.

Channels-last equivalents of the reference's einops rearranges
(``/root/reference/network_architecture/NexToU_Encoder_Decoder.py:634-693``).
On TPU these are pure reshape+transpose, which XLA fuses into surrounding ops.

Shapes (3D): ``(B, S, H, W, C)`` <-> ``(B * nW, ws, hs, ws_w, C)`` where the
window grid is laid out batch-major ``(b, s_blk, h_blk, w_blk)``, matching the
reference's ``(b s h w)`` flattening order.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def window_partition(x: jax.Array, window_size: Sequence[int]) -> jax.Array:
    """Split a channels-last spatial map into non-overlapping windows.

    Args:
        x: ``(B, *spatial, C)`` with ``len(spatial) == len(window_size)``.
        window_size: per-axis window extents; must divide the spatial dims.
    Returns:
        ``(B * num_windows, *window_size, C)``.
    """
    spatial = x.shape[1:-1]
    B, C = x.shape[0], x.shape[-1]
    ndim = len(window_size)
    assert len(spatial) == ndim, (spatial, window_size)
    blocks = []
    shape = [B]
    for s, w in zip(spatial, window_size):
        assert s % w == 0, f"window {window_size} must divide spatial {spatial}"
        blocks.append(s // w)
        shape += [s // w, w]
    shape.append(C)
    x = x.reshape(shape)  # (B, n1, w1, n2, w2, ..., C)
    # -> (B, n1, n2, ..., w1, w2, ..., C)
    perm = (
        [0]
        + [1 + 2 * i for i in range(ndim)]
        + [2 + 2 * i for i in range(ndim)]
        + [1 + 2 * ndim]
    )
    x = jnp.transpose(x, perm)
    num_windows = 1
    for b in blocks:
        num_windows *= b
    return x.reshape((B * num_windows, *window_size, C))


def window_reverse(
    windows: jax.Array, window_size: Sequence[int], spatial: Sequence[int]
) -> jax.Array:
    """Inverse of :func:`window_partition`.

    Args:
        windows: ``(B * num_windows, *window_size, C)``.
        window_size: per-axis window extents.
        spatial: original spatial shape.
    Returns:
        ``(B, *spatial, C)``.
    """
    ndim = len(window_size)
    C = windows.shape[-1]
    blocks = [s // w for s, w in zip(spatial, window_size)]
    num_windows = 1
    for b in blocks:
        num_windows *= b
    B = windows.shape[0] // num_windows
    x = windows.reshape((B, *blocks, *window_size, C))
    # (B, n1, ..., nd, w1, ..., wd, C) -> (B, n1, w1, n2, w2, ..., C)
    perm = [0]
    for i in range(ndim):
        perm += [1 + i, 1 + ndim + i]
    perm.append(1 + 2 * ndim)
    x = jnp.transpose(x, perm)
    return x.reshape((B, *spatial, C))
