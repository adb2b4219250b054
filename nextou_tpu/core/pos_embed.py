"""Sin-cos positional embeddings and relative-position Gram matrices (NumPy).

Host-side, construction-time only — the outputs become jit-time constants.
Reproduces the math of ``/root/reference/network_architecture/pos_embed.py``
(which itself follows the standard MAE/MoCo-v3 recipe), including the quirks
that matter for parity:

- 2D: ``embed_dim % 2 == 0`` with ``embed_dim//2`` even; grid built with
  ``meshgrid(w, h)`` ('xy' indexing, w varies first) — ``pos_embed.py:48-63``.
- 3D: ``embed_dim % 3 == 0`` with ``embed_dim//3`` even; grid built with
  ``meshgrid(d, w, h)`` — ``pos_embed.py:65-81``.
- relative form: ``2 * E @ E.T / embed_dim`` — ``pos_embed.py:29,39``.

The grapher modules store the *negated* relative matrix, bicubic-resized to
the actual (N, N_reduced) node counts (``NexToU_Encoder_Decoder.py:728-742``);
that assembly lives in :func:`relative_pos_bias`.
"""

from __future__ import annotations

import numpy as np

from nextou_tpu.core.resize import bicubic_resize_2d


def get_1d_sincos_pos_embed(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) [sin || cos] embedding."""
    assert embed_dim % 2 == 0, embed_dim
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size**2, embed_dim) embedding over a square 2D grid."""
    assert embed_dim % 2 == 0, embed_dim
    coords = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(coords, coords), axis=0)  # w first ('xy')
    embs = [get_1d_sincos_pos_embed(embed_dim // 2, grid[i]) for i in range(2)]
    return np.concatenate(embs, axis=1)


def get_3d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size**3, embed_dim) embedding over a cubic 3D grid."""
    assert embed_dim % 3 == 0, embed_dim
    coords = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(coords, coords, coords), axis=0)
    embs = [get_1d_sincos_pos_embed(embed_dim // 3, grid[i]) for i in range(3)]
    return np.concatenate(embs, axis=1)


def get_2d_relative_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    e = get_2d_sincos_pos_embed(embed_dim, grid_size)
    return 2.0 * (e @ e.T) / e.shape[1]


def get_3d_relative_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    e = get_3d_sincos_pos_embed(embed_dim, grid_size)
    return 2.0 * (e @ e.T) / e.shape[1]


import functools
import os


@functools.lru_cache(maxsize=64)
def relative_pos_bias(
    channels: int, n: int, n_reduced: int, spatial_dims: int
) -> np.ndarray:
    """The additive kNN distance bias used by the graphers.

    Builds the relative Gram matrix on the nearest integer grid
    (``int(n ** (1/d))``, truncated exactly as the reference does —
    ``NexToU_Encoder_Decoder.py:732,737``), bicubic-resizes it to
    ``(n, n_reduced)`` and negates (``:742``), so that spatially-close node
    pairs receive a *lower* effective distance during top-k selection.

    Compute is fp32 past the sin-cos stage (the reference casts to fp32
    before its bicubic interpolate too). Results are memoized in-process and
    on disk (encoder/decoder stages share identical tables; the big flagship
    tables cost ~10s each to build on one host core).

    Returns float32 ``(n, n_reduced)``.
    """
    cache_dir = os.environ.get(
        "NEXTOU_CACHE_DIR", os.path.expanduser("~/.cache/nextou_tpu")
    )
    cache_path = os.path.join(
        cache_dir, f"relpos_c{channels}_n{n}_r{n_reduced}_d{spatial_dims}.npy"
    )
    if os.path.exists(cache_path):
        try:
            return np.load(cache_path)
        except Exception:
            pass

    if spatial_dims == 2:
        grid = int(n ** (1.0 / 2.0))
        rel = get_2d_relative_pos_embed(channels, grid).astype(np.float32)
    elif spatial_dims == 3:
        grid = int(n ** (1.0 / 3.0))
        rel = get_3d_relative_pos_embed(channels, grid).astype(np.float32)
    else:
        raise ValueError(f"spatial_dims must be 2 or 3, got {spatial_dims}")
    rel = bicubic_resize_2d(rel, (n, n_reduced), dtype=np.float32)
    out = (-rel).astype(np.float32)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:  # np.save would append '.npy' to the name
            np.save(f, out)
        os.replace(tmp, cache_path)
    except OSError:
        pass
    return out
