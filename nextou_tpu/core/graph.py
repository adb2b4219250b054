"""Dense kNN graph construction, TPU-first.

Functional equivalents of the reference's graph layer
(``/root/reference/network_architecture/torch_edge.py``), re-designed for XLA:

- everything is static-shape and jit-able; the distance matrix is a single
  MXU matmul (the reference's 10000-row chunking, ``torch_edge.py:70-82``, is a
  CUDA memory workaround that XLA does not need at these sizes — for very large
  N the Pallas kernel in ``nextou_tpu.kernels`` tiles rows through VMEM, which
  plays the same role as the chunking),
- neighbor selection is ``jax.lax.top_k`` over the negated distances,
- stochastic dilated sampling (``torch_edge.py:113-136``) becomes an explicit
  ``jax.random`` key + ``lax.cond``.

Layout note: node features are channels-last ``(B, N, C)`` (the reference uses
``(B, C, N, 1)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis`` (matches ``F.normalize(p=2)`` semantics,
    reference ``torch_edge.py:154-160``: norm clamped below by eps).

    The clamp lives INSIDE the sqrt: ``sqrt(max(ss, eps^2))`` equals
    ``max(sqrt(ss), eps)`` exactly, but its gradient is zero (not NaN) for
    all-zero vectors — ``d sqrt/d ss`` is infinite at 0 and ``inf * 0``
    poisons the whole gradient otherwise."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / n


def pairwise_sq_dist(x: jax.Array) -> jax.Array:
    """Squared L2 distance matrix of a point set.

    Args:
        x: ``(B, N, C)`` node features.
    Returns:
        ``(B, N, N)`` squared distances (reference ``torch_edge.py:12-23``).
    """
    # square-sums accumulate in f32 even for bf16 coordinates (bf16
    # accumulation over C terms adds per-ROW noise that shifts the argmin
    # ordering via the candidate term; see kernels/knn.py::_coord_dtype)
    sq = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True
    )  # (B, N, 1)
    inner = jnp.einsum(
        "bnc,bmc->bnm", x, x, preferred_element_type=jnp.float32
    )
    return sq - 2.0 * inner + jnp.swapaxes(sq, -1, -2)


def xy_pairwise_sq_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Cross-set squared L2 distances.

    Args:
        x: ``(B, N, C)`` query nodes.
        y: ``(B, M, C)`` candidate nodes.
    Returns:
        ``(B, N, M)`` (reference ``torch_edge.py:42-55``).
    """
    # f32-accumulated square-sums (see pairwise_sq_dist)
    x_sq = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True
    )  # (B, N, 1)
    y_sq = jnp.sum(
        jnp.square(y.astype(jnp.float32)), axis=-1, keepdims=True
    )  # (B, M, 1)
    inner = jnp.einsum(
        "bnc,bmc->bnm", x, y, preferred_element_type=jnp.float32
    )
    return x_sq - 2.0 * inner + jnp.swapaxes(y_sq, -1, -2)


def dense_knn(
    x: jax.Array,
    k: int,
    y: jax.Array | None = None,
    relative_pos: jax.Array | None = None,
) -> jax.Array:
    """Top-k nearest neighbors under (biased) squared L2 distance.

    The features are expected to be *already normalized* if normalization is
    desired (see :func:`dilated_knn_graph`). ``relative_pos`` is an additive
    bias on the distances before selection (the reference stores the negated
    position Gram matrix so that spatially-close nodes get *smaller* distance;
    ``torch_edge.py:78-79,86``).

    Args:
        x: ``(B, N, C)`` query nodes.
        k: number of neighbors.
        y: optional ``(B, M, C)`` candidate set; defaults to ``x``.
        relative_pos: optional ``(N, M)`` or ``(B, N, M)`` additive distance bias.
    Returns:
        ``nn_idx``: ``(B, N, k)`` int32 indices into the candidate set.
    """
    x = jax.lax.stop_gradient(x)
    if y is None:
        dist = pairwise_sq_dist(x)
    else:
        y = jax.lax.stop_gradient(y)
        dist = xy_pairwise_sq_dist(x, y)
    if relative_pos is not None:
        dist = dist + relative_pos
    # topk(-dist): ties broken by lowest index, like torch.topk on equal keys.
    _, nn_idx = jax.lax.top_k(-dist, k)
    return nn_idx.astype(jnp.int32)


def dilated_knn_graph(
    x: jax.Array,
    k: int,
    dilation: int = 1,
    y: jax.Array | None = None,
    relative_pos: jax.Array | None = None,
    *,
    stochastic: bool = False,
    epsilon: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """L2-normalize features, take ``k * dilation`` nearest neighbors, then
    keep every ``dilation``-th — or, stochastically with probability
    ``epsilon`` (training only), a random size-``k`` subset of the candidates.

    Mirrors ``DenseDilatedKnnGraph`` + ``DenseDilated``
    (reference ``torch_edge.py:113-163``). One Bernoulli draw gates the whole
    call (all batch entries shuffle together), as in the reference
    (``torch_edge.py:128``).

    Note: when ``dilation == 1`` the stochastic branch permutes the *full*
    neighbor set, which is a no-op for any permutation-invariant aggregator
    (NexToU's MRConv takes a max over neighbors) — so it is skipped entirely.

    Returns:
        ``(B, N, k)`` int32 neighbor indices.
    """
    # normalize (and measure distances) in f32 regardless of the model
    # dtype: the fused Pallas kernel and knn_max_neighbors_reference both
    # select neighbors on f32-normalized features (kernels/knn.py:151,170),
    # and bf16 rounding here could flip near-tied top-k picks between the
    # fallback and fused paths
    x = _l2_normalize(x.astype(jnp.float32), axis=-1)
    if y is not None:
        y = _l2_normalize(y.astype(jnp.float32), axis=-1)
    nn_idx = dense_knn(x, k * dilation, y=y, relative_pos=relative_pos)
    if dilation <= 1:
        return nn_idx
    if stochastic and epsilon > 0.0:
        if rng is None:
            raise ValueError("stochastic dilated kNN requires an rng key")
        k_gate, k_perm = jax.random.split(rng)
        shuffle = jax.random.uniform(k_gate, ()) < epsilon
        perm_cols = jax.random.permutation(k_perm, k * dilation)[:k]
        dil_cols = jnp.arange(0, k * dilation, dilation)
        cols = jnp.where(shuffle, perm_cols, dil_cols)
        return jnp.take(nn_idx, cols, axis=-1)
    return nn_idx[..., ::dilation]


def batched_index_select(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbor features.

    Args:
        x: ``(B, M, C)`` node features.
        idx: ``(B, N, k)`` int indices into the M axis.
    Returns:
        ``(B, N, k, C)`` gathered features (reference ``torch_nn.py:94-115``,
        transposed to channels-last).
    """
    B, N, k = idx.shape
    C = x.shape[-1]
    flat = idx.reshape(B, N * k)
    out = jnp.take_along_axis(x, flat[..., None], axis=1)  # (B, N*k, C)
    return out.reshape(B, N, k, C)
