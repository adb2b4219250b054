"""Memory-efficient soft Dice loss (channels-last).

Equivalent of nnU-Net's ``MemoryEfficientSoftDiceLoss`` with the settings the
reference trainers use (``nnUNetTrainer_NexToU_BTI_Synapse.py:49``:
batch_dice per-plans, smooth=1e-5, do_bg=False, ddp all-reduced stats). Under
a sharded ``jit`` the batch-axis sums are global automatically; ``axis_name``
is for explicit-collective contexts (shard_map/pmap), where the tp/fp/fn
statistics are ``psum``-ed — the reference's only collective (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_dice_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    batch_dice: bool = False,
    do_bg: bool = False,
    smooth: float = 1e-5,
    loss_mask: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """Soft Dice on softmax probabilities.

    Args:
        logits: ``(B, *spatial, C)`` raw scores.
        target: ``(B, *spatial)`` integer labels.
        loss_mask: optional ``(B, *spatial)`` {0,1} mask (ignore-label support).
    Returns:
        scalar loss = ``-mean(dice)``.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)[..., None]
        probs = probs * m
        onehot = onehot * m
    if not do_bg:
        probs = probs[..., 1:]
        onehot = onehot[..., 1:]

    spatial_axes = tuple(range(1, logits.ndim - 1))
    intersect = jnp.sum(probs * onehot, axis=spatial_axes)  # (B, C')
    sum_pred = jnp.sum(probs, axis=spatial_axes)
    sum_gt = jnp.sum(onehot, axis=spatial_axes)

    if axis_name is not None:
        intersect = jax.lax.psum(intersect, axis_name)
        sum_pred = jax.lax.psum(sum_pred, axis_name)
        sum_gt = jax.lax.psum(sum_gt, axis_name)

    if batch_dice:
        intersect = jnp.sum(intersect, axis=0)
        sum_pred = jnp.sum(sum_pred, axis=0)
        sum_gt = jnp.sum(sum_gt, axis=0)

    dc = (2.0 * intersect + smooth) / jnp.clip(
        sum_gt + sum_pred + smooth, min=1e-8
    )
    return -jnp.mean(dc)
