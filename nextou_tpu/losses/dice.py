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
    channels_last: bool = True,
) -> jax.Array:
    """Soft Dice on softmax probabilities.

    Args:
        logits: ``(B, *spatial, C)`` raw scores — or ``(B, C, *spatial)``
            with ``channels_last=False`` (the training path's TPU-friendly
            channel-major layout).
        target: ``(B, *spatial)`` integer labels.
        loss_mask: optional ``(B, *spatial)`` {0,1} mask (ignore-label support).
    Returns:
        scalar loss = ``-mean(dice)``.
    """
    num_classes = logits.shape[-1] if channels_last else logits.shape[1]
    B = logits.shape[0]
    # memory-efficient statistics, computed CHANNEL-MAJOR:
    # - the one-hot target is an iota compare FUSED into the reductions
    #   (never materialized): intersect/sum_gt/sum_pred are dense masked
    #   sums over (B, C, V). The earlier gather + scatter-add-into-bins
    #   form lowered to scalar-unit fusions costing ~240 ms/step at
    #   flagship shapes (round-4 train trace); the dense compare-and-reduce
    #   is bandwidth-bound instead (~1 pass over probs);
    # - transpose to (B, C, V) before the f32 softmax: with the small class
    #   dim minor, TPU tiling pads C to the 128-lane width (a measured 9.1x
    #   HBM expansion for C=14 at flagship shapes — the difference between
    #   fitting batch 2 on a v5e chip or not); V-minor tiles pad ~1x.
    flat_t = target.reshape(B, 1, -1).astype(jnp.int32)  # (B, 1, V)
    if channels_last:
        logits_cm = jnp.swapaxes(
            logits.reshape(B, -1, num_classes), 1, 2
        ).astype(jnp.float32)  # (B, C, V)
    else:
        logits_cm = logits.reshape(B, num_classes, -1).astype(jnp.float32)
    probs = jax.nn.softmax(logits_cm, axis=1)
    cls = jnp.arange(num_classes, dtype=jnp.int32).reshape(1, -1, 1)
    onehot = (flat_t == cls).astype(jnp.float32)  # (B, C, V), fused
    if loss_mask is not None:
        # mask exactly ONE factor of each product (the reference's
        # MemoryEfficientSoftDiceLoss applies the mask once per term);
        # masking both would square a non-binary weighting in `intersect`
        m = loss_mask.reshape(B, 1, -1).astype(jnp.float32)
        onehot = onehot * m
        intersect = jnp.sum(probs * onehot, axis=2)  # (B, C)
        sum_gt = jnp.sum(onehot, axis=2)
        sum_pred = jnp.sum(probs * m, axis=2)
    else:
        intersect = jnp.sum(probs * onehot, axis=2)  # (B, C)
        sum_gt = jnp.sum(onehot, axis=2)
        sum_pred = jnp.sum(probs, axis=2)
    if not do_bg:
        intersect = intersect[:, 1:]
        sum_gt = sum_gt[:, 1:]
        sum_pred = sum_pred[:, 1:]

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


def region_soft_dice_loss(
    logits: jax.Array,
    target_regions: jax.Array,
    *,
    batch_dice: bool = False,
    smooth: float = 1e-5,
    loss_mask: jax.Array | None = None,
    axis_name: str | None = None,
    channels_last: bool = True,
) -> jax.Array:
    """Sigmoid (multi-label) soft Dice for region-based training.

    nnU-Net's region mode (dataset.json labels with list values +
    regions_class_order): one sigmoid channel per region, Dice on the
    binary region masks; there is no background channel.

    Args:
        logits: ``(B, *sp, R)`` (or ``(B, R, *sp)`` with
            ``channels_last=False``; ``target_regions`` matches the layout).
        target_regions: binary {0,1}, same layout as ``logits``.
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    tgt = target_regions.astype(jnp.float32)
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)
        m = m[..., None] if channels_last else m[:, None]
        probs = probs * m
        tgt = tgt * m
    spatial = (
        tuple(range(1, logits.ndim - 1))
        if channels_last
        else tuple(range(2, logits.ndim))
    )
    intersect = jnp.sum(probs * tgt, axis=spatial)
    sum_pred = jnp.sum(probs, axis=spatial)
    sum_gt = jnp.sum(tgt, axis=spatial)
    if axis_name is not None:
        intersect = jax.lax.psum(intersect, axis_name)
        sum_pred = jax.lax.psum(sum_pred, axis_name)
        sum_gt = jax.lax.psum(sum_gt, axis_name)
    if batch_dice:
        intersect = jnp.sum(intersect, axis=0)
        sum_pred = jnp.sum(sum_pred, axis=0)
        sum_gt = jnp.sum(sum_gt, axis=0)
    dice = (2.0 * intersect + smooth) / (sum_pred + sum_gt + smooth)
    return -jnp.mean(dice)
