"""Cross-entropy loss (channels-last, integer targets).

Equivalent of nnU-Net's ``RobustCrossEntropyLoss`` (a plain torch CE that
squeezes the (B,1,...) target). Mean over non-ignored voxels, torch semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_elementwise(
    logits: jax.Array, target: jax.Array, channels_last: bool = True
) -> jax.Array:
    """Per-voxel CE. logits (B, *sp, C) — or (B, C, *sp) with
    ``channels_last=False`` — target (B, *sp) int -> (B, *sp) f32.

    Computed channel-major (B, C, V): a small class dim on the TPU lane axis
    pads C up to 128 (9x HBM for C=14 at flagship shapes); V-minor is ~free.
    """
    B = logits.shape[0]
    C = logits.shape[-1] if channels_last else logits.shape[1]
    sp = target.shape[1:]
    if channels_last:
        lcm = jnp.swapaxes(logits.reshape(B, -1, C), 1, 2).astype(jnp.float32)
    else:
        lcm = logits.reshape(B, C, -1).astype(jnp.float32)
    logp = jax.nn.log_softmax(lcm, axis=1)  # (B, C, V)
    tgt = jnp.clip(target.reshape(B, 1, -1), 0, C - 1).astype(jnp.int32)
    # Select the true-class log-prob DENSELY: an iota compare broadcast over
    # the class axis, fused by XLA into the reduction (and its backward into
    # a dense broadcast multiply). The gather form (take_along_axis) lowers
    # to scalar-unit gather/scatter fusions that measured ~195 ms/step at
    # flagship shapes in the round-4 train trace — ~100x this dense form.
    # C x V compares instead of V loads is the right trade for seg-scale C.
    cls = jnp.arange(C, dtype=jnp.int32).reshape(1, C, 1)
    picked = jnp.sum(jnp.where(tgt == cls, logp, 0.0), axis=1)  # (B, V)
    return -picked.reshape(B, *sp)


def cross_entropy_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    ignore_index: int | None = None,
    channels_last: bool = True,
) -> jax.Array:
    ce = cross_entropy_elementwise(logits, target, channels_last)
    if ignore_index is None:
        return jnp.mean(ce)
    mask = (target != ignore_index).astype(jnp.float32)
    total = jnp.sum(mask)
    return jnp.sum(ce * mask) / jnp.clip(total, min=1.0)
