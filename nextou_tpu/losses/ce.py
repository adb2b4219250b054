"""Cross-entropy loss (channels-last, integer targets).

Equivalent of nnU-Net's ``RobustCrossEntropyLoss`` (a plain torch CE that
squeezes the (B,1,...) target). Mean over non-ignored voxels, torch semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_elementwise(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Per-voxel CE. logits (B, *sp, C), target (B, *sp) int -> (B, *sp) f32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(target, 0, logits.shape[-1] - 1)
    picked = jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)
    return -picked[..., 0]


def cross_entropy_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    ignore_index: int | None = None,
) -> jax.Array:
    ce = cross_entropy_elementwise(logits, target)
    if ignore_index is None:
        return jnp.mean(ce)
    mask = (target != ignore_index).astype(jnp.float32)
    total = jnp.sum(mask)
    return jnp.sum(ce * mask) / jnp.clip(total, min=1.0)
