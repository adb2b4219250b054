"""Deep supervision: weighting and target downsampling.

Weights follow the reference trainers (``nnUNetTrainer_NexToU_BTI_Synapse.py:
23-27``): ``w_i = 1/2^i``, the lowest-resolution output gets weight 0, then
normalized to sum 1. Targets are downsampled by nearest-neighbor (strided
slicing — identical to torch 'nearest' for integer factors).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def deep_supervision_weights(n_outputs: int) -> np.ndarray:
    if n_outputs == 1:
        # deep supervision disabled (single full-res output): the reference
        # trainer skips the wrapper entirely; zeroing-the-last would be 0/0
        return np.array([1.0])
    w = np.array([1.0 / 2**i for i in range(n_outputs)])
    w[-1] = 0.0
    return w / w.sum()


def downsample_target(target: jax.Array, out_spatial: Sequence[int]) -> jax.Array:
    """(B, *sp) int -> (B, *out_spatial) via strided nearest sampling."""
    sp = target.shape[1:]
    if tuple(sp) == tuple(out_spatial):
        return target
    idx = (slice(None),)
    for s, o in zip(sp, out_spatial):
        assert s % o == 0, (sp, out_spatial)
        idx = idx + (slice(None, None, s // o),)
    return target[idx]


def deep_supervised_loss(
    outputs: Sequence[jax.Array],
    target: jax.Array,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    weights: Sequence[float] | None = None,
    channels_last: bool = True,
) -> jax.Array:
    """Weighted sum of ``loss_fn`` over the DS pyramid. Zero-weight entries
    are skipped entirely (the reference computes then multiplies by 0)."""
    if weights is None:
        weights = deep_supervision_weights(len(outputs))
    total = jnp.zeros((), jnp.float32)
    for w, out in zip(weights, outputs):
        if float(w) == 0.0:
            continue
        out_sp = out.shape[1:-1] if channels_last else out.shape[2:]
        tgt = downsample_target(target, out_sp)
        total = total + float(w) * loss_fn(out, tgt)
    return total
