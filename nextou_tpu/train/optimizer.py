"""Optimizer and LR schedule: SGD(momentum 0.99, nesterov) + PolyLR.

Matches the nnU-Net v2 substrate the reference trains with (SURVEY.md §3.1):
initial LR 1e-2, weight decay 3e-5 (coupled, torch-SGD style: added to the
gradient before the momentum update), gradient clipping at global-norm 12,
``lr(e) = lr0 * (1 - e/E)^0.9`` stepped per epoch.
"""

from __future__ import annotations

import optax


def poly_lr(
    initial_lr: float = 1e-2,
    max_steps: int = 1000,
    exponent: float = 0.9,
    steps_per_epoch: int = 1,
) -> optax.Schedule:
    """PolyLR keyed on epoch (= step // steps_per_epoch), like nnU-Net."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // steps_per_epoch
        # clamp at 0: training past max_steps must not produce a negative
        # base (fractional power of a negative is NaN)
        frac = jnp.maximum(1.0 - epoch / max_steps, 0.0)
        return initial_lr * (frac**exponent)

    return schedule


def make_optimizer(
    learning_rate: float | optax.Schedule = 1e-2,
    *,
    momentum: float = 0.99,
    nesterov: bool = True,
    weight_decay: float = 3e-5,
    clip_norm: float = 12.0,
) -> optax.GradientTransformation:
    parts = []
    if clip_norm is not None and clip_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        # torch-SGD coupled decay: grad += wd * param, before momentum
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)
