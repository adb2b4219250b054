"""Train state: params + batch stats + constants + optimizer state + RNG."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
import flax.linen as nn


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    constants: Any  # fixed relative-pos tables (non-trainable)
    opt_state: Any
    rng: jax.Array

    def model_variables(self) -> dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.constants:
            v["constants"] = self.constants
        return v


def create_train_state(
    model: nn.Module,
    optimizer: optax.GradientTransformation,
    example_input: jax.Array,
    rng: jax.Array,
) -> TrainState:
    from nextou_tpu.utils.init import fast_init

    if isinstance(rng, int):
        # host-only cold start: no device key creation / D2H fetch during
        # init (the tunneled TPU's first fetch can stall minutes)
        variables = fast_init(model, rng, example_input, train=False)
        state_rng = jax.random.PRNGKey(rng + 1)
    else:
        init_rng, state_rng = jax.random.split(rng)
        variables = fast_init(
            model,
            {"params": init_rng, "dropout": init_rng, "graph": init_rng},
            example_input,
            train=False,
        )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=optimizer.init(params),
        rng=state_rng,
    )
