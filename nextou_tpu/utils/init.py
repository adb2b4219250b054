"""Fast model initialization without tracing a compiled init program.

``flax``'s default jitted ``Module.init`` embeds every freshly-sampled
parameter as a program constant, which makes XLA constant-fold the entire
forward pass at compile time — minutes of single-threaded compile for a large
model, for work that happens once. ``fast_init`` instead:

1. runs ``jax.eval_shape(model.init, ...)`` — pure abstract tracing, no
   compile, no execution — to get the full variable tree structure, then
2. materializes every leaf on the host by rule:
   - ``kernel``: He-normal, std = sqrt(2/(1+1e-2^2)/fan_in) (the reference's
     ``InitWeights_He(1e-2)``, ``nnUNetTrainer_NexToU.py:88``), with fan-in
     derived from the kernel rank (dense / grouped / conv),
   - ``bias`` -> 0, ``scale`` -> 1 (0 under a ``norm2`` residual-block
     norm), BatchNorm ``mean``/``var`` -> 0/1,
   - ``constants/relative_pos_c{C}_d{D}`` -> recomputed from the metadata in
     the name plus the leaf shape (see ``nn.graphers._rel_pos_constant``).

Parameter values are deterministic in (seed, tree order).
"""

from __future__ import annotations

import math
import re
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from nextou_tpu.nn.layers import HE_GAIN_SQ

_STATE = threading.local()

_REL_POS_RE = re.compile(r"^relative_pos_c(\d+)_d(\d+)$")


def shape_only() -> bool:
    return getattr(_STATE, "shape_only", False)


def _he_std(shape) -> float:
    if len(shape) == 2:  # Dense (cin, cout)
        fan_in = shape[0]
    elif len(shape) == 3:  # GroupedDense (g, ci, co)
        fan_in = shape[1]
    else:  # Conv / ConvTranspose (*k, cin, cout)
        fan_in = math.prod(shape[:-1])
    return (HE_GAIN_SQ / fan_in) ** 0.5


def _materialize_leaf(path, leaf, rng: np.random.Generator):
    name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
    collection = str(path[0].key if hasattr(path[0], "key") else path[0])
    shape, dtype = leaf.shape, leaf.dtype

    # NOTE: leaves are host numpy arrays — transfer to device happens in one
    # device_put of the whole tree (or lazily on first use), not one RPC per
    # parameter (matters when the accelerator is reached through a tunnel).
    m = _REL_POS_RE.match(name)
    if m is not None:
        from nextou_tpu.core.pos_embed import relative_pos_bias

        channels, dims = int(m.group(1)), int(m.group(2))
        return relative_pos_bias(channels, shape[0], shape[1], dims)

    if collection == "batch_stats":
        if name == "var":
            return np.ones(shape, dtype)
        return np.zeros(shape, dtype)

    if name == "kernel":
        parent = str(path[-2].key if hasattr(path[-2], "key") else path[-2])
        if "transpconv" in parent:
            # torch kaiming fan_in for ConvTranspose weights (Cin, Cout, *k)
            # is Cout*prod(k) — keep fast_init == the flax init path
            # (nn/layers.py::transp_conv_he_normal)
            fan_in = shape[-1] * math.prod(shape[:-2])
            return ((HE_GAIN_SQ / fan_in) ** 0.5
                    * rng.standard_normal(shape)).astype(dtype)
        return (_he_std(shape) * rng.standard_normal(shape)).astype(dtype)
    if name == "alpha":  # PReLU slope, reference act_layer default neg_slope
        return np.full(shape, 1e-2, dtype)
    if name in ("scale",):
        parent = str(path[-2].key if hasattr(path[-2], "key") else path[-2])
        if parent == "norm2":
            # residual blocks zero the last norm's scale before the add
            # (init_last_bn_before_add_to_0, nnUNetTrainer_NexToU.py:89);
            # make_norm asserts the name <-> zero-init pairing
            return np.zeros(shape, dtype)
        return np.ones(shape, dtype)
    if name in ("bias",):
        return np.zeros(shape, dtype)
    raise ValueError(f"no init rule for variable {'/'.join(map(str, path))}")


def fast_init(
    model: nn.Module, rngs, *args, seed: int | None = None, **kwargs
) -> dict[str, Any]:
    if isinstance(rngs, int):
        # Fully host-side path: the seed is the int, and the rng leaves fed to
        # eval_shape are numpy placeholders with PRNGKey's shape/dtype — no
        # device key is ever created or fetched. This matters on the tunneled
        # TPU, where the process's *first* device->host fetch has been
        # observed to stall 10-300 s (transport warm-up); with an int seed,
        # init touches the device zero times.
        seed = rngs if seed is None else seed
        rngs = {"params": np.zeros((2,), np.uint32)}
    if not isinstance(rngs, dict):
        rngs = {"params": rngs}
    rngs.setdefault("dropout", rngs["params"])
    rngs.setdefault("graph", rngs["params"])
    if seed is None:
        data = np.asarray(jax.random.key_data(rngs["params"])).ravel()
        seed = int(data[-1])
    _STATE.shape_only = True
    try:
        shapes = jax.eval_shape(
            lambda r, *a: model.init(r, *a, **kwargs), rngs, *args
        )
    finally:
        _STATE.shape_only = False
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map_with_path(
        lambda p, l: _materialize_leaf(p, l, rng), shapes
    )
