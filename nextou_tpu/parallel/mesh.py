"""Device mesh and sharding utilities.

The reference's only parallelism is data-parallel DDP with NCCL gradient
all-reduce and an all-reduced batch-Dice (SURVEY.md §2.4). The TPU-native
equivalent: a 1-D (or 2-D) ``jax.sharding.Mesh`` over ICI, batch sharded on
the 'data' axis, parameters replicated; XLA inserts the gradient psums from
the sharded ``jit`` automatically — there is no hand-written collective.

Scaling beyond pure DP (not present in the reference) is future-proofed via
the optional 'model' mesh axis: conv channels are sharding-agnostic here, and
``with_sharding_constraint`` hooks can pin activations if a config wants
tensor-style sharding of the widest stages.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """1-D or 2-D mesh: ('data',) or ('data', 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    if n_model == 1:
        return Mesh(dev[:, 0], ("data",))
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put a host pytree with the batch axis sharded over 'data'.

    Single-process: a plain sharded ``device_put``. Multi-process (pod): the
    input is this process's *local* share of the global batch
    (``parallel.distributed.local_share`` examples per host) and the global
    array is assembled from the per-process shards without any cross-host
    data movement (``jax.make_array_from_process_local_data``).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)
        ),
        tree,
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh (every process must hold the
    same host values — true for the seed-deterministic param init)."""
    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)
        ),
        tree,
    )
