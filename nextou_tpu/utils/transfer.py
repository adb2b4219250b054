"""Host -> device transfer of model variables, tuned for slow links.

Through the tunneled TPU on this box (~40 MB/s) the flagship's variables are
~268 MB — several minutes of cold-start dead time per process (bench,
serving). Two lossless reductions:

- **bf16 pre-cast of compute kernels.** Every ``kernel`` param is cast to
  the compute dtype *inside* the model before use (``nn/layers.py``:
  ``FoldedConv``/``GroupedDense``/``ShuffleConvTranspose`` all do
  ``kernel.astype(dt)``); ``bf16(bf16(w)) == bf16(w)``, so shipping the
  bf16-rounded kernel is bit-identical on the bf16 compute path while
  halving the bytes. Biases/norm affines/batch stats are consumed in f32
  adds and stay f32 (tiny anyway).

- **Dedup of aliased host buffers.** The rel-pos constants come from the
  ``lru_cache``'d :func:`nextou_tpu.core.pos_embed.relative_pos_bias`, so
  encoder/decoder stages with the same (C, N, N_reduced, dims) hold the
  *same* NumPy array (flagship: the two 57.8 MB (10752, 1344) tables, plus
  smaller pairs). A plain ``jax.device_put`` over the pytree uploads each
  leaf separately; memoizing on ``id(host_buffer)`` uploads once and lets
  both leaves reference one device array (read-only at apply time).

``tests/test_model.py::test_device_put_variables_exact`` asserts bitwise
equality of the forward pass against the unoptimized transfer.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.tree_util as jtu


def _leaf_name(path) -> str:
    k = path[-1]
    return str(getattr(k, "key", k))


def device_put_variables(
    variables: Any,
    compute_dtype: Any = None,
    device: Any = None,
) -> Any:
    """Transfer a flax variables pytree with dedup + bf16 kernel pre-cast.

    Args:
        variables: the {'params', 'constants', 'batch_stats', ...} pytree
            (host-side leaves; device leaves pass through ``device_put``).
        compute_dtype: the model's compute dtype. When it is a sub-f32
            dtype (bf16/f16), ``kernel`` leaves under 'params' are
            pre-rounded to it host-side — bit-identical to the in-model
            cast. ``None``/float32 disables the cast (pure dedup).
        device: forwarded to ``jax.device_put`` (a Device or Sharding);
            ``None`` = default device.

    Returns:
        The same pytree with device arrays; aliased inputs stay aliased.
    """
    cast = None
    if compute_dtype is not None and np.dtype(compute_dtype).itemsize < 4:
        cast = compute_dtype
    memo: dict[tuple[int, bool], jax.Array] = {}

    flat, treedef = jtu.tree_flatten_with_path(variables)
    out = []
    for path, leaf in flat:
        col = str(getattr(path[0], "key", path[0])) if path else ""
        do_cast = cast is not None and col == "params" and _leaf_name(path) == "kernel"
        key = (id(leaf), do_cast)
        if key not in memo:
            host = leaf
            if do_cast:
                host = np.asarray(host).astype(cast)
            memo[key] = jax.device_put(host, device)
        out.append(memo[key])
    return jtu.tree_unflatten(treedef, out)


def transfer_bytes(variables: Any) -> tuple[int, int]:
    """(naive, deduped+cast-to-bf16-kernels) byte counts — for init logs."""
    flat = jtu.tree_flatten_with_path(variables)[0]
    naive = sum(l.size * l.dtype.itemsize for _, l in flat)
    seen: set[int] = set()
    opt = 0
    for path, l in flat:
        if id(l) in seen:
            continue
        seen.add(id(l))
        col = str(getattr(path[0], "key", path[0])) if path else ""
        itemsize = l.dtype.itemsize
        if col == "params" and _leaf_name(path) == "kernel" and itemsize == 4:
            itemsize = 2
        opt += l.size * itemsize
    return naive, opt
