"""Multi-host (multi-process) initialization for pod-scale training.

The reference's DDP is single-host multi-GPU via ``torch.distributed``
(SURVEY.md §2.4); its TPU-pod analog is one Python process per host, all
running the same SPMD program over a global mesh. JAX needs exactly one
extra step for that — ``jax.distributed.initialize`` — after which
``jax.devices()`` is global, every ``Mesh`` spans the pod, and the sharded
``jit`` train step is unchanged (XLA routes the gradient/batch-Dice psums
over ICI within a slice and DCN across slices).

Launch path on a v5e pod (one process per host; TPU auto-detects the
coordinator from the TPU metadata, so no arguments are needed)::

    # on every host of the pod slice, e.g. via gcloud alpha compute tpus
    # tpu-vm ssh --worker=all:
    NEXTOU_DISTRIBUTED=1 python -m nextou_tpu.run_training DATASET CONFIG 0

For non-TPU backends (tests, CPU rehearsal) pass the coordinator explicitly
via env: ``NEXTOU_COORDINATOR=host:port NEXTOU_NUM_PROCESSES=N
NEXTOU_PROCESS_ID=i`` (or call :func:`initialize_distributed` with
arguments). Each process then feeds its *process-local* share of the global
batch; ``parallel.mesh.shard_batch`` assembles the global array from the
local shards (``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def distributed_requested() -> bool:
    """True when the launch environment asks for multi-process init."""
    return (
        os.environ.get("NEXTOU_DISTRIBUTED", "0") == "1"
        or "NEXTOU_COORDINATOR" in os.environ
    )


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> tuple[int, int]:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Arguments default to the ``NEXTOU_COORDINATOR`` / ``NEXTOU_NUM_PROCESSES``
    / ``NEXTOU_PROCESS_ID`` env vars; with none set (a TPU pod) JAX
    auto-detects everything from the TPU metadata. Must run before the first
    backend touch. Returns ``(process_index, process_count)``.
    """
    global _initialized
    if not _initialized:
        coordinator_address = coordinator_address or os.environ.get(
            "NEXTOU_COORDINATOR"
        )
        if num_processes is None and "NEXTOU_NUM_PROCESSES" in os.environ:
            num_processes = int(os.environ["NEXTOU_NUM_PROCESSES"])
        if process_id is None and "NEXTOU_PROCESS_ID" in os.environ:
            process_id = int(os.environ["NEXTOU_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _initialized = True
    return jax.process_index(), jax.process_count()


def local_share(global_batch: int) -> int:
    """This process's share of the global batch (loaders produce this many).

    The global batch must divide evenly — uneven host shards would deadlock
    the SPMD collectives (every process must dispatch the same program).
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{n} processes"
        )
    return global_batch // n
