"""Benchmark: flagship 3d_fullres_nextou forward throughput (patches/sec/chip).

Workload = the north-star metric's unit of work (BASELINE.json): one
sliding-window inference tile of 64x224x192 through the full NexToU
(3d_fullres_nextou architecture, 14 classes), bf16 compute, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is value / A100_REFERENCE_EST. The reference publishes no
throughput numbers (SURVEY.md §6); A100_REFERENCE_EST is a provisional
estimate of the PyTorch reference's fp16 forward throughput on A100 for the
same tile (to be replaced by a measured number when an A100 measurement of
the torch reference is available).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _log(msg):
    print(msg, file=sys.stderr, flush=True)

A100_REFERENCE_EST = 6.0  # patches/s, provisional (see module docstring)

BATCH = int(os.environ.get("NEXTOU_BENCH_BATCH", "2"))
WARMUP = 2
ITERS = 8


def main():
    from nextou_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init

    t0 = time.perf_counter()
    spec = flagship_3d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    x = jnp.zeros((BATCH, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    variables = fast_init(model, jax.random.PRNGKey(0), x, train=False)
    _log(f"init done in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)
    _log(f"device_put done in {time.perf_counter() - t0:.1f}s")

    from nextou_tpu.utils.timing import device_loop_time

    # in-device loop timing: wall-clocking repeated dispatches is unreliable
    # through tunneled PJRT transports (block_until_ready may not block)
    t0 = time.perf_counter()
    dt = device_loop_time(
        lambda x: model.apply(variables, x, train=False),
        x,
        n_small=1,
        n_large=9,
        repeats=2,
    )
    _log(f"measured in {time.perf_counter() - t0:.1f}s -> {dt*1e3:.1f} ms/step")

    patches_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "3d_fullres_nextou fwd patches/sec/chip (64x224x192, bf16)",
                "value": round(patches_per_sec, 3),
                "unit": "patches/s",
                "vs_baseline": round(patches_per_sec / A100_REFERENCE_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
