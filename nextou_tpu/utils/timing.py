"""Reliable device timing.

Under some PJRT transports (e.g. a tunneled remote TPU) ``block_until_ready``
can return before device execution finishes, so wall-clocking repeated
dispatches under-measures arbitrarily. ``device_loop_time`` instead runs the
op N times *inside one compiled program* (``lax.fori_loop`` with a forced
data dependence so XLA cannot hoist the loop-invariant computation), fetches
a scalar to host (which genuinely waits for completion), and reports the
per-iteration slope between two loop lengths (fixed overheads cancel).
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_loop_time(
    f: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    n_small: int = 2,
    n_large: int = 34,
    repeats: int = 3,
    compiler_options: dict | None = None,
) -> float:
    """Seconds per call of ``f(x)`` measured on-device.

    ``f`` maps an array to an array; a scalar of the output is fed back into
    the input each iteration to serialize the loop. ``compiler_options``
    forwards XLA debug options for this executable only (the flag-sweep
    channel that reaches a REMOTE compiler — client-side XLA_FLAGS do not,
    tools/exp_xla_flags.py).
    """

    def make(n):
        @functools.partial(jax.jit, compiler_options=compiler_options)
        def run(x):
            def body(i, x):
                y = f(x)
                # feed back a FULL reduction of y: depending on a single
                # element would let XLA simplify f to just that element
                eps = (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(x.dtype)
                return x + eps
            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out.astype(jnp.float32))

        return run

    run_s, run_l = make(n_small), make(n_large)
    # compile + warm
    float(run_s(x))
    float(run_l(x))

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_s(x))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_l(x))
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (n_large - n_small))
    return max(best, 0.0)
