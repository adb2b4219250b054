"""Persistent XLA compilation cache.

Flagship NexToU compiles take minutes on TPU (tunneled PJRT); caching
compiled executables on disk makes every CLI after the first launch start in
seconds. Called by the CLIs and benchmarks; safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT = os.environ.get(
    "NEXTOU_COMPILATION_CACHE", os.path.expanduser("~/.cache/nextou_tpu/xla")
)


def pin_platform_from_env() -> None:
    """Re-assert ``JAX_PLATFORMS`` through jax.config.

    The tunneled ``axon`` TPU plugin registers itself regardless of the
    env var, so ``JAX_PLATFORMS=cpu python -m nextou_tpu.run_training ...``
    would still initialize (and, if the tunnel is down, hang on) the TPU
    backend. Setting the config key before first backend use restores the
    documented env-var semantics. No-op when the var is unset or the
    backend is already initialized.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def enable_compilation_cache(path: str | None = None) -> str | None:
    pin_platform_from_env()
    try:
        import jax

        path = path or _DEFAULT
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:
        return None
