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


def enable_compilation_cache(path: str | None = None) -> str | None:
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
