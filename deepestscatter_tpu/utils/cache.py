"""Persistent XLA compilation cache.

The hot programs here (the megabatch march ``while_loop``, the fused neural
renderers) take minutes to compile on the tunneled TPU; caching compiled
executables on disk makes every process after the first start in seconds.
The reference has no analog (OptiX PTX is precompiled at build time —
Resources.cpp:157-167 just loads .ptx); for a jit framework the cache IS
that build step.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "deepestscatter_tpu", "xla"
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Turn on JAX's on-disk compilation cache (idempotent)."""
    import jax

    cache_dir = path or os.environ.get("DS_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program regardless of size/compile time: the driver
    # re-runs bench/drive in fresh processes each round.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
