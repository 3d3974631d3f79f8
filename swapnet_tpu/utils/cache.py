"""Persistent XLA compilation cache.

Big-model compiles through the TPU tunnel take minutes; enabling JAX's
on-disk compilation cache makes repeated runs (training restarts,
benchmarks, inference after training) start in seconds.  Called from all
entry points; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SWAPNET_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/swapnet_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
