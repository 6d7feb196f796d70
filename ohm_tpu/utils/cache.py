"""Persistent XLA compilation cache setup.

The remote TPU compile service in this environment takes minutes per large
program (and occasionally requires a retry), so caching compiled executables
across processes is load-bearing.  The JAX_COMPILATION_CACHE_DIR env-var
path races backend initialisation here; explicit set_cache_dir is reliable.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None):
    path = path or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                                ".jax_cache")
    os.makedirs(path, exist_ok=True)
    import jax
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.set_cache_dir(path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
