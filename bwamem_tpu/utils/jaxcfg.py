"""JAX configuration helpers for this environment.

The axon image routes XLA compiles through a remote service whose
latency is minutes per program; the persistent compilation cache is
the difference between 5 reads/s and hundreds.  Env vars are read too
late here (sitecustomize imports jax at interpreter start), so the
cache must be enabled through jax.config — call this from every entry
point before the first jit execution.
"""

from __future__ import annotations

import os

_DEFAULT = "/root/.cache/jax_comp"


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
