"""Lazy persistent-compilation-cache enablement.

The package import enables the cache when a TPU platform is REQUESTED via
``JAX_PLATFORMS``/``jax_platforms`` (sfmfromscratch_tpu/__init__.py) — that
check cannot initialize backends, because backend init may block on a remote
TPU. On stock TPU VMs nobody sets those knobs (JAX autodetects the chip), so
pipeline entry points also call this lazy hook: by then asking JAX for the
resolved default backend is free, and the cache still gets configured before
the first big compile.

CPU backends never get the cache: a cached CPU executable is AOT machine code
for the *compiling* host, and running it on a CPU without those ISA extensions
SIGILLs (observed under a migrated VM — see __init__.py).
"""

from __future__ import annotations

import functools
import os

import jax


@functools.cache
def maybe_enable_compile_cache() -> bool:
    """Enable the persistent cache iff the resolved backend is a TPU.

    Returns True when the cache is (already or newly) configured. Safe to call
    from every pipeline entry point — it runs once per process.
    """
    if os.environ.get("SFM_TPU_COMPILE_CACHE", "1") == "0":
        return False
    if jax.config.jax_compilation_cache_dir:
        return True  # configured at import (or by the user) — keep it
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend not in ("tpu", "axon"):
        return False
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/sfmfromscratch_tpu/xla-tpu"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # pragma: no cover - cache is best-effort
        return False
