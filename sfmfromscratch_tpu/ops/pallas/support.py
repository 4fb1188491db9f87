"""Backend detection for Pallas kernel dispatch."""

from __future__ import annotations

import functools

import jax


@functools.cache
def pallas_tpu_available() -> bool:
    """True when the default backend compiles Pallas TPU (Mosaic) kernels."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
