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


@functools.cache
def sift_pallas_available() -> bool:
    """True when the fused SIFT histogram kernel actually compiles under
    Mosaic on this backend — probed ONCE per process on a tiny input, so a
    lowering regression degrades to the XLA descriptor path instead of
    crashing the pipeline's first feature extraction."""
    if not pallas_tpu_available():
        return False
    try:
        import jax.numpy as jnp

        from sfmfromscratch_tpu.ops.pallas.sift_kernel import (
            sift_histograms_pallas,
        )

        m = jnp.ones((8, 16, 16), jnp.float32)
        sift_histograms_pallas(m, m).block_until_ready()
        return True
    except Exception:  # pragma: no cover - only on Mosaic regressions
        return False
