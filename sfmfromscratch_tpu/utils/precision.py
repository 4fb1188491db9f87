"""Scoped matmul-precision control for the geometry stack.

TPU MXU matmuls on float32 inputs default to bfloat16 multiplicands (8-bit
mantissa) with float32 accumulation. That is the right trade for the feature
frontend (Harris convolutions, descriptor matching, SIFT binning — large,
precision-insensitive, MXU-bound), but it is catastrophic for the geometry
stack: epipolar distances, 8-point systems, Sampson refinement, motion
averaging and bundle adjustment all amplify rounding into pose error.
Measured on the 47-view orbit benchmark (one v5e chip): default precision
gives median edge-rotation error 1.39 deg and post-BA ATE 22% of trajectory
extent; float32 precision gives 0.27 deg and 0.4% — identical to CPU — while
the geometry matmuls are far too small for the 3-pass float32 MXU cost to
matter (<5% of stage time).

Apply :func:`mm_f32` UNDER ``jax.jit`` (so the context is active while the
function body is traced) on every geometry/BA entry point; leave the frontend
kernels on the fast bf16 path.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["mm_f32"]


def mm_f32(fn):
    """Trace ``fn`` with float32 matmul precision (TPU: 3-pass bf16).

    The context manager participates in the jit cache key, so wrapped and
    unwrapped callers never share a stale compiled program.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
