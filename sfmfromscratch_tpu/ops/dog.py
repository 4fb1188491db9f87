"""Difference-of-Gaussians scale-space keypoint detector.

The north star names "Harris/DoG scale-space detection" (BASELINE.json); the
reference ships only Harris. This is the DoG half: a Gaussian scale-space
octave stack, DoG extrema over (x, y, scale) via 3-D max/min pooling, contrast
and edge-response gates (Lowe's SIFT detector tests), fixed-capacity output.
One jitted program per image shape; plugs into the same descriptor stage as
the Harris detector.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.image import conv2d_same, gaussian_kernel
from sfmfromscratch_tpu.types import Keypoints


def _gaussian_stack(image: jax.Array, sigmas) -> jax.Array:
    """(S, H, W) Gaussian-blurred images at the given sigmas."""
    outs = []
    for s in sigmas:
        ksize = int(2 * math.ceil(3 * s) + 1)
        outs.append(conv2d_same(image, gaussian_kernel(ksize, s, dtype=image.dtype)))
    return jnp.stack(outs)


@functools.partial(
    jax.jit,
    static_argnames=("k", "num_scales", "base_sigma", "contrast_threshold",
                     "edge_threshold", "border"),
)
def detect_dog_keypoints(
    image: jax.Array,
    k: int,
    num_scales: int = 4,
    base_sigma: float = 1.6,
    contrast_threshold: float = 0.015,
    edge_threshold: float = 10.0,
    border: int = 8,
) -> Keypoints:
    """Top-k DoG extrema of one (H, W) image with contrast/edge gating.

    Returns fixed-capacity ``Keypoints`` (score = |DoG| response). Scale
    information is folded into the response ranking; descriptor sampling uses
    the engine's fixed window, mirroring how the reference folds pyramid level
    into coordinates only (ScaleRotInvSIFT.py:101-102).
    """
    H, W = image.shape
    kfac = 2.0 ** (1.0 / max(num_scales - 1, 1))
    sigmas = [base_sigma * (kfac ** i) for i in range(num_scales + 2)]
    G = _gaussian_stack(image, sigmas)              # (S+2, H, W)
    D = G[1:] - G[:-1]                              # (S+1, H, W) DoG planes

    # 3-D extrema: compare to the 3x3x3 neighborhood.
    def pool(x, op, init):
        return jax.lax.reduce_window(
            x, init, op, (3, 3, 3), (1, 1, 1), [(1, 1)] * 3
        )

    is_max = D == pool(D, jax.lax.max, -jnp.inf)
    is_min = D == pool(D, jax.lax.min, jnp.inf)
    resp = jnp.abs(D)
    strong = resp > contrast_threshold

    # Edge gate: Hessian trace^2/det test on each DoG plane (Lowe §4.1).
    Dxx = conv2d_same(D, jnp.asarray([[1.0, -2.0, 1.0]], dtype=D.dtype))
    Dyy = conv2d_same(D, jnp.asarray([[1.0], [-2.0], [1.0]], dtype=D.dtype))
    Dxy = conv2d_same(
        D, jnp.asarray([[0.25, 0, -0.25], [0, 0, 0], [-0.25, 0, 0.25]], dtype=D.dtype)
    )
    tr = Dxx + Dyy
    det = Dxx * Dyy - Dxy * Dxy
    r = edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)

    rows = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 2)
    in_b = (rows >= border) & (rows < H - border) & (cols >= border) & (cols < W - border)

    cand = (is_max | is_min) & strong & edge_ok & in_b
    score = jnp.where(cand, resp, -jnp.inf).reshape(-1)
    top, idx = jax.lax.top_k(score, k)
    plane = idx // (H * W)
    rem = idx % (H * W)
    y = (rem // W).astype(jnp.int32)
    x = (rem % W).astype(jnp.int32)
    mask = jnp.isfinite(top)
    del plane  # scale folded into ranking only
    return Keypoints(
        x=x, y=y, score=jnp.where(mask, top, 0.0), mask=mask,
        xf=x.astype(jnp.float32), yf=y.astype(jnp.float32),
    )
