"""Harris corner detection as one jitted array program.

Replaces the reference's ``_find_harris_interest_points`` (NaiveSIFT.py:54-120),
whose NMS is a pure-Python per-pixel double loop (NaiveSIFT.py:85-88). Here:

* Sobel gradients + Gaussian-smoothed second moments are zero-padded convs
  (XLA fuses the elementwise products into the conv epilogue),
* NMS max-pool is one ``lax.reduce_window``,
* the median threshold is computed on-device,
* top-k selection with a fixed capacity + validity mask replaces the dynamic
  ``np.where``/argsort pipeline (NaiveSIFT.py:94-118).

Detection semantics match the reference: a pixel survives iff its response
equals the window max, its response is >= the image median, and it lies at
least ``feature_width // 2`` from every border; survivors are ranked by
response and truncated to capacity k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.image import conv2d_same, gaussian_kernel, sobel_gradients
from sfmfromscratch_tpu.types import Keypoints


def harris_response(
    image: jax.Array, gaussian_size: int, sigma: float, alpha: float
) -> jax.Array:
    """Harris corner response map R = det(M) - alpha * trace(M)^2
    (reference NaiveSIFT.py:60-74)."""
    Ix, Iy = sobel_gradients(image)
    g = gaussian_kernel(gaussian_size, sigma, dtype=image.dtype)
    Sxx = conv2d_same(Ix * Ix, g)
    Sxy = conv2d_same(Ix * Iy, g)
    Syy = conv2d_same(Iy * Iy, g)
    det = Sxx * Syy - Sxy * Sxy
    trace = Sxx + Syy
    return det - alpha * trace * trace


def _window_max(R: jax.Array, ksize: int) -> jax.Array:
    """Per-pixel max over a (2*(ksize//2)+1)^2 neighborhood, edge-clamped
    (reference NaiveSIFT.py:78-88)."""
    half = ksize // 2
    win = 2 * half + 1
    return jax.lax.reduce_window(
        R,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(win, win),
        window_strides=(1, 1),
        padding=((half, half), (half, half)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "feature_width", "nms_ksize", "gaussian_size", "sigma", "alpha",
        "use_pallas",
    ),
)
def detect_harris_keypoints(
    image: jax.Array,
    k: int,
    feature_width: int,
    nms_ksize: int,
    gaussian_size: int,
    sigma: float,
    alpha: float,
    use_pallas: bool = False,
) -> Keypoints:
    """Top-k Harris keypoints of one (H, W) image, fixed capacity k with mask.

    Returns ``Keypoints`` sorted by descending response. Matches the candidate
    set and ordering of the reference (NaiveSIFT.py:54-120) without any host
    round trip. For a batch of same-shape images, ``jax.vmap`` this function.
    ``use_pallas`` switches the response map to the fused single-pass kernel
    (ops/pallas/harris_kernel.py) on TPU backends.
    """
    H, W = image.shape
    if use_pallas:
        from sfmfromscratch_tpu.ops.pallas.harris_kernel import harris_response_fused

        R = harris_response_fused(image, gaussian_size, sigma, alpha)
    else:
        R = harris_response(image, gaussian_size, sigma, alpha)
    Rmax = _window_max(R, nms_ksize)
    median = jnp.median(R)
    is_local_max = (R == Rmax) & (R >= median)

    half = feature_width // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_bounds = (rows >= half) & (rows < H - half) & (cols >= half) & (cols < W - half)

    candidate = is_local_max & in_bounds
    neg_inf = jnp.asarray(-jnp.inf, dtype=R.dtype)
    score = jnp.where(candidate, R, neg_inf).reshape(-1)
    # Tiny images (small pyramid levels / aggressive scale_factor) can hold
    # fewer pixels than the keypoint budget; keep the fixed-capacity contract
    # by padding the tail with masked-out slots.
    k_eff = min(k, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, k_eff)
    if k_eff < k:
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((k - k_eff,), neg_inf, dtype=R.dtype)]
        )
        top_idx = jnp.concatenate(
            [top_idx, jnp.zeros((k - k_eff,), dtype=top_idx.dtype)]
        )
    y = (top_idx // W).astype(jnp.int32)
    x = (top_idx % W).astype(jnp.int32)
    mask = top_scores > neg_inf

    # Subpixel peak: 1-D parabola fit through the response along each axis
    # (integer keypoints carry +-0.5 px observation noise — the reference
    # returns integer coords only, NaiveSIFT.py:94-118).
    yc = jnp.clip(y, 1, H - 2)
    xc = jnp.clip(x, 1, W - 2)
    c = R[yc, xc]
    dx_num = R[yc, xc - 1] - R[yc, xc + 1]
    dx_den = 2.0 * (R[yc, xc - 1] - 2.0 * c + R[yc, xc + 1])
    dy_num = R[yc - 1, xc] - R[yc + 1, xc]
    dy_den = 2.0 * (R[yc - 1, xc] - 2.0 * c + R[yc + 1, xc])
    dx = jnp.clip(dx_num / jnp.where(jnp.abs(dx_den) < 1e-12, 1e-12, dx_den), -0.5, 0.5)
    dy = jnp.clip(dy_num / jnp.where(jnp.abs(dy_den) < 1e-12, 1e-12, dy_den), -0.5, 0.5)
    xf = x.astype(jnp.float32) + jnp.where(mask, dx, 0.0)
    yf = y.astype(jnp.float32) + jnp.where(mask, dy, 0.0)
    return Keypoints(
        x=x, y=y, score=jnp.where(mask, top_scores, 0.0), mask=mask, xf=xf, yf=yf
    )
