"""Image preprocessing ops: grayscale, resize, pyramids, 2-D convolution.

TPU-native replacements for the reference's cv2/PIL calls
(Runner.py:467-548, ScaleRotInvSIFT.py:109-115, NaiveSIFT.py:201-213).
Convolutions use ``lax.conv_general_dilated`` with zero padding, matching
cv2.filter2D(..., borderType=cv2.BORDER_CONSTANT).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV grayscale coefficients (reference Runner.py:467-478).
_GRAY_COEFFS = (0.299, 0.587, 0.114)

SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) RGB in [0,1] -> (..., H, W) grayscale, OpenCV weights."""
    return (
        img[..., 0] * _GRAY_COEFFS[0]
        + img[..., 1] * _GRAY_COEFFS[1]
        + img[..., 2] * _GRAY_COEFFS[2]
    )


def conv2d_same(image: jax.Array, kernel: jax.Array) -> jax.Array:
    """Zero-padded 'same' cross-correlation of a (..., H, W) image with a (kh, kw)
    kernel — the semantics of cv2.filter2D with BORDER_CONSTANT
    (reference NaiveSIFT.py:67-69, 212-213)."""
    batch_shape = image.shape[:-2]
    H, W = image.shape[-2:]
    x = image.reshape((-1, 1, H, W))
    kh, kw = kernel.shape
    k = kernel.reshape((1, 1, kh, kw)).astype(image.dtype)
    out = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(1, 1),
        padding=((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + (H, W))


def gaussian_kernel(ksize: int, sigma, dtype=jnp.float32) -> jax.Array:
    """Normalized 2-D Gaussian (reference NaiveSIFT.py:175-199).

    ``sigma`` may be a traced value; only ``ksize`` must be static.
    """
    mean = ksize // 2
    axis = jnp.asarray(np.linspace(-mean, mean, ksize), dtype=dtype)
    r2 = axis[:, None] ** 2 + axis[None, :] ** 2
    g2 = jnp.exp(-r2 / (2.0 * jnp.asarray(sigma, dtype=dtype) ** 2))
    return g2 / jnp.sum(g2)


def sobel_gradients(image: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(Ix, Iy) via 3x3 Sobel with zero-padded borders
    (reference NaiveSIFT.py:201-213)."""
    return conv2d_same(image, jnp.asarray(SOBEL_X)), conv2d_same(image, jnp.asarray(SOBEL_Y))


def resize_bilinear(image: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers (cv2.resize / PIL semantics,
    reference ScaleRotInvSIFT.py:114-115)."""
    out_shape = image.shape[:-2] + tuple(out_hw)
    return jax.image.resize(image, out_shape, method="linear")


def pyramid_shapes(hw: Tuple[int, int], num_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    """Static per-level (H, W) following the reference's chained int division
    (ScaleRotInvSIFT.py:109-115)."""
    shapes = [tuple(hw)]
    for _ in range(1, num_levels):
        h, w = shapes[-1]
        shapes.append((int(h / scale_factor), int(w / scale_factor)))
    return shapes


def build_pyramid(image: jax.Array, num_levels: int, scale_factor: float) -> List[jax.Array]:
    """Image pyramid; level i+1 resized from level i (not from level 0), matching
    the reference's accumulation of resampling error."""
    levels = [image]
    shapes = pyramid_shapes(image.shape[-2:], num_levels, scale_factor)
    for hw in shapes[1:]:
        levels.append(resize_bilinear(levels[-1], hw))
    return levels
