"""Epipolar geometry: Hartley normalization, the 8-point algorithm, epipolar
distances, and essential-matrix construction.

TPU-first reimagining of the reference's CameraPose math (SFM.py:162-236):
every function is mask-aware, batched over hypotheses via leading dims or
``vmap``, and built from eigh/matmul primitives that stay on-device. No Python
loop builds an A-matrix row by row (reference SFM.py:217-220); the constraint
matrix is one outer-product einsum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.smallsvd import nullvec_lstsq, project_rank2


def hartley_normalize(
    pts: jax.Array, mask: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """Translate points to zero mean and scale mean radius to sqrt(2).

    ``pts`` is (..., N, 2); returns normalized homogeneous points (..., N, 3)
    and the (..., 3, 3) transform T with x_norm = T x. Mirrors reference
    ``normalize_points`` (SFM.py:162-178) but masked and batched.
    """
    if mask is None:
        w = jnp.ones(pts.shape[:-1], dtype=pts.dtype)
    else:
        w = mask.astype(pts.dtype)
    count = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / count[..., None]
    centered = pts - mean
    dist = jnp.linalg.norm(centered, axis=-1)
    mean_dist = jnp.sum(dist * w, axis=-1) / count[..., 0]
    scale = jnp.sqrt(2.0).astype(pts.dtype) / jnp.maximum(mean_dist, 1e-12)

    s = scale[..., None, None]
    cu = mean[..., 0, 0][..., None, None]
    cv = mean[..., 0, 1][..., None, None]
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    T = jnp.concatenate(
        [
            jnp.concatenate([s, z, -s * cu], axis=-1),
            jnp.concatenate([z, s, -s * cv], axis=-1),
            jnp.concatenate([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    pts_h = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    return pts_h @ jnp.swapaxes(T, -1, -2), T


def _constraint_rows(p1n: jax.Array, p2n: jax.Array) -> jax.Array:
    """Rows of the 8-point constraint matrix: row_i = kron(x1_i, x2_i) ordered so
    that A f = 0 with f = vec(F) row-major, i.e. x2^T F x1 = 0
    (reference SFM.py:199-220)."""
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    return jnp.stack(
        [x1 * x2, y1 * x2, x2, x1 * y2, y1 * y2, y2, x1, y1, ones], axis=-1
    )


def eight_point_fundamental(
    p1: jax.Array, p2: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """Normalized 8-point fundamental matrix for (..., N, 2) correspondences.

    Hartley-normalize both sets, solve the null vector of the constraint matrix
    via eigh(A^T A), enforce rank 2, and unnormalize (T2^T F T1). Matches the
    reference ``_compute_fundamental_matrix`` (SFM.py:190-236) numerically while
    being batched over leading hypothesis dimensions.
    """
    p1n, T1 = hartley_normalize(p1, mask)
    p2n, T2 = hartley_normalize(p2, mask)
    A = _constraint_rows(p1n, p2n)
    if mask is not None:
        A = A * mask[..., None].astype(A.dtype)
    f = nullvec_lstsq(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    F = project_rank2(F)
    return jnp.swapaxes(T2, -1, -2) @ F @ T1


def epipolar_distances(F: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Point-to-epipolar-line distances in image 2: |l . x2| / ||l_xy||,
    l = F x1 (reference SFM.py:86-95, :144-151). F is (..., 3, 3); points are
    (N, 2) or (..., N, 2); result broadcasts to (..., N).

    Layout note: the lines are computed component-wise as three (..., N)
    arrays, never as an (..., N, 3) tensor — a trailing dim of 3 occupies the
    TPU lane dimension (padded to 128), a 42x memory blowup on the RANSAC
    hypothesis batch.
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    Fb = F[..., None]  # broadcast (..., 3, 3, 1) against (N,)
    l0 = Fb[..., 0, 0, :] * x1 + Fb[..., 0, 1, :] * y1 + Fb[..., 0, 2, :]
    l1 = Fb[..., 1, 0, :] * x1 + Fb[..., 1, 1, :] * y1 + Fb[..., 1, 2, :]
    l2 = Fb[..., 2, 0, :] * x1 + Fb[..., 2, 1, :] * y1 + Fb[..., 2, 2, :]
    num = jnp.abs(l0 * x2 + l1 * y2 + l2)
    den = jnp.sqrt(l0 * l0 + l1 * l1)
    return num / jnp.maximum(den, 1e-12)


def symmetric_epipolar_distances(F: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Max of the two directed point-line distances (a stricter inlier metric
    than the reference's one-sided test; offered as an option)."""
    d12 = epipolar_distances(F, p1, p2)
    d21 = epipolar_distances(jnp.swapaxes(F, -1, -2), p2, p1)
    return jnp.maximum(d12, d21)


def essential_from_fundamental(F: jax.Array, K1: jax.Array, K2: jax.Array) -> jax.Array:
    """E = K2^T F K1 (reference SFM.py:58)."""
    return jnp.swapaxes(K2, -1, -2) @ F @ K1
