"""Triangulation: batched DLT plus on-device nonlinear refinement.

Replaces the reference's per-point Python loops with single-SVD-per-point host
calls (SFM.py:238-305) and its scipy Levenberg-Marquardt point refinement
(SFM.py:255-289) with:

* one batched SVD null-vector solve for all points at once
  (``triangulate_dlt``),
* a fixed-iteration Gauss-Newton refinement with analytic 3x3 normal equations
  solved in closed form (``refine_points_gn``) — jit-compatible, vmapped over
  points, no host round trips,
* a closed-form two-view depth used for cheirality tests inside RANSAC
  (``two_view_depths``), replacing the reference's per-candidate full DLT scan
  (SFM.py:105-124).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.smallsvd import nullvec_lstsq
from sfmfromscratch_tpu.geometry.epipolar import hartley_normalize


def triangulate_dlt(p1: jax.Array, p2: jax.Array, P1: jax.Array, P2: jax.Array) -> jax.Array:
    """Batched linear triangulation.

    p1, p2: (..., N, 2) pixel observations; P1, P2: (..., 3, 4) projections.
    Returns (..., N, 3) Euclidean points (reference: one SVD per point,
    SFM.py:238-253).

    The null vector comes from the direct batched SVD (``nullvec_lstsq``).
    A closed-form path (4-D cross seed + Cramer Rayleigh-quotient steps) was
    tried in round 4 and REVERTED: at tiny parallax (0.8 deg/view orbit
    steps) the two smallest singular values nearly coincide and the iteration
    picks the wrong vector — the 47-view orbit chain went 0.5 -> 42 px
    post-BA reproj. Eigenvector selection under near-degeneracy is the one
    thing the SVD is load-bearing for here (docs/PERFORMANCE.md lesson 2).
    """
    x1, y1 = p1[..., 0:1], p1[..., 1:2]
    x2, y2 = p2[..., 0:1], p2[..., 1:2]
    P1b = P1[..., None, :, :]
    P2b = P2[..., None, :, :]
    rows = jnp.stack(
        [
            x1 * P1b[..., 2, :] - P1b[..., 0, :],
            y1 * P1b[..., 2, :] - P1b[..., 1, :],
            x2 * P2b[..., 2, :] - P2b[..., 0, :],
            y2 * P2b[..., 2, :] - P2b[..., 1, :],
        ],
        axis=-2,
    )  # (..., N, 4, 4)
    X = nullvec_lstsq(rows)  # (..., N, 4)
    w = X[..., 3:4]
    return X[..., :3] / jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)


def triangulate_normalized(
    p1: jax.Array, p2: jax.Array, P1: jax.Array, P2: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Hartley-normalized DLT: normalize observations, transform the projection
    matrices accordingly, then triangulate (reference ``triangulate_points``,
    SFM.py:291-305)."""
    p1n, T1 = hartley_normalize(p1, mask)
    p2n, T2 = hartley_normalize(p2, mask)
    return triangulate_dlt(p1n[..., :2], p2n[..., :2], T1 @ P1, T2 @ P2)


def _residuals_jac_batched(X: jax.Array, p: jax.Array, P: jax.Array):
    """Residual (N, 2) and analytic Jacobian (N, 2, 3) of one camera's
    reprojection for all points at once."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    h = Xh @ P.T                                             # (N, 3)
    z = jnp.where(jnp.abs(h[:, 2:3]) < 1e-12, 1e-12, h[:, 2:3])
    proj = h[:, :2] / z
    r = proj - p
    # d proj / dX = (P[:2,:3] * z - h[:2] P[2,:3]) / z^2
    A = P[:2, :3][None, :, :]                                # (1, 2, 3)
    B = h[:, :2, None] * P[2, :3][None, None, :]             # (N, 2, 3)
    J = (A * z[:, :, None] - B) / (z[:, :, None] ** 2)
    return r, J


def refine_points_gn(
    p3d: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    P1: jax.Array,
    P2: jax.Array,
    mask: Optional[jax.Array] = None,
    num_iters: int = 10,
    damping: float = 1e-6,
) -> jax.Array:
    """Batched Gauss-Newton refinement of reprojection error with poses fixed.

    Functional replacement for the reference's scipy-LM ``non_linear_triangulation``
    (SFM.py:255-289): one fori_loop of fully-batched analytic-Jacobian steps —
    residuals, 2x3 Jacobians, 3x3 normal solves and the improvement gate all
    evaluate for every point simultaneously (no per-point vmap of autodiff, no
    host synchronization). A step that increases a point's cost is rejected
    per point.
    """
    if mask is None:
        mask = jnp.ones(p3d.shape[:-1], dtype=bool)

    def cost(X):
        r1, _ = _residuals_jac_batched(X, p1, P1)
        r2, _ = _residuals_jac_batched(X, p2, P2)
        return jnp.sum(r1 * r1, axis=-1) + jnp.sum(r2 * r2, axis=-1)

    eye = damping * jnp.eye(3, dtype=p3d.dtype)

    def step(_, X):
        r1, J1 = _residuals_jac_batched(X, p1, P1)
        r2, J2 = _residuals_jac_batched(X, p2, P2)
        JtJ = (
            jnp.einsum("nki,nkj->nij", J1, J1)
            + jnp.einsum("nki,nkj->nij", J2, J2)
            + eye
        )
        g = jnp.einsum("nki,nk->ni", J1, r1) + jnp.einsum("nki,nk->ni", J2, r2)
        # Batched LU solve. Closed-form alternatives were measured and
        # rejected for THIS loop: at the 0.8 deg/view low-parallax regime
        # (cond ~1e6+ JtJ) the adjugate costs 0.5 -> 2.6 px post-BA reproj
        # and even closed-form Cholesky costs 0.5 -> 1.6 px; the LAPACK
        # solve is the accuracy anchor of the chain's triangulation.
        dx = jnp.linalg.solve(JtJ, g[..., None])[..., 0]
        X_new = X - dx
        ok = (
            jnp.all(jnp.isfinite(X_new), axis=-1)
            & (cost(X_new) <= cost(X))
            & mask
        )
        return jnp.where(ok[:, None], X_new, X)

    return jax.lax.fori_loop(0, num_iters, step, p3d)


def triangulate_multiview(
    P_all: jax.Array,        # (C, 3, 4) projection matrices
    obs_cam: jax.Array,      # (O,) int32 camera index per observation
    obs_pt: jax.Array,       # (O,) int32 track index per observation
    obs_xy: jax.Array,       # (O, 2) pixel observations
    num_points: int,
    obs_w: Optional[jax.Array] = None,   # (O,) weights; 0 disables
    gn_iters: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Batched multiview DLT + Gauss-Newton refine over an observation list.

    The global-SfM counterpart of ``triangulate_dlt``: tracks have arbitrary
    observation counts, so each track's 4x4 DLT normal matrix is accumulated
    with a ``segment_sum`` over the flat observation list (DLT rows are
    unit-normalized first for conditioning), the null vector comes from one
    batched 4x4 eigh, and refinement accumulates per-track 3x3 normal
    equations the same way. Returns ``(X (num_points, 3), nobs (num_points,))``
    where ``nobs`` counts effective observations (tracks need >= 2 to be
    meaningful).
    """
    O = obs_xy.shape[0]
    w = jnp.ones((O,), obs_xy.dtype) if obs_w is None else obs_w.astype(obs_xy.dtype)
    P = P_all[obs_cam]                                       # (O, 3, 4)
    u = obs_xy[..., 0:1]
    v = obs_xy[..., 1:2]
    r1 = u * P[:, 2, :] - P[:, 0, :]                         # (O, 4)
    r2 = v * P[:, 2, :] - P[:, 1, :]
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-9)
    r2 = r2 / jnp.maximum(jnp.linalg.norm(r2, axis=-1, keepdims=True), 1e-9)
    M_obs = r1[:, :, None] * r1[:, None, :] + r2[:, :, None] * r2[:, None, :]
    M = jax.ops.segment_sum(w[:, None, None] * M_obs, obs_pt, num_segments=num_points)
    nobs = jax.ops.segment_sum((w > 0).astype(jnp.int32), obs_pt, num_segments=num_points)
    # Empty tracks get the identity (null vector undefined but harmless).
    M = M + 1e-9 * jnp.eye(4, dtype=M.dtype)
    _, V = jnp.linalg.eigh(M)                                # ascending eigvals
    Xh = V[..., :, 0]                                        # (num_points, 4)
    wh = Xh[..., 3:4]
    X = Xh[..., :3] / jnp.where(
        jnp.abs(wh) < 1e-12, jnp.where(wh < 0, -1e-12, 1e-12), wh
    )

    # Gauss-Newton on reprojection, poses fixed, accumulated per track.
    eye = 1e-6 * jnp.eye(3, dtype=X.dtype)

    def obs_res_jac(X):
        Xo = X[obs_pt]                                       # (O, 3)
        Xh = jnp.concatenate([Xo, jnp.ones_like(Xo[:, :1])], axis=-1)
        h = jnp.einsum("oij,oj->oi", P, Xh)                  # (O, 3)
        z = jnp.where(jnp.abs(h[:, 2:3]) < 1e-12, 1e-12, h[:, 2:3])
        r = h[:, :2] / z - obs_xy                            # (O, 2)
        A = P[:, :2, :3]
        B = h[:, :2, None] * P[:, None, 2, :3]
        J = (A * z[:, :, None] - B) / (z[:, :, None] ** 2)   # (O, 2, 3)
        return r * w[:, None], J * w[:, None, None]

    def track_cost(X):
        r, _ = obs_res_jac(X)
        return jax.ops.segment_sum(
            jnp.sum(r * r, axis=-1), obs_pt, num_segments=num_points
        )

    def step(_, X):
        r, J = obs_res_jac(X)
        JtJ = jax.ops.segment_sum(
            jnp.einsum("oki,okj->oij", J, J), obs_pt, num_segments=num_points
        ) + eye
        g = jax.ops.segment_sum(
            jnp.einsum("oki,ok->oi", J, r), obs_pt, num_segments=num_points
        )
        # closed-form damped 3x3 solve (see refine_points_gn)
        # Batched LU solve. Closed-form alternatives were measured and
        # rejected for THIS loop: at the 0.8 deg/view low-parallax regime
        # (cond ~1e6+ JtJ) the adjugate costs 0.5 -> 2.6 px post-BA reproj
        # and even closed-form Cholesky costs 0.5 -> 1.6 px; the LAPACK
        # solve is the accuracy anchor of the chain's triangulation.
        dx = jnp.linalg.solve(JtJ, g[..., None])[..., 0]
        X_new = X - dx
        ok = (
            jnp.all(jnp.isfinite(X_new), axis=-1)
            & (track_cost(X_new) <= track_cost(X))
            & (nobs >= 2)
        )
        return jnp.where(ok[:, None], X_new, X)

    X = jax.lax.fori_loop(0, gn_iters, step, X)
    return X, nobs


def two_view_depths(
    R: jax.Array, t: jax.Array, x1: jax.Array, x2: jax.Array,
    K1: jax.Array, K2: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form depths of correspondences under relative pose (R, t).

    x1, x2: (..., N, 2) pixels. Backprojects to rays r1 = K1^-1 x1h,
    r2 = K2^-1 x2h and solves z2 * r2 = R (z1 * r1) + t in least squares via the
    cross-product elimination:  z1 = (c x r2).(t x r2) / ||c x r2||^2 with
    c = R r1 — O(1) per point. This is the cheirality test the reference runs as
    a full DLT over every point per RANSAC candidate (SFM.py:105-124), made
    cheap enough to evaluate for thousands of hypotheses at once.
    """
    # Component-wise layout: every per-point quantity is an (..., N) array —
    # an (..., N, 3) tensor would put 3 in the TPU lane dimension (padded to
    # 128, a 42x blowup over the hypothesis batch).
    K1i = jnp.linalg.inv(K1)
    K2i = jnp.linalg.inv(K2)
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]

    def backproject(Ki, u, v):
        return (
            Ki[0, 0] * u + Ki[0, 1] * v + Ki[0, 2],
            Ki[1, 0] * u + Ki[1, 1] * v + Ki[1, 2],
            Ki[2, 0] * u + Ki[2, 1] * v + Ki[2, 2],
        )

    r1x, r1y, r1z = backproject(K1i, u1, v1)       # (N,) rays
    r2x, r2y, r2z = backproject(K2i, u2, v2)

    Rb = R[..., None]                               # (..., 3, 3, 1)
    cx_ = Rb[..., 0, 0, :] * r1x + Rb[..., 0, 1, :] * r1y + Rb[..., 0, 2, :] * r1z
    cy_ = Rb[..., 1, 0, :] * r1x + Rb[..., 1, 1, :] * r1y + Rb[..., 1, 2, :] * r1z
    cz_ = Rb[..., 2, 0, :] * r1x + Rb[..., 2, 1, :] * r1y + Rb[..., 2, 2, :] * r1z

    tb = t[..., None]                               # (..., 3, 1)
    tx_, ty_, tz_ = tb[..., 0, :], tb[..., 1, :], tb[..., 2, :]

    # cross(c, r2) and cross(t, r2), component-wise
    ax = cy_ * r2z - cz_ * r2y
    ay = cz_ * r2x - cx_ * r2z
    az = cx_ * r2y - cy_ * r2x
    bx = ty_ * r2z - tz_ * r2y
    by = tz_ * r2x - tx_ * r2z
    bz = tx_ * r2y - ty_ * r2x

    denom = ax * ax + ay * ay + az * az
    z1 = -(ax * bx + ay * by + az * bz) / jnp.maximum(denom, 1e-12)
    z2 = z1 * cz_ + tz_
    return z1, z2
