"""Two-view relative-pose refinement: batched Sampson-error Gauss-Newton.

The reference never refines a relative pose — RANSAC's minimal-sample winner
is used as-is (SFM.py:38-103), which on small-baseline pairs leaves 1-5 deg
of rotation error (noise in 8 correspondences). The maximum-likelihood
two-view pose over ALL inliers is far tighter; this module solves it as one
batched, jitted program over the whole edge list of a view graph:

* 5-dof parameterization: ``R <- exp(w) R`` (so(3) tangent) and ``t`` moved in
  its 2-dof orthogonal tangent basis then renormalized (scale unobservable).
* residual: Sampson distance of the epipolar constraint — the standard
  first-order approximation of the reprojection error that needs no 3-D
  points (Hartley & Zisserman 11.4.3).
* damped Gauss-Newton with accept/reject (residual Jacobians via ``jacfwd``
  over the 5 parameters; each step solves a 5x5 system per edge).

Used by the global pipeline between pairwise RANSAC and rotation averaging;
also exposed for the incremental bootstrap.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.utils.precision import mm_f32

from sfmfromscratch_tpu.ops.lie import so3_exp


def _tangent_basis(t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Two unit vectors orthogonal to t (and each other)."""
    # Pick the axis least aligned with t for a stable cross product.
    ax = jnp.where(
        jnp.abs(t[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], t.dtype),
        jnp.asarray([0.0, 1.0, 0.0], t.dtype),
    )
    e1 = jnp.cross(t, ax)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
    e2 = jnp.cross(t, e1)
    e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
    return e1, e2


def _sampson_residuals(
    R: jax.Array, t: jax.Array,
    p1: jax.Array, p2: jax.Array,
    K1i: jax.Array, K2i: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Masked Sampson distances (N,) for pixel correspondences."""
    tx = jnp.asarray([
        [0.0, -t[2], t[1]],
        [t[2], 0.0, -t[0]],
        [-t[1], t[0], 0.0],
    ], t.dtype)
    F = K2i.T @ (tx @ R) @ K1i
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=1)
    Fx1 = x1 @ F.T                                    # (N, 3)
    Ftx2 = x2 @ F                                     # (N, 3)
    num = jnp.sum(x2 * Fx1, axis=1)
    den = jnp.sqrt(
        Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    )
    return mask * num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("num_iters",))
@mm_f32
def refine_relative_pose(
    R0: jax.Array,      # (E, 3, 3)
    t0: jax.Array,      # (E, 3) unit
    p1: jax.Array,      # (E, N, 2)
    p2: jax.Array,      # (E, N, 2)
    K1: jax.Array,      # (E, 3, 3)
    K2: jax.Array,      # (E, 3, 3)
    mask: jax.Array,    # (E, N) bool/float inlier weights
    num_iters: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched damped-GN Sampson refinement. Returns ``(R, t, rms)`` where
    ``rms`` is the final masked Sampson RMS per edge (px) — a per-edge quality
    signal for averaging weights. Edges whose mask is all-zero pass through
    unchanged."""

    def one(R0, t0, p1, p2, K1, K2, m):
        K1i = jnp.linalg.inv(K1)
        K2i = jnp.linalg.inv(K2)
        mf = m.astype(p1.dtype)
        n_eff = jnp.maximum(jnp.sum(mf), 1.0)
        has_data = jnp.sum(mf) >= 5

        def params_to_pose(R, t, dp):
            Rn = so3_exp(dp[:3]) @ R
            e1, e2 = _tangent_basis(t)
            tn = t + dp[3] * e1 + dp[4] * e2
            tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
            return Rn, tn

        def cost(R, t):
            r = _sampson_residuals(R, t, p1, p2, K1i, K2i, mf)
            return jnp.sum(r * r)

        def step(state, _):
            R, t, lm = state
            res_fn = lambda dp: _sampson_residuals(
                *params_to_pose(R, t, dp), p1, p2, K1i, K2i, mf
            )
            dp0 = jnp.zeros(5, p1.dtype)
            r = res_fn(dp0)                           # (N,)
            J = jax.jacfwd(res_fn)(dp0)               # (N, 5)
            JtJ = J.T @ J
            g = J.T @ r
            A = JtJ + lm * jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-8))
            dp = -jnp.linalg.solve(A, g)
            R_new, t_new = params_to_pose(R, t, dp)
            better = (cost(R_new, t_new) < jnp.sum(r * r)) & has_data
            R = jnp.where(better, R_new, R)
            t = jnp.where(better, t_new, t)
            lm = jnp.where(better, lm * 0.3, lm * 4.0)
            lm = jnp.clip(lm, 1e-8, 1e6)
            return (R, t, lm), None

        (R, t, _), _ = jax.lax.scan(
            step, (R0, t0, jnp.asarray(1e-3, p1.dtype)), None, length=num_iters
        )
        rms = jnp.sqrt(cost(R, t) / n_eff)
        return R, t, rms

    return jax.vmap(one)(R0, t0, p1, p2, K1, K2, mask)
