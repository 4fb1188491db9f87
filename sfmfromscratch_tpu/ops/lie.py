"""SO(3) exponential/logarithm maps (axis-angle <-> rotation matrix).

TPU-native replacement for ``cv2.Rodrigues`` (reference call sites: SFM.py:387,454,
PoseEstimator.py:68,104, Runner.py:213,285). Closed-form, batched, and
differentiable — this is what makes analytic bundle-adjustment Jacobians
possible (the reference's scipy BA uses 2-point numerical differences instead,
SFM.py:421-429).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) axis-angle vector -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Uses Taylor expansions of sin(t)/t and (1-cos t)/t^2 near t=0 so the map and
    its derivatives are well-defined at the identity.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    # sin(t)/t and (1 - cos t)/t^2 with small-angle fallbacks. Both branches of
    # each `where` are evaluated under autodiff, so the generic branch must be
    # NaN-free at theta = 0: clamp the denominators before dividing.
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_safe) / theta_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    K = so3_hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle vector.

    Safe at the identity; near theta = pi it falls back to the
    largest-diagonal-axis extraction.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Antisymmetric part gives axis * sin(theta).
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # Generic branch: w = theta / (2 sin theta) * v, Taylor near 0.
    small = theta < 1e-4
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.maximum(sin_t, _EPS)))
    w_generic = scale[..., None] * v

    # Near pi: axis from the diagonal of (R + I)/2 = aa^T (+ O(pi - theta)).
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag + 1.0) * 0.5, 0.0)
    axis = jnp.sqrt(axis2)
    # Fix signs using the off-diagonal sums; pick the largest component as anchor.
    k = jnp.argmax(axis2, axis=-1)

    def fix_signs(R_, axis_, k_):
        s01 = R_[0, 1] + R_[1, 0]
        s02 = R_[0, 2] + R_[2, 0]
        s12 = R_[1, 2] + R_[2, 1]

        def from0(a):
            return jnp.stack([a[0], jnp.sign(s01) * a[1], jnp.sign(s02) * a[2]])

        def from1(a):
            return jnp.stack([jnp.sign(s01) * a[0], a[1], jnp.sign(s12) * a[2]])

        def from2(a):
            return jnp.stack([jnp.sign(s02) * a[0], jnp.sign(s12) * a[1], a[2]])

        return jax.lax.switch(k_, [from0, from1, from2], axis_)

    batch_shape = R.shape[:-2]
    if batch_shape:
        R_flat = R.reshape((-1, 3, 3))
        axis_flat = axis.reshape((-1, 3))
        k_flat = k.reshape((-1,))
        axis_fixed = jax.vmap(fix_signs)(R_flat, axis_flat, k_flat).reshape(batch_shape + (3,))
    else:
        axis_fixed = fix_signs(R, axis, k)

    w_pi = theta[..., None] * axis_fixed
    near_pi = theta > jnp.pi - 1e-3
    return jnp.where(near_pi[..., None], w_pi, w_generic)
