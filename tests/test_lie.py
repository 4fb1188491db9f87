import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.ops.lie import so3_exp, so3_log, so3_hat


def test_exp_identity():
    R = so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_exp_matches_cv2_rodrigues(rng):
    import cv2

    for _ in range(20):
        w = rng.standard_normal(3) * 2.0
        R_ref, _ = cv2.Rodrigues(w.astype(np.float64))
        R = np.asarray(so3_exp(jnp.asarray(w, dtype=jnp.float32)))
        np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_log_roundtrip(rng):
    ws = rng.standard_normal((50, 3)).astype(np.float32)
    # Keep |w| < pi for uniqueness of the log.
    norms = np.linalg.norm(ws, axis=1, keepdims=True)
    ws = ws / norms * (norms % (np.pi - 1e-2))
    R = so3_exp(jnp.asarray(ws))
    w_back = np.asarray(so3_log(R))
    np.testing.assert_allclose(w_back, ws, atol=2e-4)


def test_log_near_pi(rng):
    from scipy.spatial.transform import Rotation

    axis = np.array([0.6, -0.64, 0.48])
    axis = axis / np.linalg.norm(axis)
    w = axis * (np.pi - 1e-5)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w_back = np.asarray(so3_log(jnp.asarray(R)))
    # Sign ambiguity at pi: compare rotations, not vectors.
    R_back = np.asarray(so3_exp(jnp.asarray(w_back)))
    np.testing.assert_allclose(R_back, R, atol=1e-4)


def test_hat_antisymmetric(rng):
    w = jnp.asarray(rng.standard_normal(3), dtype=jnp.float32)
    K = np.asarray(so3_hat(w))
    np.testing.assert_allclose(K, -K.T, atol=0)


def test_exp_batched(rng):
    ws = jnp.asarray(rng.standard_normal((4, 5, 3)), dtype=jnp.float32)
    R = so3_exp(ws)
    assert R.shape == (4, 5, 3, 3)
    # Orthonormality
    RtR = np.asarray(jnp.einsum("...ij,...ik->...jk", R, R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)


def test_exp_differentiable():
    g = jax.jacobian(lambda w: so3_exp(w))(jnp.zeros(3))
    # d/dw exp(w) at 0 is the hat-map generator set.
    expected = np.stack([np.asarray(so3_hat(np.eye(3)[i].astype(np.float32))) for i in range(3)], axis=-1)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-5)
