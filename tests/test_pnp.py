import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.geometry.pnp import pnp, pnp_ransac
from tests.conftest import synthetic_scene


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def _angle_deg(Ra, Rb):
    dR = Ra @ Rb.T
    return np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))


def test_pnp_exact(rng):
    sc = synthetic_scene(rng, num_points=48)
    res = pnp(_f32(sc["X"]), _f32(sc["p2"]), _f32(sc["K"]))
    assert bool(res.ok)
    assert _angle_deg(np.asarray(res.R), sc["R2"]) < 0.5
    np.testing.assert_allclose(np.asarray(res.t), sc["t2"], atol=2e-2)


def test_pnp_ransac_with_outliers(rng):
    sc = synthetic_scene(rng, num_points=80, noise=0.3)
    p2 = sc["p2"].copy()
    p2[-25:] += rng.uniform(40, 100, (25, 2)) * rng.choice([-1, 1], (25, 2))
    res = pnp_ransac(
        jax.random.key(0), _f32(sc["X"]), _f32(p2), _f32(sc["K"]),
        num_hypotheses=600,
    )
    assert bool(res.ok)
    assert _angle_deg(np.asarray(res.R), sc["R2"]) < 1.5
    np.testing.assert_allclose(np.asarray(res.t), sc["t2"], atol=0.1)
    inl = np.asarray(res.inliers)
    assert inl[:55].mean() > 0.85
    assert inl[-25:].mean() < 0.2


def test_pnp_ransac_insufficient_points(rng):
    sc = synthetic_scene(rng, num_points=16)
    mask = np.arange(16) < 3  # below min_points=4
    res = pnp_ransac(
        jax.random.key(0), _f32(sc["X"]), _f32(sc["p2"]), _f32(sc["K"]),
        mask=jnp.asarray(mask), num_hypotheses=64,
    )
    assert not bool(res.ok)


def test_pnp_matches_cv2(rng):
    """Golden parity with the engine the reference uses (cv2.solvePnPRansac,
    PoseEstimator.py:54-62)."""
    import cv2

    sc = synthetic_scene(rng, num_points=60, noise=0.2)
    ok, rvec, tvec, inliers = cv2.solvePnPRansac(
        sc["X"].astype(np.float32), sc["p2"].astype(np.float32),
        sc["K"].astype(np.float32), None,
        reprojectionError=8.0, iterationsCount=200, flags=cv2.SOLVEPNP_ITERATIVE,
    )
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    res = pnp_ransac(jax.random.key(1), _f32(sc["X"]), _f32(sc["p2"]), _f32(sc["K"]),
                     num_hypotheses=400)
    assert _angle_deg(np.asarray(res.R), R_cv) < 1.0
    np.testing.assert_allclose(np.asarray(res.t), tvec.ravel(), atol=0.05)
