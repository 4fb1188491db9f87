"""Batched Sampson two-view pose refinement (geometry/two_view.py)."""

import numpy as np
import jax.numpy as jnp

from tests.conftest import synthetic_scene
from sfmfromscratch_tpu.geometry.two_view import refine_relative_pose
from sfmfromscratch_tpu.geometry.ransac import ransac_essential_pose
import jax


def _ang(Ra, Rb):
    return np.degrees(np.arccos(np.clip((np.trace(Ra @ Rb.T) - 1) / 2, -1, 1)))


def test_refine_improves_noisy_pose(rng):
    s = synthetic_scene(rng, num_points=120, noise=0.4)
    K = jnp.asarray(s["K"], jnp.float32)
    p1 = jnp.asarray(s["p1"], jnp.float32)
    p2 = jnp.asarray(s["p2"], jnp.float32)
    mask = jnp.ones(p1.shape[0], bool)
    pose = ransac_essential_pose(jax.random.key(0), p1, p2, K, K, mask,
                                 num_hypotheses=512, threshold=1.0)
    R_gt, t_gt = s["R2"], s["t2"] / np.linalg.norm(s["t2"])
    err0 = _ang(np.asarray(pose.R), R_gt)
    R, t, rms = refine_relative_pose(
        pose.R[None], pose.t[None], p1[None], p2[None], K[None], K[None],
        pose.inliers[None].astype(jnp.float32),
    )
    err1 = _ang(np.asarray(R[0]), R_gt)
    tdot = float(np.dot(np.asarray(t[0]), t_gt))
    assert err1 <= err0 + 1e-3
    assert err1 < 0.5, f"{err0:.3f} -> {err1:.3f} deg"
    assert abs(tdot) > 0.999
    assert float(rms[0]) < 1.0


def test_refine_exact_pose_stays(rng):
    """From the ground-truth pose on exact correspondences, refinement must
    not move (and must not flip t)."""
    s = synthetic_scene(rng, num_points=80, noise=0.0)
    K = jnp.asarray(s["K"], jnp.float32)
    t_gt = s["t2"] / np.linalg.norm(s["t2"])
    R, t, rms = refine_relative_pose(
        jnp.asarray(s["R2"], jnp.float32)[None],
        jnp.asarray(t_gt, jnp.float32)[None],
        jnp.asarray(s["p1"], jnp.float32)[None],
        jnp.asarray(s["p2"], jnp.float32)[None],
        K[None], K[None], jnp.ones((1, 80), jnp.float32),
    )
    assert _ang(np.asarray(R[0]), s["R2"]) < 0.05
    assert float(np.dot(np.asarray(t[0]), t_gt)) > 0.9999


def test_refine_empty_mask_passthrough(rng):
    s = synthetic_scene(rng, num_points=16)
    K = jnp.asarray(s["K"], jnp.float32)
    R0 = jnp.asarray(s["R2"], jnp.float32)[None]
    t0 = jnp.asarray(s["t2"] / np.linalg.norm(s["t2"]), jnp.float32)[None]
    R, t, _ = refine_relative_pose(
        R0, t0,
        jnp.asarray(s["p1"], jnp.float32)[None],
        jnp.asarray(s["p2"], jnp.float32)[None],
        K[None], K[None], jnp.zeros((1, 16), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(R), np.asarray(R0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=1e-6)
