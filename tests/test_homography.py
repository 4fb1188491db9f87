"""Planar-degenerate two-view handling (geometry/homography.py).

No reference counterpart: the reference's 8-point/essential pipeline
(SFM.py:38-103) silently returns wrong poses on plane-dominant pairs (cv2's
findEssentialMat + recoverPose measures 14 deg off on the plane renderer);
these tests pin the homography fit, the Faugeras decomposition, the twofold
-ambiguity contract, and the off-plane disambiguator.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from sfmfromscratch_tpu.geometry.homography import (
    candidate_epipolar_rms,
    fit_homography,
    pose_from_homography,
    pose_from_homography_batch,
    _transfer_err2,
)

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])
R_GT = Rotation.from_rotvec([0.05, -0.2, 0.03]).as_matrix()
T_GT = np.array([-0.6, 0.1, 0.15])


def _project(X, R, t):
    c = X @ R.T + t
    p = c @ K.T
    return p[:, :2] / p[:, 2:3]


def _scene(rng, n_plane=100, n_off=0, noise=0.0):
    xy = rng.uniform(-2, 2, (n_plane, 2))
    z = 5 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]
    X = np.column_stack([xy, z])
    if n_off:
        Xo = np.column_stack(
            [rng.uniform(-2, 2, (n_off, 2)), rng.uniform(3.5, 8.5, n_off)]
        )
        X = np.vstack([X, Xo])
    p1 = _project(X, np.eye(3), np.zeros(3))
    p2 = _project(X, R_GT, T_GT)
    if noise:
        p1 = p1 + noise * rng.standard_normal(p1.shape)
        p2 = p2 + noise * rng.standard_normal(p2.shape)
    return p1, p2


def _rot_err_deg(Ra, Rb):
    return np.degrees(
        np.arccos(np.clip((np.trace(Ra @ Rb.T) - 1) / 2, -1, 1))
    )


f32 = lambda a: jnp.asarray(a, jnp.float32)


def test_fit_homography_planar():
    rng = np.random.default_rng(0)
    p1, p2 = _scene(rng)
    mask = np.ones(len(p1), bool)
    fit = fit_homography(f32(p1), f32(p2), jnp.asarray(mask))
    assert bool(fit.ok)
    assert int(fit.num_inliers) == len(p1)
    e2 = np.asarray(_transfer_err2(fit.H, f32(p1), f32(p2)))
    assert float(np.max(e2)) < 0.1  # sub-pixel transfer on exact data


def test_fit_homography_rejects_off_plane():
    rng = np.random.default_rng(1)
    p1, p2 = _scene(rng, n_plane=90, n_off=40)
    mask = np.ones(len(p1), bool)
    fit = fit_homography(f32(p1), f32(p2), jnp.asarray(mask))
    n = int(fit.num_inliers)
    assert 80 <= n <= 100  # the plane, not the off-plane points


def test_pose_from_homography_candidates_contain_truth():
    """The twofold-ambiguity contract: on a FULLY planar support the true
    pose must be among the top-2 candidates (either slot)."""
    rng = np.random.default_rng(2)
    p1, p2 = _scene(rng)
    mask = np.ones(len(p1), bool)
    fit = fit_homography(f32(p1), f32(p2), jnp.asarray(mask))
    pose = pose_from_homography(fit.H, f32(K), f32(K), f32(p1), f32(p2),
                                jnp.asarray(mask))
    errs = [_rot_err_deg(R_GT, np.asarray(pose.R)[c]) for c in range(2)]
    assert bool(pose.ok)
    assert min(errs) < 0.3, errs


def test_off_plane_disambiguation():
    """With off-plane structure, epipolar rms separates the two candidates
    decisively and picks the true pose."""
    rng = np.random.default_rng(3)
    p1, p2 = _scene(rng, n_plane=100, n_off=30)
    mask = np.ones(len(p1), bool)
    fit = fit_homography(f32(p1), f32(p2), jnp.asarray(mask))
    pose = pose_from_homography(fit.H, f32(K), f32(K), f32(p1), f32(p2),
                                jnp.asarray(mask))
    e2 = np.asarray(_transfer_err2(fit.H, f32(p1), f32(p2)))
    off = jnp.asarray((e2 > 4.0) & mask)
    rms, cnt = candidate_epipolar_rms(
        pose.R, pose.t, f32(K), f32(K), f32(p1), f32(p2), off
    )
    rms = np.asarray(rms)
    assert float(cnt) >= 20
    c = int(np.argmin(rms))
    assert rms[1 - c] > 5.0 * rms[c] + 0.5  # decisive separation
    assert _rot_err_deg(R_GT, np.asarray(pose.R)[c]) < 0.3
    t_est = np.asarray(pose.t)[c]
    t_dir = np.degrees(
        np.arccos(abs(np.dot(t_est, T_GT / np.linalg.norm(T_GT))))
    )
    assert t_dir < 1.0


def test_pose_from_homography_batch_matches_single():
    rng = np.random.default_rng(4)
    edges = []
    for _ in range(3):
        p1, p2 = _scene(rng, n_plane=80, n_off=10)
        edges.append((p1, p2))
    H = jnp.stack([
        fit_homography(f32(p1), f32(p2), jnp.ones(len(p1), bool)).H
        for p1, p2 in edges
    ])
    p1s = jnp.stack([f32(p1) for p1, _ in edges])
    p2s = jnp.stack([f32(p2) for _, p2 in edges])
    Ks = jnp.stack([f32(K)] * 3)
    masks = jnp.ones((3, p1s.shape[1]), bool)
    batch = pose_from_homography_batch(H, Ks, Ks, p1s, p2s, masks)
    for e, (p1, p2) in enumerate(edges):
        single = pose_from_homography(
            H[e], f32(K), f32(K), f32(p1), f32(p2), masks[e]
        )
        np.testing.assert_allclose(
            np.asarray(batch.R)[e], np.asarray(single.R), atol=1e-5
        )


def test_noisy_planar_pose_beats_essential():
    """On a noisy plane-dominant pair, pose-from-H (with off-plane pick)
    lands within 1 deg where the essential pipeline is unconstrained."""
    rng = np.random.default_rng(5)
    p1, p2 = _scene(rng, n_plane=120, n_off=20, noise=0.3)
    mask = np.ones(len(p1), bool)
    fit = fit_homography(f32(p1), f32(p2), jnp.asarray(mask), threshold=3.0)
    pose = pose_from_homography(fit.H, f32(K), f32(K), f32(p1), f32(p2),
                                jnp.asarray(mask))
    e2 = np.asarray(_transfer_err2(fit.H, f32(p1), f32(p2)))
    off = jnp.asarray((e2 > 9.0) & mask)
    rms, cnt = candidate_epipolar_rms(
        pose.R, pose.t, f32(K), f32(K), f32(p1), f32(p2), off
    )
    c = int(np.argmin(np.asarray(rms)))
    assert _rot_err_deg(R_GT, np.asarray(pose.R)[c]) < 1.0
