import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.geometry.p3p import p3p_poses, quartic_roots
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


def test_quartic_roots_vs_numpy(rng):
    """Closed-form quartic solver agrees with numpy.roots on random quartics."""
    for _ in range(20):
        c = rng.normal(size=5)
        r_np = np.roots(c)
        r_np = np.sort(r_np[np.abs(r_np.imag) < 1e-6].real)
        r, v = quartic_roots(jnp.asarray(c, jnp.float32))
        r = np.sort(np.asarray(r)[np.asarray(v)])
        assert len(r) >= len(r_np) - 1  # marginal double roots may be dropped
        if len(r) == len(r_np) and len(r_np):
            np.testing.assert_allclose(r, r_np, atol=2e-3 * max(1, np.abs(r_np).max()))


def test_p3p_recovers_exact_pose(rng):
    """Grunert P3P recovers a noise-free pose among its <=4 candidates in the
    vast majority of random configurations (float32 quartics lose the rare
    near-degenerate sample — RANSAC absorbs that)."""
    K = np.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]], np.float32)
    B = 256
    Rs, ts, Xws, pixs = [], [], [], []
    for _ in range(B):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        th = rng.uniform(0, 2.5)
        Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
        t = rng.normal(size=3)
        Xc = rng.uniform(-2, 2, size=(3, 3))
        Xc[:, 2] += 6
        Xw = (Xc - t) @ R
        pix = Xc @ K.T
        pix = pix[:, :2] / pix[:, 2:3]
        Rs.append(R), ts.append(t), Xws.append(Xw), pixs.append(pix)
    Rr, tr, vr = jax.jit(p3p_poses)(
        _f32(np.stack(Xws)), _f32(np.stack(pixs)), _f32(K)
    )
    err = np.linalg.norm(np.asarray(Rr) - np.stack(Rs)[:, None], axis=(2, 3))
    err += np.linalg.norm(np.asarray(tr) - np.stack(ts)[:, None], axis=2)
    best = np.where(np.asarray(vr), err, np.inf).min(axis=1)
    assert np.median(best) < 1e-3
    assert (best < 1e-2).mean() > 0.9


def test_pnp_ransac_dlt_solver_still_works(rng):
    sc = synthetic_scene(rng, num_points=60, noise=0.2)
    res = pnp_ransac(
        jax.random.key(0), _f32(sc["X"]), _f32(sc["p2"]), _f32(sc["K"]),
        num_hypotheses=600, solver="dlt",
    )
    assert bool(res.ok)
    assert _angle_deg(np.asarray(res.R), sc["R2"]) < 1.5


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
