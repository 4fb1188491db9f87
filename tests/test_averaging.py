"""Rotation / translation averaging + multiview triangulation (global SfM core)."""

import numpy as np
import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.geometry.averaging import (
    chain_initial_centers,
    chain_initial_rotations,
    rotation_averaging,
    translation_averaging,
)
from sfmfromscratch_tpu.geometry.triangulation import triangulate_multiview


def _rand_rot(rng, scale=1.0):
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    th = rng.uniform(0, scale)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _make_graph(rng, C=12, extra=14, noise=0.0, outliers=0):
    """Random absolute poses + window-1 chain edges + random extra edges."""
    R_abs = [np.eye(3)]
    for _ in range(C - 1):
        R_abs.append(_rand_rot(rng, 0.6) @ R_abs[-1])
    R_abs = np.stack(R_abs)
    c_abs = rng.uniform(-3, 3, (C, 3))
    c_abs[0] = 0
    edges = [(i, i + 1) for i in range(C - 1)]
    while len(edges) < C - 1 + extra:
        i, j = rng.integers(0, C, 2)
        if i != j and (min(i, j), max(i, j)) not in edges:
            edges.append((min(i, j), max(i, j)))
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    R_rel = np.stack([
        _rand_rot(rng, noise) @ R_abs[j] @ R_abs[i].T for i, j in edges
    ])
    u = c_abs[ei] - c_abs[ej]
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    if outliers:
        # Corrupt only non-chain ("extra") edges — the realistic failure mode:
        # consecutive window edges are RANSAC-verified with strong support,
        # while loop-closure candidates are where gross outliers arise. The
        # spanning-chain init therefore uses chain edges only (as the global
        # pipeline does).
        bad = C - 1 + rng.choice(extra, outliers, replace=False)
        for b in bad:
            R_rel[b] = _rand_rot(rng, 3.0) @ R_rel[b]
            u[b] = rng.normal(size=3)
            u[b] /= np.linalg.norm(u[b])
    return R_abs, c_abs, R_rel, u, ei, ej


def _rot_err_deg(Ra, Rb):
    """Max angular error after removing the global gauge (align camera 0)."""
    G = Rb[0].T @ Ra[0]
    errs = []
    for A, B in zip(Ra, Rb):
        dR = A @ (B @ G).T
        errs.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
    return max(errs)


def test_rotation_averaging_clean(rng):
    R_abs, _, R_rel, _, ei, ej = _make_graph(rng)
    R0 = chain_initial_rotations(jnp.asarray(R_rel, jnp.float32), ei, ej, len(R_abs))
    R = rotation_averaging(
        jnp.asarray(R_rel, jnp.float32), jnp.asarray(ei), jnp.asarray(ej), R0,
        num_cameras=len(R_abs),
    )
    assert _rot_err_deg(np.asarray(R), R_abs) < 0.1


def test_rotation_averaging_outlier_edges(rng):
    R_abs, _, R_rel, _, ei, ej = _make_graph(rng, noise=0.01, outliers=4)
    C = len(R_abs)
    R0 = chain_initial_rotations(
        jnp.asarray(R_rel[: C - 1], jnp.float32), ei[: C - 1], ej[: C - 1], C
    )
    R = rotation_averaging(
        jnp.asarray(R_rel, jnp.float32), jnp.asarray(ei), jnp.asarray(ej), R0,
        num_cameras=C, num_iters=64,
    )
    # The annealed Huber->L1 IRLS must hold the inlier consensus against the
    # corrupted loop-closure edges.
    assert _rot_err_deg(np.asarray(R), R_abs) < 5.0


def test_translation_averaging_clean(rng):
    _, c_abs, _, u, ei, ej = _make_graph(rng)
    c0 = chain_initial_centers(jnp.asarray(u, jnp.float32), ei, ej, len(c_abs))
    c = translation_averaging(
        jnp.asarray(u, jnp.float32), jnp.asarray(ei), jnp.asarray(ej), c0,
        num_cameras=len(c_abs),
    )
    c = np.asarray(c, np.float64)
    # Solution is defined up to global scale (and origin, pinned at cam 0):
    # compare after least-squares scale alignment.
    s = np.sum(c * c_abs) / np.maximum(np.sum(c * c), 1e-12)
    err = np.linalg.norm(s * c - c_abs, axis=-1).max()
    assert err < 0.05 * np.linalg.norm(c_abs, axis=-1).max()


def test_translation_averaging_outliers(rng):
    _, c_abs, _, u, ei, ej = _make_graph(rng, extra=24, outliers=5)
    C = len(c_abs)
    c0 = chain_initial_centers(
        jnp.asarray(u[: C - 1], jnp.float32), ei[: C - 1], ej[: C - 1], C
    )
    c = translation_averaging(
        jnp.asarray(u, jnp.float32), jnp.asarray(ei), jnp.asarray(ej), c0,
        num_cameras=C,
    )
    c = np.asarray(c, np.float64)
    s = np.sum(c * c_abs) / np.maximum(np.sum(c * c), 1e-12)
    err = np.linalg.norm(s * c - c_abs, axis=-1).max()
    # Pre-BA accuracy bar: global BA is the final refiner downstream.
    assert err < 0.2 * np.linalg.norm(c_abs, axis=-1).max()


def test_triangulate_multiview_exact(rng):
    C, Npts = 6, 40
    K = np.array([[700.0, 0, 320], [0, 700, 240], [0, 0, 1]])
    X = rng.uniform(-2, 2, (Npts, 3))
    X[:, 2] += 8
    P_all, obs_cam, obs_pt, obs_xy = [], [], [], []
    for ci in range(C):
        R = _rand_rot(rng, 0.2)
        t = np.array([0.4 * ci - 1, 0.05 * ci, 0.1])
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        P_all.append(P)
        cam = X @ R.T + t
        pix = cam @ K.T
        pix = pix[:, :2] / pix[:, 2:3]
        # Each camera sees a random 70% subset -> ragged tracks.
        sel = rng.random(Npts) < 0.7
        for p in np.nonzero(sel)[0]:
            obs_cam.append(ci), obs_pt.append(p), obs_xy.append(pix[p])
    Xr, nobs = triangulate_multiview(
        jnp.asarray(np.stack(P_all), jnp.float32),
        jnp.asarray(obs_cam, jnp.int32), jnp.asarray(obs_pt, jnp.int32),
        jnp.asarray(np.stack(obs_xy), jnp.float32), num_points=Npts,
    )
    Xr, nobs = np.asarray(Xr), np.asarray(nobs)
    good = nobs >= 2
    assert good.sum() >= Npts * 0.8
    np.testing.assert_allclose(Xr[good], X[good], atol=1e-2)


def test_triangulate_multiview_weights_disable(rng):
    """Zero-weight observations contribute nothing (padding discipline)."""
    K = np.array([[700.0, 0, 320], [0, 700, 240], [0, 0, 1]])
    X = np.array([[0.5, -0.2, 7.0]])
    P1 = K @ np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    R2 = _rand_rot(np.random.default_rng(3), 0.3)
    t2 = np.array([-1.0, 0.1, 0.05])
    P2 = K @ np.concatenate([R2, t2[:, None]], axis=1)
    def proj(P):
        h = P @ np.append(X[0], 1.0)
        return h[:2] / h[2]
    obs_xy = np.stack([proj(P1), proj(P2), np.array([9999.0, 9999.0])])
    Xr, nobs = triangulate_multiview(
        jnp.asarray(np.stack([P1, P2]), jnp.float32),
        jnp.asarray([0, 1, 0], jnp.int32), jnp.asarray([0, 0, 0], jnp.int32),
        jnp.asarray(obs_xy, jnp.float32), num_points=1,
        obs_w=jnp.asarray([1.0, 1.0, 0.0]),
    )
    np.testing.assert_allclose(np.asarray(Xr)[0], X[0], atol=1e-2)
    assert int(np.asarray(nobs)[0]) == 2


def test_chordal_init_large_diameter_graph():
    """The chordal CG solve must absorb spanning-chain drift that Jacobi
    sweeps cannot reach on a large-diameter view graph (C=400 near-chain):
    the whole reason it exists (see geometry/averaging.py docstring)."""
    from scipy.spatial.transform import Rotation

    from sfmfromscratch_tpu.geometry.averaging import (
        chain_initial_rotations,
        chordal_rotation_init,
    )

    rng = np.random.default_rng(0)
    C = 400
    # ground truth: smooth orbit rotations
    Rs = [
        Rotation.from_rotvec([0.0, np.radians(0.9) * i, 0.0]).as_matrix()
        for i in range(C)
    ]
    ei, ej = [], []
    for i in range(C):
        for d in (1, 2):
            if i + d < C:
                ei.append(i), ej.append(i + d)
    # sparse long-range loop closures: the information that bounds global
    # drift, which single-hop Jacobi sweeps cannot exploit across hundreds of
    # hops but the chordal CG solve can.
    for i in range(0, C - C // 3, 25):
        ei.append(i), ej.append(i + C // 3)
    ei = np.asarray(ei, np.int32)
    ej = np.asarray(ej, np.int32)
    R_rel = np.stack([
        Rotation.from_rotvec(rng.normal(0, np.radians(0.3), 3)).as_matrix()
        @ (Rs[j] @ Rs[i].T)
        for i, j in zip(ei, ej)
    ]).astype(np.float32)

    R0 = chain_initial_rotations(jnp.asarray(R_rel), jnp.asarray(ei),
                                 jnp.asarray(ej), C)
    R = chordal_rotation_init(jnp.asarray(R_rel), jnp.asarray(ei),
                              jnp.asarray(ej), R0, num_cameras=C,
                              cg_iters=1024)

    def med_err(R_est):
        R_est = np.asarray(R_est, np.float64)
        A = Rs[0].T @ R_est[0]
        errs = []
        for k in range(C):
            cosang = (np.trace(Rs[k] @ (R_est[k] @ A.T).T) - 1) / 2
            errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        return float(np.median(errs))

    assert med_err(R0) > 2.0          # the chain walk really does drift
    assert med_err(R) < med_err(R0) / 3
    assert med_err(R) < 1.5
    # orthonormality of the projected output
    RtR = np.einsum("cij,cik->cjk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (C, 1, 1)), atol=1e-4)
