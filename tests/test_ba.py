import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.ba.problem import (
    make_problem,
    residuals,
    mean_reprojection_error,
    total_cost,
)
from sfmfromscratch_tpu.ba.lm import bundle_adjust
from sfmfromscratch_tpu.ba.schur import (
    build_normal_blocks,
    schur_matvec,
    solve_schur,
)
from sfmfromscratch_tpu.ba.problem import jacobian_blocks
from sfmfromscratch_tpu.ops.lie import so3_log


def _multi_view_problem(rng, num_cams=4, num_pts=60, noise=0.0, perturb=0.0,
                        motion_scale=1.0):
    """Synthetic multi-view scene in reference layout; optionally perturb the
    initial estimate so BA has work to do.  ``motion_scale`` shrinks the
    per-camera motion step — needed for large ``num_cams`` (at scale 1 the
    cumulative rotation passes 2 rad by camera 40 and the projections are
    garbage)."""
    from scipy.spatial.transform import Rotation

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    X = np.stack(
        [rng.uniform(-2, 2, num_pts), rng.uniform(-1.5, 1.5, num_pts), rng.uniform(5, 9, num_pts)],
        axis=1,
    )
    cams = []
    for c in range(num_cams):
        rv = np.array([0.02, -0.05, 0.01]) * c * motion_scale
        t = np.array([-0.3 * c, 0.02 * c, 0.05 * c]) * motion_scale
        cams.append((Rotation.from_rotvec(rv).as_matrix(), t, rv))

    obs_cam, obs_pt, obs_xy = [], [], []
    for ci, (R, t, _) in enumerate(cams):
        pc = X @ R.T + t
        pix = pc @ K.T
        pix = pix[:, :2] / pix[:, 2:3]
        for pi in range(num_pts):
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_xy.append(pix[pi] + noise * rng.standard_normal(2))

    cam_params = np.array([np.hstack([rv, t]) for (_, t, rv) in cams])
    cam_params_init = cam_params + perturb * rng.standard_normal(cam_params.shape)
    X_init = X + perturb * rng.standard_normal(X.shape)
    # Gauge: fix the first camera at its true pose.
    cam_params_init[0] = cam_params[0]
    cam_fixed = np.zeros(num_cams, bool)
    cam_fixed[0] = True

    problem = make_problem(
        cam_params_init, X_init, np.array(obs_cam), np.array(obs_pt),
        np.array(obs_xy), np.stack([K] * num_cams), cam_fixed=cam_fixed,
    )
    return problem, cam_params, X


def test_residuals_zero_at_truth(rng):
    problem, cams_gt, X_gt = _multi_view_problem(rng)
    r = residuals(problem, jnp.asarray(cams_gt, jnp.float32), jnp.asarray(X_gt, jnp.float32))
    assert float(jnp.abs(r).max()) < 2e-2


def test_schur_matvec_matches_dense(rng):
    """The matrix-free S x must equal the dense U - W V^-1 W' matvec."""
    problem, _, _ = _multi_view_problem(rng, num_cams=3, num_pts=10, perturb=0.05)
    Jc, Jp, r = jacobian_blocks(problem, problem.cam_params, problem.points)
    op = build_normal_blocks(
        Jc, Jp, r, problem.obs_cam, problem.obs_pt,
        problem.num_cameras, problem.num_points, jnp.asarray(1e-3),
    )
    C = problem.num_cameras
    # Dense S assembled the slow way.
    W = np.asarray(op.W, np.float64)
    Vinv = np.asarray(op.Vinv, np.float64)
    U = np.asarray(op.U, np.float64)
    oc = np.asarray(op.obs_cam)
    opt = np.asarray(op.obs_pt)
    S = np.zeros((C * 6, C * 6))
    for c in range(C):
        S[c * 6 : c * 6 + 6, c * 6 : c * 6 + 6] = U[c]
    P = problem.num_points
    for p in range(P):
        obs = np.where(opt == p)[0]
        for o1 in obs:
            for o2 in obs:
                c1, c2 = oc[o1], oc[o2]
                S[c1 * 6 : c1 * 6 + 6, c2 * 6 : c2 * 6 + 6] -= W[o1] @ Vinv[p] @ W[o2].T

    x = rng.standard_normal((C, 6)).astype(np.float32)
    got = np.asarray(schur_matvec(op, jnp.asarray(x)))
    want = (S @ x.reshape(-1).astype(np.float64)).reshape(C, 6)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * np.abs(want).max())


def test_ba_recovers_perturbed_scene(rng):
    problem, cams_gt, X_gt = _multi_view_problem(rng, perturb=0.03, noise=0.0)
    err_before = float(mean_reprojection_error(problem))
    res = bundle_adjust(problem, max_iters=25, cg_iters=40, ftol=1e-6)
    err_after = float(res.final_mean_error)
    assert err_before > 1.0          # the perturbation actually hurt
    assert err_after < 0.1 * err_before
    assert err_after < 0.5


def test_ba_monotone_and_noise_floor(rng):
    problem, _, _ = _multi_view_problem(rng, perturb=0.02, noise=0.5)
    res = bundle_adjust(problem, max_iters=25, cg_iters=40, ftol=1e-8)
    assert float(res.final_cost) <= float(res.initial_cost)
    # With 0.5 px observation noise, converged error should be ~noise level.
    assert float(res.final_mean_error) < 2.0


def test_ba_respects_fixed_camera(rng):
    problem, cams_gt, _ = _multi_view_problem(rng, perturb=0.03)
    res = bundle_adjust(problem, max_iters=10, cg_iters=30)
    np.testing.assert_array_equal(
        np.asarray(res.cam_params[0]), np.asarray(problem.cam_params[0])
    )


def test_ba_handles_padded_observations(rng):
    """Zero-weight (padding) observations must not affect the solution."""
    problem, _, _ = _multi_view_problem(rng, perturb=0.02)
    O = problem.num_obs
    pad = 32
    padded = make_problem(
        np.asarray(problem.cam_params),
        np.asarray(problem.points),
        np.concatenate([np.asarray(problem.obs_cam), np.zeros(pad, np.int32)]),
        np.concatenate([np.asarray(problem.obs_pt), np.zeros(pad, np.int32)]),
        np.concatenate([np.asarray(problem.obs_xy), np.full((pad, 2), 1e5, np.float32)]),
        np.asarray(problem.K),
        obs_weights=np.concatenate([np.ones(O, np.float32), np.zeros(pad, np.float32)]),
        cam_fixed=np.asarray(problem.cam_fixed),
    )
    # One LM step compared tightly (float32 segment-sum order differs slightly;
    # multi-step chaos would amplify it).
    res_a = bundle_adjust(problem, max_iters=1, cg_iters=30)
    res_b = bundle_adjust(padded, max_iters=1, cg_iters=30)
    np.testing.assert_allclose(
        np.asarray(res_a.points), np.asarray(res_b.points), rtol=5e-3, atol=5e-4
    )
    # And the full runs converge to the same quality.
    full_a = bundle_adjust(problem, max_iters=8, cg_iters=30)
    full_b = bundle_adjust(padded, max_iters=8, cg_iters=30)
    assert abs(float(full_a.final_mean_error) - float(full_b.final_mean_error)) < 0.05


def test_dense_vs_cg_schur_agreement(rng):
    """solve_schur_dense and the matrix-free PCG solve_schur are two backends
    for the SAME reduced camera system: on one set of SchurOperands, with CG
    run tight, the camera and point steps must agree (r4 ADVICE: the suite
    previously exercised only whichever backend the gate picked)."""
    from sfmfromscratch_tpu.ba.schur import solve_schur_dense

    problem, _, _ = _multi_view_problem(rng, num_cams=6, num_pts=40, perturb=0.05)
    Jc, Jp, r = jacobian_blocks(problem, problem.cam_params, problem.points)
    op = build_normal_blocks(
        Jc, Jp, r, problem.obs_cam, problem.obs_pt,
        problem.num_cameras, problem.num_points, jnp.asarray(1e-3),
    )
    dc_d, dp_d = solve_schur_dense(op)
    dc_c, dp_c = solve_schur(op, cg_iters=400, tol_rel=0.0)
    scale = float(jnp.abs(dc_d).max())
    np.testing.assert_allclose(np.asarray(dc_c), np.asarray(dc_d),
                               rtol=1e-3, atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(dp_c), np.asarray(dp_d),
                               rtol=1e-3, atol=1e-3 * float(jnp.abs(dp_d).max()))


@pytest.mark.parametrize("use_dense", [True, False])
def test_ba_backend_parity(rng, use_dense):
    """Full LM runs on both Schur backends converge to the same quality
    (explicit ``use_dense`` override — the supported way to A/B the backends;
    ``SFM_NO_DENSE_SCHUR`` resolves to the same flag outside jit)."""
    problem, _, _ = _multi_view_problem(rng, perturb=0.03)
    res = bundle_adjust(problem, max_iters=25, cg_iters=80, ftol=1e-8,
                        use_dense=use_dense)
    assert float(res.final_mean_error) < 0.05


def test_ba_beyond_dense_gate_uses_cg(rng):
    """A 40-camera problem exceeds DENSE_SCHUR_MAX_CAMS: the auto gate picks
    the matrix-free PCG path (the production solver for large C and the
    multichip scaling story) and still converges."""
    from sfmfromscratch_tpu.ba.lm import resolve_dense
    from sfmfromscratch_tpu.ba.schur import dense_gate

    problem, _, _ = _multi_view_problem(rng, num_cams=40, num_pts=80,
                                        perturb=0.02, motion_scale=0.15)
    assert not dense_gate(problem.num_cameras, problem.num_points)
    assert not resolve_dense(None, problem.num_cameras, problem.num_points)
    res = bundle_adjust(problem, max_iters=20, cg_iters=60, ftol=1e-8)
    assert float(res.final_mean_error) < 0.1


def test_dense_gate_bounds_points():
    """The dense gate must also bound P: point_cam_blocks materializes
    (P*C, 3, 6) + a (P, 3, 6C) intermediate every LM iteration, so a C<=32
    scene with a huge padded point count must fall back to matrix-free PCG
    (r4 ADVICE item 2)."""
    from sfmfromscratch_tpu.ba.schur import dense_gate

    assert dense_gate(16, 1024)
    assert not dense_gate(16, 10_000_000)
    assert not dense_gate(64, 128)


def _focal_observable_problem(rng, focal_error=1.06):
    """A scene where a shared focal-scale error is observable: 8 cameras with
    rotation + forward/lateral motion, 300 points, 0.3 px noise, K wrong by
    ``focal_error``. Shared by the single-device and sharded selfcal tests."""
    from scipy.spatial.transform import Rotation

    C, Pn = 8, 300
    K_true = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    X = np.stack([rng.uniform(-3, 3, Pn), rng.uniform(-2, 2, Pn),
                  rng.uniform(3, 12, Pn)], 1)
    cams = []
    for c in range(C):
        rv = np.array([0.05, -0.12, 0.03]) * c
        t = np.array([-0.5 * c, 0.05 * c, 0.3 * c])
        cams.append((Rotation.from_rotvec(rv).as_matrix(), t, rv))
    obs_cam, obs_pt, obs_xy = [], [], []
    for ci, (R, t, _) in enumerate(cams):
        pc = X @ R.T + t
        pix = pc @ K_true.T
        uv = pix[:, :2] / pix[:, 2:3]
        for pi in range(Pn):
            if pc[pi, 2] > 0.5 and 0 < uv[pi, 0] < 640 and 0 < uv[pi, 1] < 480:
                obs_cam.append(ci)
                obs_pt.append(pi)
                obs_xy.append(uv[pi] + rng.normal(0, 0.3, 2))
    cam_params = np.array([np.hstack([rv, t]) for (_, t, rv) in cams])
    cam_fixed = np.zeros(C, bool)
    cam_fixed[0] = True
    K_wrong = K_true.copy()
    K_wrong[0, 0] *= focal_error
    K_wrong[1, 1] *= focal_error
    return make_problem(cam_params, X, np.array(obs_cam),
                        np.array(obs_pt), np.array(obs_xy),
                        np.stack([K_wrong] * C), cam_fixed=cam_fixed)


def test_selfcal_recovers_focal_scale(rng):
    """Joint focal-scale BA (bordered Schur, ba/selfcal.py) recovers a 6%
    focal error to within ~1% on a focal-observable scene — where fixed-K BA
    plateaus above the noise floor. (Alternating a 1-D refit with fixed-K BA
    provably cannot: the converged poses absorb the focal error and the
    focal gradient vanishes.)"""
    from sfmfromscratch_tpu.ba.selfcal import bundle_adjust_selfcal

    problem = _focal_observable_problem(rng)

    res_fixed = bundle_adjust(problem, max_iters=30, cg_iters=60, ftol=1e-12)
    res_cal, s = bundle_adjust_selfcal(problem, max_iters=30, cg_iters=60,
                                       ftol=1e-12)
    assert abs(float(s) - 1 / 1.06) < 0.01
    assert float(res_cal.final_mean_error) < float(res_fixed.final_mean_error)
    assert float(res_cal.final_mean_error) < 0.35   # at the 0.3 px noise floor
