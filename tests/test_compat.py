"""Reference-compatible API layer: same classes, same contracts, engine math."""

import numpy as np
import pytest

from sfmfromscratch_tpu.compat import (
    BundleAdjustment,
    CameraPose,
    NNRatioFeatureMatcher,
    NaiveSIFT,
    PnP,
    PnPRansac,
    ScaleRotInvSIFT,
    SensorType,
)
from tests.conftest import synthetic_scene


def test_camera_pose_eight_point(scene):
    F = CameraPose._compute_fundamental_matrix(scene["p1"][:8], scene["p2"][:8])
    # Point-line distance on a sample point (pixels).
    x1 = np.append(scene["p1"][0], 1.0)
    x2 = np.append(scene["p2"][0], 1.0)
    l = F @ x1
    d = abs(l @ x2) / np.hypot(l[0], l[1])
    assert d < 2.0  # float32 8-point sanity (precision covered in test_epipolar)


def test_camera_pose_ransac_camera_motion(scene):
    cp = CameraPose(scene["p1"], scene["p2"], scene["K"], scene["K"])
    R, t, in1, in2 = cp.ransac_camera_motion(np.eye(3), np.zeros(3),
                                             max_iterations=400)
    dR = R @ scene["R2"].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0
    assert len(in1) == len(in2) > 30


def test_camera_pose_ransac_too_few_points():
    cp = CameraPose(np.zeros((5, 2)), np.zeros((5, 2)), np.eye(3), np.eye(3))
    assert cp.ransac_camera_motion(np.eye(3), np.zeros(3)) == (None, None, None, None)


def test_find_inliers(scene, rng):
    p2 = scene["p2"].copy()
    p2[-20:] += 80.0
    in1, in2 = CameraPose.find_inliers(scene["p1"], p2, max_iterations=400)
    assert 30 <= len(in1) <= len(scene["p1"]) - 15


def test_triangulate_and_refine(scene):
    P1 = CameraPose.calculate_projection_matrix(scene["R1"], scene["t1"], scene["K"])
    P2 = CameraPose.calculate_projection_matrix(scene["R2"], scene["t2"], scene["K"])
    X = CameraPose.triangulate_points(scene["p1"], scene["p2"], P1, P2)
    np.testing.assert_allclose(X, scene["X"], atol=0.05)
    X1 = CameraPose.triangulate_point(
        np.append(scene["p1"][0], 1), np.append(scene["p2"][0], 1), P1, P2
    )
    np.testing.assert_allclose(X1, scene["X"][0], atol=0.05)
    Xr = CameraPose.non_linear_triangulation(X, scene["p1"], scene["p2"], P1, P2)
    assert Xr.shape == X.shape


def test_num_ransac_iterations():
    assert CameraPose.calculate_num_ransac_iterations(0.98, 8, 0.4) == 5967


def test_project_point_rodrigues(scene):
    import cv2

    rvec, _ = cv2.Rodrigues(scene["R2"])
    p = CameraPose.project_point(scene["X"][0], rvec.ravel(), scene["t2"], scene["K"])
    np.testing.assert_allclose(p, scene["p2"][0], atol=0.1)


def test_compute_reprojection_error(scene):
    err = CameraPose.compute_reprojection_error(
        scene["X"], scene["p2"], scene["R2"], scene["t2"], scene["K"]
    )
    assert err < 0.1


def test_matcher_compat(rng):
    d1 = rng.uniform(0, 1, (60, 128)).astype(np.float32)
    d2 = rng.uniform(0, 1, (70, 128)).astype(np.float32)
    matches, conf = NNRatioFeatureMatcher(0.82).match_features_ratio_test(d1, d2)
    assert matches.shape[1] == 2
    assert (np.diff(conf) >= -1e-6).all()


def test_extractor_compat():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 0.2, (80, 100)).astype(np.float32)
    img[30:42, 40:52] += 0.7
    ext = NaiveSIFT(img, {"num_interest_points": 50, "ksize": 3, "feature_width": 16})
    X, Y = ext.detect_keypoints()
    D = ext.extract_descriptors()
    assert len(X) == len(Y) == len(D)
    assert D.shape[1] == 128
    ext2 = ScaleRotInvSIFT(img, {"num_interest_points": 60, "pyramid_level": 2,
                                 "pyramid_scale_factor": 1.3, "ksize": 3})
    X2, Y2 = ext2.detect_keypoints()
    assert len(X2) > 0


def test_pnp_compat(scene):
    pe = PnPRansac(scene["X"].astype(np.float32), scene["p2"].astype(np.float32),
                   K=scene["K"], ransac_max_it=300)
    assert pe.R is not None
    dR = pe.R @ scene["R2"].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    assert pe.t.shape == (3, 1)
    assert pe.inliers is not None and len(pe.inliers) > 40

    pe2 = PnP(scene["X"].astype(np.float32), scene["p2"].astype(np.float32), K=scene["K"])
    assert pe2.R is not None


def test_pnp_compat_too_few():
    pe = PnPRansac(np.zeros((3, 3), np.float32), np.zeros((3, 2), np.float32), K=np.eye(3))
    assert pe.R is None  # reference contract (PoseEstimator.py:50-51)


def test_bundle_adjustment_compat(rng):
    from tests.test_ba import _multi_view_problem

    problem, _, _ = _multi_view_problem(rng, num_cams=3, num_pts=40, perturb=0.02)
    frames = np.asarray(problem.obs_cam)
    tracks = np.asarray(problem.obs_pt)
    ba = BundleAdjustment(
        num_cameras=problem.num_cameras, num_points=problem.num_points,
        camera_indices=frames, point_indices=tracks,
        points_2d=np.asarray(problem.obs_xy),
        camera_params=np.asarray(problem.cam_params),
        points_3d=np.asarray(problem.points),
        K_list=np.asarray(problem.K),
    )
    cams, pts = ba.sparse_bundle_adjustment(ftol=1e-6)
    assert cams.shape == (3, 6)
    assert pts.shape == (40, 3)
    # residuals API matches the reference layout
    params = np.hstack([cams.ravel(), pts.ravel()])
    r = ba.compute_residuals(params, 3, 40, frames, tracks,
                             np.asarray(problem.obs_xy), np.asarray(problem.K))
    assert r.shape == (len(frames) * 2,)
    assert np.sqrt(np.mean(r**2)) < 2.0


@pytest.mark.slow
def test_sfmrunner_compat_end_to_end(tmp_path):
    """compat.SFMRunner: reference constructor signature, reference-style
    attributes populated after the run (Runner.py:128-177 contract)."""
    from tests.render import render_sequence, write_sequence
    from sfmfromscratch_tpu.compat import SFMRunner

    images, K, poses, X = render_sequence(
        np.random.default_rng(21), num_views=3, num_points=90, img_hw=(160, 220), f=300.0,
        step_t=(-0.2, 0.02, 0.03), step_r=(0.008, -0.02, 0.005),
    )
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)
    K_half = K.copy()
    K_half[:2] *= 0.5  # SFMRunner works at the reference's 0.5 prescale

    params = {"num_interest_points": 300, "ksize": 3, "feature_width": 16,
              "pyramid_level": 2, "pyramid_scale_factor": 1.2, "sigma": 3.0}
    runner = SFMRunner(str(d), 3, params, match_threshold=0.85,
                       single_K=K_half, model_name="compat_model",
                       output_dir=str(tmp_path / "out"))
    # Reference-style state
    assert len(runner.global_points_3D) > 20
    assert len(runner.global_points_2D) == len(runner.frame_indices)
    assert len(runner.point_indices) == len(runner.frame_indices)
    assert len(runner.global_poses) == 2
    assert runner.global_poses[0][0].shape == (3, 1)  # rodrigues column
    assert (tmp_path / "out" / "compat_model.npz").exists()
    data = SFMRunner.load("compat_model", output_dir=str(tmp_path / "out"), show=False)
    assert data["p3d"].shape[1] == 3


def test_matches_record_and_util(scene, capsys):
    """Matches container (Runner.py:118-125) + Util helpers (Util.py:7-82)."""
    from sfmfromscratch_tpu.compat import Matches, print_reprojection_error

    m = Matches(np.array([[0, 1]]), np.array([0.9]),
                np.array([[1.0, 2.0]]), np.array([[3.0, 4.0]]))
    assert m.matches.shape == (1, 2) and m.K1 is None

    K = scene["K"]
    P1 = K @ np.concatenate([scene["R1"], scene["t1"][:, None]], axis=1)
    P2 = K @ np.concatenate([scene["R2"], scene["t2"][:, None]], axis=1)
    err = print_reprojection_error(scene["X"], scene["p1"], scene["p2"], P1, P2)
    out = capsys.readouterr().out
    assert "Mean reprojection error" in out
    assert err < 1e-2  # exact synthetic projections


def test_camera_pose_ransac_noncanonical_base(rng):
    """Non-canonical base poses follow the reference's cheirality semantics
    (SFM.py:38-44, 105-124): the base enters only the depth check, which the
    reference applies to the candidate (R, t) decomposed from E — i.e. the
    RELATIVE pose R_rel = R2 @ R_base^T — so that is what both implementations
    return (verified against the actual reference in the golden test below)."""
    from scipy.spatial.transform import Rotation

    Rb = Rotation.from_rotvec([0.05, 0.3, -0.04]).as_matrix()
    tb = np.zeros(3)
    R2 = Rotation.from_rotvec([0.02, 0.55, 0.01]).as_matrix()
    t2 = np.array([-0.9, 0.06, 0.12])
    K = np.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1.0]])

    n = 60
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(5.0, 9.0, n)], axis=1)
    # Points positioned so both cameras see them with positive depth.
    def project(X, R, t):
        c = X @ R.T + t
        assert (c[:, 2] > 0.1).all()
        p = c @ K.T
        return p[:, :2] / p[:, 2:3]

    p1 = project(X, Rb, tb)
    p2 = project(X, R2, t2)

    cp = CameraPose(p1, p2, K, K)
    R, t, in1, in2 = cp.ransac_camera_motion(Rb, tb, max_iterations=400)
    assert R is not None
    R_rel = R2 @ Rb.T
    dR = R @ R_rel.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0
    # Translation direction matches the true relative translation (t_rel = t2
    # when t_base = 0) up to the E-decomposition's unit scale and sign (the
    # reference's own depth check accepts either sign here).
    cos = abs(t @ t2) / (np.linalg.norm(t) * np.linalg.norm(t2))
    assert cos > 0.99
    assert len(in1) == len(in2) > 40


def test_camera_pose_ransac_noncanonical_base_vs_reference(rng):
    """Golden: the actual reference ransac_camera_motion with a non-canonical
    base pose agrees with ours on pose and inlier support."""
    import os, sys
    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    from scipy.spatial.transform import Rotation

    Rb = Rotation.from_rotvec([0.05, 0.3, -0.04]).as_matrix()
    tb = np.zeros(3)
    R2 = Rotation.from_rotvec([0.02, 0.55, 0.01]).as_matrix()
    t2 = np.array([-0.9, 0.06, 0.12])
    K = np.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1.0]])
    n = 50
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(5.0, 9.0, n)], axis=1)
    p1 = (X @ Rb.T + tb) @ K.T
    p1 = p1[:, :2] / p1[:, 2:3]
    p2 = (X @ R2.T + t2) @ K.T
    p2 = p2[:, :2] / p2[:, 2:3]

    sys.path.insert(0, REF)
    try:
        from SFM import CameraPose as RefCameraPose
        ref_cp = RefCameraPose(p1, p2, K, K)
        R_ref, t_ref, rin1, _ = ref_cp.ransac_camera_motion(Rb, tb, max_iterations=60)
    finally:
        sys.path.remove(REF)

    cp = CameraPose(p1, p2, K, K)
    R, t, in1, _ = cp.ransac_camera_motion(Rb, tb, max_iterations=400)

    assert R_ref is not None and R is not None
    dR = R @ R_ref.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    # Sign-insensitive: the two implementations enumerate the +-t candidates
    # in different orders and the reference's depth check passes both here.
    cos = abs(t @ t_ref) / (np.linalg.norm(t) * np.linalg.norm(t_ref))
    assert cos > 0.999
    # Noise-free scene: both find (nearly) all correspondences as inliers.
    assert len(rin1) >= 0.9 * n and len(in1) >= 0.9 * n
