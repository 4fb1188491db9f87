"""Demo-scale golden parity vs the reference (VERDICT round-1 item 3).

Unit level (default suite): head-to-head descriptor and matcher goldens
against the reference's own ``ScaleRotInvSIFT`` / ``NNRatioFeatureMatcher``
(ScaleRotInvSIFT.py:33-87, NNRatioFeatureMatcher.py:31-58) on identical
realistic rendered images at the reference demo's parameters
(main.py:19-28: feature_width=18, 3 pyramid levels x1.1, ratio 0.85).

End-to-end (set GOLDEN_DEMO=1, ~8-12 min): both full pipelines on the same
6-view sequence at demo parameters, comparing reprojection RMSE *and* ATE at
a 1.1x bound. Two of the reference's optimizer loops are capped so the run
stays tractable (they are dense numerical-Jacobian scipy solves over
thousands of parameters driven by per-observation Python loops — hours at
demo scale, and the reason the reference measures 0.0137 frames/s):

* per-pair ``non_linear_triangulation`` (SFM.py:255-289): MINPACK lm capped
  at 1500 function evaluations (a partial refinement pass);
* global ``BundleAdjustment.sparse_bundle_adjustment`` (SFM.py:416-435):
  bypassed (identity) — one trf iteration alone costs n_params numerical-
  Jacobian residual sweeps. The reference also *discards* its optimized
  poses (Runner.py:303-304), so its retained pose state equals the pre-BA
  chain either way.

RANSAC iteration counts are sampled down to 600 (from 5,967) for both
stages the same way bench.py samples them, keeping draw statistics intact.
"""

import os
import sys

import numpy as np
import pytest

from tests.render import render_sequence, write_sequence

REF = "/root/reference"

DEMO_PARAMS = dict(
    num_interest_points=2500, ksize=3, gaussian_size=7, sigma=6,
    alpha=0.05, feature_width=18, pyramid_level=3, pyramid_scale_factor=1.1,
)


def _ref_path():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def demo_pair():
    """Two realistic rendered views at the demo's working resolution."""
    rng = np.random.default_rng(33)
    images, K, poses, X = render_sequence(
        rng, num_views=2, num_points=260, img_hw=(360, 480), patch=13, f=520.0,
        step_t=(-0.12, 0.01, 0.02), step_r=(0.006, -0.015, 0.004),
    )
    return [im.astype(np.float32) for im in images], K


def test_scalerot_descriptor_golden_fw18(demo_pair):
    """Rotation-invariant descriptors head-to-head at the demo's
    feature_width=18 (the 16x16-of-18 window quirk, SURVEY.md §3.4):
    identical image, identical keypoints -> reference ScaleRotInvSIFT
    descriptors vs ours."""
    _ref_path()
    from FeatureExtractor.SIFT.ScaleRotInvSIFT import ScaleRotInvSIFT

    import jax.numpy as jnp
    from sfmfromscratch_tpu.ops.sift import sift_descriptors

    img = demo_pair[0][0]
    ext = ScaleRotInvSIFT(img, dict(DEMO_PARAMS, num_interest_points=300,
                                    pyramid_level=1))
    # Level-0 keypoints from the reference's own Harris.
    X, Y, _ = ext._find_harris_interest_points(img, 200, 18)
    ref_desc = ext._get_SIFT_descriptors(img, X, Y, 18)

    ours = np.asarray(sift_descriptors(
        jnp.asarray(img), jnp.asarray(X, jnp.int32), jnp.asarray(Y, jnp.int32),
        jnp.ones(len(X), bool), feature_width=18, rotation_invariant=True,
    ))
    assert ours.shape == ref_desc.shape
    num = (ours * ref_desc).sum(axis=1)
    den = np.linalg.norm(ours, axis=1) * np.linalg.norm(ref_desc, axis=1) + 1e-12
    cos = num / den
    # Dominant-orientation bin ties under f32-vs-f64 can rotate a few
    # descriptors into a different frame; the bulk must be identical.
    assert np.median(cos) > 0.995
    assert np.mean(cos > 0.95) > 0.85


def test_matcher_golden_on_real_descriptors(demo_pair):
    """Matcher head-to-head at ratio 0.85 on REAL ScaleRotInvSIFT descriptor
    sets (not random vectors): same inputs -> same match set + confidences
    (NNRatioFeatureMatcher.py:31-58)."""
    _ref_path()
    from FeatureExtractor.SIFT.ScaleRotInvSIFT import ScaleRotInvSIFT
    from FeatureMatcher.NNRatioFeatureMatcher import NNRatioFeatureMatcher

    import jax.numpy as jnp
    from sfmfromscratch_tpu.ops.matcher import match_ratio_test

    (im1, im2), _ = demo_pair
    params = dict(DEMO_PARAMS, num_interest_points=600)
    d = []
    for im in (im1, im2):
        ext = ScaleRotInvSIFT(im, params)
        ext.detect_keypoints()
        d.append(np.asarray(ext.extract_descriptors(), np.float32))
    d1, d2 = d
    assert min(len(d1), len(d2)) > 300  # realistic density

    ref_matches, ref_conf = NNRatioFeatureMatcher(0.85).match_features_ratio_test(d1, d2)
    res = match_ratio_test(jnp.asarray(d1), jnp.asarray(d2), ratio_threshold=0.85)
    n = int(np.asarray(res.mask).sum())
    ours_set = {tuple(m) for m in np.asarray(res.indices)[:n]}
    ref_set = {tuple(m) for m in ref_matches}
    # Real descriptor sets contain near-ties at f32 precision; demand 99%
    # agreement both directions rather than exact equality.
    inter = len(ours_set & ref_set)
    assert inter >= 0.99 * len(ref_set)
    assert inter >= 0.99 * len(ours_set)
    np.testing.assert_allclose(
        np.sort(np.asarray(res.confidence)[:n])[: len(ref_conf)][:50],
        np.sort(ref_conf)[:50], atol=1e-3,
    )


@pytest.mark.slow
def test_pyramid_pipeline_match_agreement(demo_pair):
    """Full extractor pipelines (pyramid + rotation invariance + matching)
    side by side on an identical image pair: the two engines' final match
    coordinate sets must substantially agree."""
    _ref_path()
    from FeatureExtractor.SIFT.ScaleRotInvSIFT import ScaleRotInvSIFT
    from FeatureMatcher.NNRatioFeatureMatcher import NNRatioFeatureMatcher

    import jax.numpy as jnp
    from sfmfromscratch_tpu.config import ExtractorConfig
    from sfmfromscratch_tpu.ops.matcher import match_ratio_test
    from sfmfromscratch_tpu.pipeline.frontend import extract_features

    (im1, im2), _ = demo_pair
    params = dict(DEMO_PARAMS, num_interest_points=600)

    # Reference pipeline.
    ref_xy, ref_desc = [], []
    for im in (im1, im2):
        ext = ScaleRotInvSIFT(im, params)
        x, y = ext.detect_keypoints()
        ref_xy.append(np.stack([x, y], 1))
        ref_desc.append(np.asarray(ext.extract_descriptors(), np.float32))
    ref_matches, _ = NNRatioFeatureMatcher(0.85).match_features_ratio_test(*ref_desc)
    ref_p1 = ref_xy[0][ref_matches[:, 0]]
    ref_p2 = ref_xy[1][ref_matches[:, 1]]

    # Our pipeline.
    cfg = ExtractorConfig(
        num_interest_points=600, ksize=3, gaussian_size=7, sigma=6.0,
        alpha=0.05, feature_width=18, pyramid_level=3, pyramid_scale_factor=1.1,
    )
    ours = [extract_features(jnp.asarray(im), cfg) for im in (im1, im2)]
    res = match_ratio_test(
        ours[0].descriptors, ours[1].descriptors,
        ours[0].keypoints.mask, ours[1].keypoints.mask, ratio_threshold=0.85,
    )
    n = int(np.asarray(res.mask).sum())
    idx = np.asarray(res.indices)[:n]
    p1 = np.stack([np.asarray(ours[0].keypoints.x)[idx[:, 0]],
                   np.asarray(ours[0].keypoints.y)[idx[:, 0]]], 1)
    p2 = np.stack([np.asarray(ours[1].keypoints.x)[idx[:, 1]],
                   np.asarray(ours[1].keypoints.y)[idx[:, 1]]], 1)

    assert len(ref_p1) > 100 and len(p1) > 100

    # Fraction of our matches whose both endpoints land within 2 px of a
    # reference match's endpoints.
    d1 = np.linalg.norm(p1[:, None, :] - ref_p1[None], axis=-1)
    d2 = np.linalg.norm(p2[:, None, :] - ref_p2[None], axis=-1)
    agree = ((d1 <= 2.0) & (d2 <= 2.0)).any(axis=1)
    frac = float(agree.mean())
    print(f"pipeline agreement: ours {len(p1)} matches, ref {len(ref_p1)}, "
          f"{frac:.1%} of ours within 2 px of a reference match")
    # measured 0.82 on this fixture (docs/PARITY.md); 0.75 leaves room for
    # bin-tie jitter while still failing on any real pipeline regression
    assert frac > 0.75


# Pinned capped-reference results for the CI e2e scene (seed 11, 4 views,
# 260 pts; reference caps: 300 RANSAC iters, max_nfev=400, global BA
# disabled).  The reference is deterministic on this fixture (it seeds its
# own RANSAC, SFM.py:45,133), so the DEFAULT fast profile asserts OUR
# pipeline against these pins without re-paying the ~50 s pure-Python
# reference run every CI; test_e2e_parity_reference_pins (slow profile)
# recomputes the reference live and validates the pins.
_CI_REF_REPROJ_PX = 7.309
_CI_REF_ATE_FRAC = 0.3403      # reference ATE / trajectory extent


def _ci_scene(tmp_path):
    rng = np.random.default_rng(11)
    num_views = 4
    images, K, poses, X = render_sequence(
        rng, num_views=num_views, num_points=260, img_hw=(360, 480), patch=13,
        f=520.0, step_t=(-0.12, 0.01, 0.02), step_r=(0.006, -0.015, 0.004),
    )
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    write_sequence(str(seq_dir), images)
    K_half = K.copy()
    K_half[:2] *= 0.5
    return seq_dir, num_views, K_half, poses


def _ci_run_reference(tmp_path, seq_dir, num_views, K_half, poses):
    """Run the reference pipeline with capped optimizer loops; returns
    (reproj_err, ate_fraction_of_extent, extent)."""
    _ref_path()
    import SFM as RefSFM
    from Runner import SFMRunner as RefRunner
    from PoseEstimator import PnPRansac as RefPnPRansac
    from FeatureExtractor.SIFT.ScaleRotInvSIFT import ScaleRotInvSIFT as RefSRI

    from sfmfromscratch_tpu.utils.metrics import (
        absolute_trajectory_error, camera_centers,
    )

    params = dict(DEMO_PARAMS, num_interest_points=800, pyramid_level=2)

    orig_calc = RefSFM.CameraPose.calculate_num_ransac_iterations
    orig_ls = RefSFM.least_squares
    orig_ba = RefSFM.BundleAdjustment.sparse_bundle_adjustment

    def capped_ls(fun, x0, *a, **k):
        if k.get("method") == "lm":
            k.setdefault("max_nfev", 400)
        return orig_ls(fun, x0, *a, **k)

    RefSFM.CameraPose.calculate_num_ransac_iterations = staticmethod(
        lambda *a, **k: 300)
    RefSFM.least_squares = capped_ls
    RefSFM.BundleAdjustment.sparse_bundle_adjustment = (
        lambda self: (self.camera_params, self.points_3d))

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        ref = RefRunner(
            str(seq_dir), num_views, params,
            feature_extractor_class=RefSRI, match_threshold=0.85,
            pose_estimator=RefPnPRansac, single_K=K_half, model_name=None,
        )
        (n_cams, n_pts, cam_idx, pt_idx, p2d, cam_params, p3d,
         K_list) = ref.prepare_for_ba()
        ref_err = ref.total_reprojection_error(
            n_pts, cam_idx, pt_idx, p2d, cam_params,
            np.array(ref.global_points_3D), K_list)
        ref_rvecs = np.stack(
            [np.asarray(rv).reshape(3) for rv, _ in ref.global_poses])
        ref_ts = np.stack(
            [np.asarray(t).reshape(3) for _, t in ref.global_poses])
        ref_centers = camera_centers(ref_rvecs, ref_ts)
    finally:
        os.chdir(cwd)
        RefSFM.CameraPose.calculate_num_ransac_iterations = orig_calc
        RefSFM.least_squares = orig_ls
        RefSFM.BundleAdjustment.sparse_bundle_adjustment = orig_ba

    gt = np.stack([-(R.T @ t) for R, t in poses[1: len(ref_centers) + 1]])
    extent = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    ref_ate = absolute_trajectory_error(ref_centers, gt)
    return float(ref_err), float(ref_ate) / extent, extent


def test_e2e_parity_ci(tmp_path):
    """CI-sized end-to-end parity (VERDICT round-2 item 5): our full pipeline
    on the 4-view CI scene, asserted against the PINNED capped-reference
    results above, so a full-pipeline parity regression (round 3 shipped one)
    fails the default suite. The pins themselves are re-derived by the
    slow-profile test below; the demo-scale version (GOLDEN_DEMO=1) keeps
    the headline numbers."""
    seq_dir, num_views, K_half, poses = _ci_scene(tmp_path)

    from sfmfromscratch_tpu.utils.metrics import (
        absolute_trajectory_error, camera_centers,
    )
    from sfmfromscratch_tpu.config import (
        BundleAdjustConfig, ExtractorConfig, MatcherConfig, PipelineConfig,
        RansacConfig,
    )
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    cfg = PipelineConfig(
        extractor=ExtractorConfig(
            num_interest_points=800, ksize=3, gaussian_size=7, sigma=6.0,
            alpha=0.05, feature_width=18, pyramid_level=2,
            pyramid_scale_factor=1.1,
        ),
        matcher=MatcherConfig(ratio_threshold=0.85, max_matches=800),
        ransac=RansacConfig(),
        ba=BundleAdjustConfig(),
        scale_factor=0.5,
    )
    eng = SfmEngine(str(seq_dir), num_views, config=cfg, single_K=K_half)
    ours_pre, ours_post = eng.errors_before_after_ba
    rvecs = np.stack([rv for rv, _ in eng.global_poses])
    ts = np.stack([t for _, t in eng.global_poses])
    est = camera_centers(rvecs, ts)
    gt_ours = np.stack([-(R.T @ t) for R, t in poses[1: len(est) + 1]])
    extent = float(np.linalg.norm(gt_ours.max(0) - gt_ours.min(0)))
    ours_ate = absolute_trajectory_error(est, gt_ours)

    print(f"\nCI e2e parity: pinned ref reproj {_CI_REF_REPROJ_PX:.3f} px ATE "
          f"{100 * _CI_REF_ATE_FRAC:.2f}%; ours {ours_pre:.3f}->"
          f"{ours_post:.3f} px ATE {100 * ours_ate / extent:.2f}%")
    assert ours_post <= max(1.1 * _CI_REF_REPROJ_PX, 0.5)
    assert ours_ate <= max(1.1 * _CI_REF_ATE_FRAC * extent, 0.02 * extent)
    assert eng.map.num_tracks > 100


@pytest.mark.slow
def test_e2e_parity_reference_pins(tmp_path):
    """Slow profile: recompute the capped reference live and validate the
    pins the fast e2e parity test asserts against (guards the pins going
    stale if the renderer, caps, or reference environment ever change)."""
    seq_dir, num_views, K_half, poses = _ci_scene(tmp_path)
    ref_err, ref_ate_frac, extent = _ci_run_reference(
        tmp_path, seq_dir, num_views, K_half, poses)
    print(f"\nreference pins: reproj {ref_err:.3f} px (pin "
          f"{_CI_REF_REPROJ_PX}), ATE {ref_ate_frac:.4f} of extent (pin "
          f"{_CI_REF_ATE_FRAC})")
    assert abs(ref_err - _CI_REF_REPROJ_PX) <= 0.05 * _CI_REF_REPROJ_PX
    assert abs(ref_ate_frac - _CI_REF_ATE_FRAC) <= 0.02


@pytest.mark.skipif(os.environ.get("GOLDEN_DEMO") != "1",
                    reason="demo-scale e2e golden: set GOLDEN_DEMO=1 (~10 min)")
def test_demo_scale_e2e_parity(tmp_path):
    """Both pipelines end-to-end on the same 6 views at demo parameters;
    reprojection RMSE and ATE compared at a 1.1x bound (VERDICT item 3).
    Measured results are recorded in docs/PARITY.md."""
    _ref_path()

    rng = np.random.default_rng(11)
    num_views = 6
    images, K, poses, X = render_sequence(
        rng, num_views=num_views, num_points=420, img_hw=(480, 640), patch=15,
        f=760.0, step_t=(-0.10, 0.01, 0.02), step_r=(0.005, -0.012, 0.003),
    )
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    write_sequence(str(seq_dir), images)
    K_half = K.copy()
    K_half[:2] *= 0.5  # reference FeatureRunner works at scale 0.5 (Runner.py:23)

    import SFM as RefSFM
    from Runner import SFMRunner as RefRunner
    from PoseEstimator import PnPRansac as RefPnPRansac
    from FeatureExtractor.SIFT.ScaleRotInvSIFT import ScaleRotInvSIFT as RefSRI

    from sfmfromscratch_tpu.utils.metrics import (
        absolute_trajectory_error, camera_centers,
    )

    orig_calc = RefSFM.CameraPose.calculate_num_ransac_iterations
    orig_ls = RefSFM.least_squares
    orig_ba = RefSFM.BundleAdjustment.sparse_bundle_adjustment

    def capped_ls(fun, x0, *a, **k):
        if k.get("method") == "lm":
            k.setdefault("max_nfev", 1500)
        return orig_ls(fun, x0, *a, **k)

    RefSFM.CameraPose.calculate_num_ransac_iterations = staticmethod(
        lambda *a, **k: 600)
    RefSFM.least_squares = capped_ls
    RefSFM.BundleAdjustment.sparse_bundle_adjustment = (
        lambda self: (self.camera_params, self.points_3d))

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        import time
        t0 = time.time()
        ref = RefRunner(
            str(seq_dir), num_views, dict(DEMO_PARAMS),
            feature_extractor_class=RefSRI, match_threshold=0.85,
            pose_estimator=RefPnPRansac, single_K=K_half, model_name=None,
        )
        ref_wall = time.time() - t0
        (n_cams, n_pts, cam_idx, pt_idx, p2d, cam_params, p3d,
         K_list) = ref.prepare_for_ba()
        ref_err = ref.total_reprojection_error(
            n_pts, cam_idx, pt_idx, p2d, cam_params,
            np.array(ref.global_points_3D), K_list)
        ref_rvecs = np.stack([np.asarray(rv).reshape(3) for rv, _ in ref.global_poses])
        ref_ts = np.stack([np.asarray(t).reshape(3) for _, t in ref.global_poses])
        ref_centers = camera_centers(ref_rvecs, ref_ts)
    finally:
        os.chdir(cwd)
        RefSFM.CameraPose.calculate_num_ransac_iterations = orig_calc
        RefSFM.least_squares = orig_ls
        RefSFM.BundleAdjustment.sparse_bundle_adjustment = orig_ba

    gt = np.stack([-(R.T @ t) for R, t in poses[1: len(ref_centers) + 1]])
    extent = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    ref_ate = absolute_trajectory_error(ref_centers, gt)

    # --- Ours, same files, same working scale, full demo config.
    from sfmfromscratch_tpu.config import (
        BundleAdjustConfig, ExtractorConfig, MatcherConfig, PipelineConfig,
        RansacConfig,
    )
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    cfg = PipelineConfig(
        extractor=ExtractorConfig(
            num_interest_points=2500, ksize=3, gaussian_size=7, sigma=6.0,
            alpha=0.05, feature_width=18, pyramid_level=3,
            pyramid_scale_factor=1.1,
        ),
        matcher=MatcherConfig(ratio_threshold=0.85, max_matches=2500),
        ransac=RansacConfig(),
        ba=BundleAdjustConfig(),
        scale_factor=0.5,
    )
    import time
    t0 = time.time()
    eng = SfmEngine(str(seq_dir), num_views, config=cfg, single_K=K_half)
    ours_wall = time.time() - t0
    ours_pre, ours_post = eng.errors_before_after_ba
    rvecs = np.stack([rv for rv, _ in eng.global_poses])
    ts = np.stack([t for _, t in eng.global_poses])
    est = camera_centers(rvecs, ts)
    gt_ours = np.stack([-(R.T @ t) for R, t in poses[1: len(est) + 1]])
    ours_ate = absolute_trajectory_error(est, gt_ours)

    print(
        f"\nGOLDEN_DEMO (6 views, 2500 kp, fw18, 3 levels x1.1, ratio 0.85, "
        f"working 240x320):\n"
        f"  reference: reproj {ref_err:.3f} px, ATE {ref_ate:.4f} "
        f"({100 * ref_ate / extent:.2f}% of extent), wall {ref_wall:.0f}s\n"
        f"  ours:      reproj {ours_pre:.3f} -> {ours_post:.3f} px, "
        f"ATE {ours_ate:.4f} ({100 * ours_ate / extent:.2f}% of extent), "
        f"wall {ours_wall:.0f}s"
    )
    # 1.1x bounds (VERDICT item 3), with a small absolute floor for the
    # px metric (sub-pixel noise regime).
    assert ours_post <= max(1.1 * ref_err, 0.5)
    assert ours_ate <= max(1.1 * ref_ate, 0.02 * extent)
    assert eng.map.num_tracks > 200
