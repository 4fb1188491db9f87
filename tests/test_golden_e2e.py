"""End-to-end golden parity: the actual reference pipeline vs this engine on
the SAME rendered image sequence.

This is the acceptance criterion from BASELINE.json: reconstruction quality
(reprojection RMSE / ATE) within the reference's bound. The reference runs
as-is from /root/reference (imported, never copied) on a small scene so its
Python RANSAC loops stay tractable.
"""

import os
import sys

import numpy as np
import pytest

from tests.render import render_sequence, write_sequence

REF = "/root/reference"


def _ref_available():
    return os.path.isdir(REF)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    rng = np.random.default_rng(21)
    images, K, poses, X = render_sequence(
        rng, num_views=3, num_points=90, img_hw=(160, 220), f=300.0,
        step_t=(-0.2, 0.02, 0.03), step_r=(0.008, -0.02, 0.005),
    )
    d = tmp_path_factory.mktemp("golden")
    write_sequence(str(d), images)
    return dict(dir=str(d), K=K, poses=poses, n=3)


@pytest.mark.skipif(not _ref_available(), reason="reference tree unavailable")
@pytest.mark.slow
def test_full_pipeline_matches_reference_quality(scene, tmp_path):
    # --- Reference run (its FeatureRunner rescales images by 0.5,
    # Runner.py:23; hand it intrinsics at that working scale).
    K_half = scene["K"].copy()
    K_half[:2] *= 0.5

    sys.path.insert(0, REF)
    try:
        from Runner import SFMRunner as RefRunner
        import SFM as RefSFM

        params = dict(
            num_interest_points=300, ksize=3, gaussian_size=7, sigma=3,
            alpha=0.05, feature_width=16, pyramid_level=2,
            pyramid_scale_factor=1.2,
        )
        from PoseEstimator import PnPRansac as RefPnPRansac
        from FeatureExtractor.SIFT.ScaleRotInvSIFT import ScaleRotInvSIFT as RefSRI

        cwd = os.getcwd()
        os.chdir(tmp_path)  # reference writes into ./output when saving
        try:
            ref = RefRunner(
                scene["dir"], scene["n"], params,
                feature_extractor_class=RefSRI, match_threshold=0.85,
                pose_estimator=RefPnPRansac, single_K=K_half, model_name=None,
            )
        finally:
            os.chdir(cwd)
        (num_cameras, num_points, cam_idx, pt_idx, p2d, cam_params, p3d,
         K_list) = ref.prepare_for_ba()
        ref_err = ref.total_reprojection_error(
            num_points, cam_idx, pt_idx, p2d, cam_params, np.array(ref.global_points_3D),
            K_list,
        )
    finally:
        sys.path.remove(REF)

    # --- Our engine on the same files at the same working scale.
    from sfmfromscratch_tpu.config import (
        BundleAdjustConfig, ExtractorConfig, MatcherConfig, PipelineConfig,
        RansacConfig,
    )
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    cfg = PipelineConfig(
        extractor=ExtractorConfig(
            num_interest_points=300, ksize=3, gaussian_size=7, sigma=3.0,
            alpha=0.05, feature_width=16, pyramid_level=2,
            pyramid_scale_factor=1.2,
        ),
        matcher=MatcherConfig(ratio_threshold=0.85, max_matches=300),
        ransac=RansacConfig(max_iterations=1024),
        ba=BundleAdjustConfig(max_lm_iters=40, ftol=1e-5),
        scale_factor=0.5,
    )
    eng = SfmEngine(scene["dir"], scene["n"], config=cfg, single_K=K_half)
    ours_err = eng.errors_before_after_ba[1]

    # Note: the reference DISCARDS its optimized camera poses (perform() only
    # stores optimized points, Runner.py:303-304), so its retained final state
    # (measured here) is worse than its transient printed after-BA error.
    # Observed on this scene: retained 7.0 px (transient 0.33 px) vs ours
    # 0.07 px — better on either comparison.
    print(f"reference mean reproj error: {ref_err:.3f} px; ours: {ours_err:.3f} px")
    # Acceptance: within the reference's bound (BASELINE.json) — we demand
    # at least parity (1.1x, VERDICT round-1 item 3), with a sub-pixel
    # absolute floor for different RANSAC draws. Observed: ref retains
    # 7.0 px (it discards optimized poses), ours 0.07 px.
    assert ours_err <= max(1.1 * ref_err, 0.5)
    assert eng.map.num_tracks > 20
