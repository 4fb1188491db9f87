"""Wide-baseline validation on the perspective-correct plane renderer
(tests/render.py::render_planes): appearance warps projectively with
viewpoint, so these tests exercise matching/geometry at baselines the sprite
renderer cannot represent (its unwarped patches stop matching beyond ~8 deg)."""

import numpy as np
import pytest

from tests.render import render_planes, write_sequence


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    images, K, poses, _ = render_planes(rng, num_views=12, orbit_step_deg=10.0)
    return images, K, poses


def test_two_view_twenty_degrees(scene):
    """Matching + epipolar geometry across a 20-degree baseline."""
    import jax.numpy as jnp

    from sfmfromscratch_tpu.config import ExtractorConfig
    from sfmfromscratch_tpu.pipeline.frontend import FeatureRunner, matches_to_coords
    from sfmfromscratch_tpu.geometry.epipolar import (
        eight_point_fundamental, epipolar_distances,
    )

    images, K, poses = scene
    cfg = ExtractorConfig(
        num_interest_points=600, ksize=3, gaussian_size=7, sigma=3.0,
        alpha=0.05, feature_width=16, pyramid_level=2,
        pyramid_scale_factor=1.2,
    )
    fr = FeatureRunner.run(images[0], images[2], cfg, scale_factor=1.0)
    n = int(np.asarray(fr.matches.mask).sum())
    assert n > 80, f"only {n} matches across 20 deg"

    p1, p2, m = matches_to_coords(fr.matches, fr.features1, fr.features2, 600)
    F = eight_point_fundamental(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32), mask=m
    )
    d = np.asarray(epipolar_distances(F, p1, p2))
    med = float(np.median(d[np.asarray(m)]))
    assert med < 1.5, f"median epipolar distance {med:.2f} px"


@pytest.mark.slow
def test_global_reconstruction_ten_degree_steps(scene, tmp_path):
    """Full global pipeline at 10-degree view spacing: sub-percent ATE."""
    import cv2

    from sfmfromscratch_tpu.config import ExtractorConfig, PipelineConfig
    from sfmfromscratch_tpu.pipeline.global_sfm import GlobalSfmEngine
    from sfmfromscratch_tpu.utils.metrics import absolute_trajectory_error

    images, K, poses = scene
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)
    cfg = PipelineConfig(
        extractor=ExtractorConfig(
            num_interest_points=600, ksize=3, gaussian_size=7, sigma=3.0,
            alpha=0.05, feature_width=16, pyramid_level=2,
            pyramid_scale_factor=1.2,
        ),
        scale_factor=1.0,
    )
    eng = GlobalSfmEngine(str(d), 12, config=cfg, single_K=K, pair_window=3,
                          pair_mode="both", retrieval_k=4,
                          output_dir=str(tmp_path / "out"))
    assert eng.map.num_tracks > 500
    assert eng.errors_before_after_ba[1] < 1.0

    C_est = []
    for rvec, t in eng.global_poses:
        R, _ = cv2.Rodrigues(np.asarray(rvec, np.float64).reshape(3, 1))
        C_est.append(-R.T @ np.asarray(t, np.float64).reshape(3))
    C_est = np.stack(C_est)
    C_gt = np.stack([-R.T @ np.asarray(t).reshape(3) for R, t in poses])
    ate = absolute_trajectory_error(C_est, C_gt)
    extent = np.linalg.norm(C_gt.max(0) - C_gt.min(0))
    assert 100 * ate / extent < 2.0
