"""Realism rung of the validation ladder (VERDICT r4 item 5).

No multi-view real photographed dataset exists in this environment (verified
by filesystem search — the only real photograph shipped is matplotlib's
grace_hopper.jpg), so the closest honest substitute is REAL photographic
texture under exact ray-traced geometry (tests/render.py:real_photo_texture +
render_planes(textures="real")) pushed through the camera-physics
degradation stack (degrade_camera: radial distortion, rolling shutter,
JPEG-60; degrade_sequence: shot/read noise, exposure/gamma drift, motion
blur), written as JPEGs with EXIF focal tags and reconstructed through the
full decode -> EXIF-K -> pipeline path (reference modality: main.py:29-30,
SFM.py:311-374).  Measured results are recorded in docs/PARITY.md.
"""

import numpy as np
import pytest

from tests.render import (
    degrade_camera,
    degrade_sequence,
    real_photo_texture,
    render_planes,
    write_sequence,
)

needs_real_photo = pytest.mark.skipif(
    real_photo_texture() is None,
    reason="no real photograph available in this environment",
)


def test_degrade_camera_model(rng):
    """Unit contract: radial+RS warp moves pixels (more at the corners than
    the center — barrel distortion), JPEG-60 introduces quantization, and
    shapes/ranges are preserved."""
    img = rng.uniform(0, 1, (120, 160)).astype(np.float32)
    out = degrade_camera(rng, [img], k1=-0.1, rs_shear=2.0, jpeg_quality=60)[0]
    assert out.shape == img.shape and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    center = np.abs(out[55:65, 75:85] - img[55:65, 75:85]).mean()
    corner = np.abs(out[:20, :20] - img[:20, :20]).mean()
    assert corner > center            # distortion grows with radius
    # identity parameters leave only JPEG error, which is small but nonzero
    out_id = degrade_camera(rng, [img], k1=0.0, rs_shear=0.0,
                            jpeg_quality=95)[0]
    err = np.abs(out_id - img).mean()
    assert 0.0 < err < 0.02


@needs_real_photo
def test_real_texture_two_view_frontend(rng):
    """The frontend on REAL photographic texture: a rendered pair must
    produce a healthy match set with epipolar-consistent geometry."""
    import jax
    import jax.numpy as jnp

    from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig
    from sfmfromscratch_tpu.geometry.epipolar import (
        symmetric_epipolar_distances,
    )
    from sfmfromscratch_tpu.geometry.ransac import ransac_fundamental
    from sfmfromscratch_tpu.pipeline.frontend import (
        FeatureRunner,
        matches_to_coords,
    )

    images, K, poses, _ = render_planes(
        rng, num_views=2, img_hw=(240, 320), f=400.0, orbit_step_deg=4.0,
        textures="real",
    )
    fr = FeatureRunner.run(
        np.stack([images[0]] * 3, -1), np.stack([images[1]] * 3, -1),
        cfg=ExtractorConfig(num_interest_points=400, pyramid_level=2,
                            pyramid_scale_factor=1.2, sigma=3.0,
                            feature_width=16),
        matcher_cfg=MatcherConfig(ratio_threshold=0.85, max_matches=400),
        scale_factor=1.0,
    )
    p1, p2, m = matches_to_coords(fr.matches, fr.features1, fr.features2, 400)
    n = int(np.asarray(m).sum())
    assert n > 60
    p1v = jnp.asarray(np.asarray(p1)[np.asarray(m)][:n])
    p2v = jnp.asarray(np.asarray(p2)[np.asarray(m)][:n])
    res = ransac_fundamental(jax.random.key(0), p1v, p2v,
                             num_hypotheses=1000, threshold=1.5)
    inl = np.asarray(res.inliers)
    assert inl.mean() > 0.5           # majority of matches epipolar-consistent
    d = np.asarray(symmetric_epipolar_distances(res.F, p1v, p2v))
    assert np.median(d[inl]) < 1.0


@needs_real_photo
@pytest.mark.slow
def test_real_texture_degraded_e2e(tmp_path):
    """Full decode -> EXIF-K -> global reconstruction on real-texture views
    under the COMPLETE degradation stack.  Chip-measured r5 (12 views, 5
    deg/view, 312x472): clean ATE 0.10% / 0.25 px; degraded (noise + drift +
    blur + radial k1=-0.08 + 3 px rolling shutter + JPEG-60) ATE 1.15% /
    0.48 px.  Bounds leave room for backend float noise."""
    from sfmfromscratch_tpu.config import (
        BundleAdjustConfig, ExtractorConfig, MatcherConfig, PipelineConfig,
        RansacConfig,
    )
    from sfmfromscratch_tpu.geometry.camera import SensorType
    from sfmfromscratch_tpu.pipeline.global_sfm import GlobalSfmEngine
    from sfmfromscratch_tpu.utils.metrics import (
        absolute_trajectory_error, camera_centers,
    )

    rng = np.random.default_rng(5)
    N = 12
    images, K, poses, _ = render_planes(
        rng, num_views=N, img_hw=(312, 472), f=400.0, orbit_step_deg=5.0,
        textures="real",
    )
    rng2 = np.random.default_rng(6)
    deg = degrade_sequence(rng2, images, noise_sigma=0.02, blur_len=5,
                           blur_every=4)
    deg = degrade_camera(rng2, deg, k1=-0.08, rs_shear=3.0, jpeg_quality=60)
    d = tmp_path / "seq"
    d.mkdir()
    # 312x472 matches the CROP_FRAME aspect (23.6/15.6), so EXIF focal 20 mm
    # reproduces the render K exactly: f = 20 * 472 / 23.6 = 400 px.
    write_sequence(str(d), deg, exif_focal_mm=20.0)

    cfg = PipelineConfig(
        extractor=ExtractorConfig(
            num_interest_points=500, ksize=3, gaussian_size=7, sigma=3.0,
            alpha=0.05, feature_width=16, pyramid_level=2,
            pyramid_scale_factor=1.2,
        ),
        matcher=MatcherConfig(ratio_threshold=0.85, max_matches=500),
        ransac=RansacConfig(), ba=BundleAdjustConfig(huber_delta=2.0),
        scale_factor=1.0,
    )
    eng = GlobalSfmEngine(str(d), N, config=cfg,
                          camera_sensor=SensorType.CROP_FRAME, pair_window=3)
    # EXIF K flowed through (no single_K was given).
    assert len(eng.global_K) == len(eng.global_poses)
    np.testing.assert_allclose(eng.global_K[0][0, 0], 400.0, rtol=1e-6)

    rv = np.stack([x for x, _ in eng.global_poses])
    ts = np.stack([t for _, t in eng.global_poses])
    est = camera_centers(rv, ts)
    start = 0 if len(est) == len(poses) else 1
    gt = np.stack([-(R.T @ t) for R, t in poses[start: start + len(est)]])
    ate = absolute_trajectory_error(est, gt)
    extent = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    assert eng.errors_before_after_ba[1] < 1.0
    assert ate / extent < 0.04
    assert eng.map.num_tracks > 300
