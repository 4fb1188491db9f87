"""SuperPoint slot, DoG detector, two-view entry, pose recovery, resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_superpoint_random_init_contract(rng):
    from sfmfromscratch_tpu.ops.superpoint import SuperPointExtractor

    ext = SuperPointExtractor(weights_path=None)  # force random init
    img = jnp.asarray(rng.uniform(0, 1, (120, 160)), jnp.float32)
    f = ext(img, k=128)
    assert f.descriptors.shape == (128, 256)
    n = int(np.asarray(f.keypoints.mask).sum())
    assert n > 0
    norms = np.linalg.norm(np.asarray(f.descriptors), axis=1)
    valid = np.asarray(f.keypoints.mask)
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-3)
    # Keypoints within image bounds
    assert (np.asarray(f.keypoints.x)[valid] < 160).all()
    assert (np.asarray(f.keypoints.y)[valid] < 120).all()


def _tinypoint_available():
    from sfmfromscratch_tpu.ops.superpoint import default_weights_path

    return default_weights_path() is not None


@pytest.mark.skipif(not _tinypoint_available(),
                    reason="no in-repo TinyPoint checkpoint")
def test_tinypoint_checkpoint_contract(rng):
    """The committed synthetic-trained checkpoint loads via auto-discovery
    and emits SIFT-dimensional (128-D) unit descriptors."""
    from sfmfromscratch_tpu.ops.superpoint import SuperPointExtractor

    ext = SuperPointExtractor()  # auto
    img = jnp.asarray(rng.uniform(0, 1, (120, 160)), jnp.float32)
    f = ext(img, k=128)
    assert f.descriptors.shape == (128, 128)
    valid = np.asarray(f.keypoints.mask)
    assert valid.sum() > 0
    norms = np.linalg.norm(np.asarray(f.descriptors), axis=1)
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-3)


@pytest.mark.skipif(not _tinypoint_available(),
                    reason="no in-repo TinyPoint checkpoint")
def test_tinypoint_detects_synthetic_corners(rng):
    """The trained detector fires on exact synthetic corners: most ground-
    truth corners have a detection within 4 px (random init does not)."""
    from sfmfromscratch_tpu.ops.sp_train import _draw_shapes
    from sfmfromscratch_tpu.ops.superpoint import SuperPointExtractor

    ext = SuperPointExtractor()
    hits, total = 0, 0
    for seed in range(3):
        img, corners = _draw_shapes(np.random.default_rng(seed), 120, 160)
        if len(corners) == 0:
            continue
        f = ext(jnp.asarray(img), k=128)
        valid = np.asarray(f.keypoints.mask)
        kp = np.stack([np.asarray(f.keypoints.xf)[valid],
                       np.asarray(f.keypoints.yf)[valid]], 1)
        d = np.linalg.norm(corners[:, None, :] - kp[None, :, :], axis=-1)
        hits += int((d.min(axis=1) <= 4.0).sum())
        total += len(corners)
    assert total > 0 and hits / total > 0.6, (hits, total)


def test_superpoint_weight_roundtrip(tmp_path):
    """The MagicLeap .pth converter maps torch conv layout to flax correctly."""
    torch = pytest.importorskip("torch")
    from sfmfromscratch_tpu.ops.superpoint import (
        SuperPointExtractor, load_magicleap_weights,
    )

    # Synthesize a random checkpoint in the MagicLeap layout.
    shapes = {
        "conv1a": (64, 1), "conv1b": (64, 64), "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128), "conv4a": (128, 128), "conv4b": (128, 128),
        "convPa": (256, 128), "convDa": (256, 128),
    }
    state = {}
    g = torch.Generator().manual_seed(0)
    for name, (o, i) in shapes.items():
        state[f"{name}.weight"] = torch.randn(o, i, 3, 3, generator=g) * 0.05
        state[f"{name}.bias"] = torch.zeros(o)
    state["convPb.weight"] = torch.randn(65, 256, 1, 1, generator=g) * 0.05
    state["convPb.bias"] = torch.zeros(65)
    state["convDb.weight"] = torch.randn(256, 256, 1, 1, generator=g) * 0.05
    state["convDb.bias"] = torch.zeros(256)
    path = str(tmp_path / "sp.pth")
    torch.save(state, path)

    ext = SuperPointExtractor(weights_path=path)
    img = jnp.zeros((96, 128), jnp.float32)
    f = ext(img, k=32)
    assert np.isfinite(np.asarray(f.descriptors)).all()


def test_dog_detector(rng):
    from sfmfromscratch_tpu.ops.dog import detect_dog_keypoints

    img = rng.uniform(0, 0.05, (96, 128)).astype(np.float32)
    # Blobs of different sizes -> scale-space extrema.
    yy, xx = np.mgrid[:96, :128]
    for (cy, cx, s) in [(30, 40, 3.0), (60, 90, 6.0), (70, 30, 2.0)]:
        img += 0.8 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)).astype(np.float32)
    kps = detect_dog_keypoints(jnp.asarray(img), k=16)
    n = int(np.asarray(kps.mask).sum())
    assert n >= 3
    pts = {(int(x), int(y)) for x, y, m in zip(np.asarray(kps.x), np.asarray(kps.y),
                                               np.asarray(kps.mask)) if m}
    # Each blob center found within a few pixels.
    for (cy, cx, _) in [(30, 40, 0), (60, 90, 0), (70, 30, 0)]:
        assert any(abs(x - cx) <= 4 and abs(y - cy) <= 4 for x, y in pts), (cy, cx, pts)


def test_two_view_entry(rng):
    from tests.render import render_sequence
    from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig, RansacConfig
    from sfmfromscratch_tpu.pipeline.two_view import reconstruct_two_view

    images, K, poses, X = render_sequence(rng, num_views=2, num_points=100)
    res = reconstruct_two_view(
        np.stack([images[0]] * 3, -1), np.stack([images[1]] * 3, -1), K,
        extractor=ExtractorConfig(num_interest_points=300, ksize=3, pyramid_level=2,
                                  pyramid_scale_factor=1.2, sigma=3.0),
        matcher=MatcherConfig(ratio_threshold=0.9, max_matches=300),
        ransac=RansacConfig(max_iterations=400),
    )
    assert int(res.num_inliers) > 30
    R_gt = poses[1][0]
    dR = np.asarray(res.R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 3.0
    assert float(res.mean_reproj_error) < 2.0


@pytest.mark.slow
def test_pose_recovery_mode(rng, tmp_path):
    """A sequence with a broken middle frame survives in recover mode and
    writes periodic checkpoints."""
    from tests.render import render_sequence, write_sequence
    from tests.test_pipeline import _small_config
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    images, K, poses, X = render_sequence(rng, num_views=5, num_points=110)
    images[3] = rng.uniform(0, 1, images[3].shape).astype(np.float32)  # garbage frame
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)

    eng = SfmEngine(
        str(d), 5, config=_small_config(), single_K=K,
        on_pose_failure="recover", checkpoint_every=2,
        checkpoint_path=str(tmp_path / "ckpt.npz"),
    )
    assert len(eng.global_poses) == 4          # every frame got a pose
    assert len(eng.warnings) >= 1              # recovery engaged
    assert (tmp_path / "ckpt.npz").exists()    # periodic checkpoint written


def test_checkpoint_resume_continues(rng, tmp_path):
    from sfmfromscratch_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
    from sfmfromscratch_tpu.config import PipelineConfig

    eng = SfmEngine.__new__(SfmEngine)
    eng.config = PipelineConfig()
    from sfmfromscratch_tpu.pipeline.tracks import MapStore

    eng.map = MapStore()
    eng.map.add_tracks(rng.standard_normal((4, 3)), rng.uniform(0, 10, (4, 2)), 0)
    eng.global_poses = [(np.zeros(3), np.zeros(3))]
    eng.global_K = [np.eye(3)]
    eng._kp_tracks = {1: np.full(8, -1, np.int64)}
    eng._rng_key = jax.random.key(1)
    p = str(tmp_path / "c.npz")
    save_checkpoint(eng, p, next_frame=4)

    eng2 = SfmEngine.__new__(SfmEngine)
    eng2.config = PipelineConfig()
    assert load_checkpoint(eng2, p) == 4
    assert eng2.map.num_tracks == 4


@pytest.mark.slow
def test_engine_with_custom_extractor(tmp_path):
    """The extractor strategy slot (reference feature_extractor_class,
    Runner.py:129-130): plug a custom callable into the engine."""
    from tests.render import render_sequence, write_sequence
    from tests.test_pipeline import _small_config
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
    from sfmfromscratch_tpu.pipeline.frontend import extract_features
    from sfmfromscratch_tpu.config import ExtractorConfig

    rng = np.random.default_rng(5)
    images, K, poses, X = render_sequence(rng, num_views=3, num_points=110)
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)

    calls = []
    cfg_e = ExtractorConfig(
        num_interest_points=400, ksize=3, gaussian_size=7, sigma=3.0,
        alpha=0.05, feature_width=16, pyramid_level=2, pyramid_scale_factor=1.2,
    )

    def my_extractor(image_bw):
        calls.append(1)
        return extract_features(image_bw, cfg_e)

    eng = SfmEngine(str(d), 3, config=_small_config(), single_K=K,
                    feature_extractor=my_extractor, output_dir=str(tmp_path))
    assert len(calls) == 3            # once per image, never per pair
    assert eng.map.num_tracks > 20


def test_dog_extractor_slot_reconstructs(tmp_path):
    """The DoG frontend plugs into the engine's feature_extractor slot
    (reference extractor-strategy contract, Runner.py:129-130) and carries a
    full reconstruction."""
    import numpy as np

    from sfmfromscratch_tpu.pipeline.frontend import make_dog_extractor
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
    from tests.render import render_sequence, write_sequence
    from tests.test_pipeline import _small_config

    rng = np.random.default_rng(42)
    images, K, poses, X = render_sequence(rng, num_views=4, num_points=110)
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)
    cfg = _small_config()
    eng = SfmEngine(str(d), 4, config=cfg, single_K=K,
                    feature_extractor=make_dog_extractor(cfg.extractor),
                    output_dir=str(tmp_path / "out"))
    assert eng.map.num_tracks > 25
    assert eng.errors_before_after_ba[1] < 3.0
