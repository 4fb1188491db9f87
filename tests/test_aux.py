"""Auxiliary subsystems: metrics, checkpoint/resume, CLI, config."""

import json
import os

import numpy as np
import pytest

from sfmfromscratch_tpu.config import ExtractorConfig, RansacConfig
from sfmfromscratch_tpu.utils.metrics import (
    MetricsLogger,
    absolute_trajectory_error,
    camera_centers,
    umeyama_alignment,
)


def test_extractor_config_from_reference_dict():
    # The reference demo dict (main.py:19-28) maps verbatim.
    params = {
        "num_interest_points": 2500, "ksize": 3, "gaussian_size": 7,
        "sigma": 6, "alpha": 0.05, "feature_width": 18,
        "pyramid_level": 3, "pyramid_scale_factor": 1.1,
    }
    cfg = ExtractorConfig.from_params_dict(params)
    assert cfg.num_interest_points == 2500
    assert cfg.feature_width == 18
    assert cfg.pyramid_scale_factor == 1.1


def test_ransac_iteration_count_matches_reference():
    # calculate_num_ransac_iterations(0.98, 8, 0.4) = 5967 (SFM.py:184-187).
    assert RansacConfig().num_iterations() == 5967


def test_umeyama_roundtrip(rng):
    from scipy.spatial.transform import Rotation

    src = rng.standard_normal((40, 3))
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s, t = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    R2, t2, s2 = umeyama_alignment(src, dst)
    np.testing.assert_allclose(R2, R, atol=1e-8)
    np.testing.assert_allclose(t2, t, atol=1e-8)
    assert abs(s2 - s) < 1e-8


def test_ate_zero_for_gauge_transformed(rng):
    from scipy.spatial.transform import Rotation

    gt = rng.standard_normal((10, 3))
    R = Rotation.from_rotvec([0.1, 0.7, -0.3]).as_matrix()
    est = 0.7 * gt @ R.T + np.array([3, 2, 1])
    assert absolute_trajectory_error(est, gt) < 1e-8
    assert absolute_trajectory_error(est + 0.1 * rng.standard_normal((10, 3)), gt) > 0.01


def test_camera_centers():
    rv = np.zeros((2, 3))
    t = np.array([[1.0, 0, 0], [0, 2.0, 0]])
    C = camera_centers(rv, t)
    np.testing.assert_allclose(C, -t, atol=1e-12)


def test_metrics_logger(tmp_path):
    p = tmp_path / "metrics.jsonl"
    m = MetricsLogger(str(p))
    m.log("ba", reproj_rmse=0.5, iters=12)
    m.log("frame", fps=3.2)
    m.close()
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["event"] == "ba"
    assert lines[1]["fps"] == 3.2


def test_checkpoint_roundtrip(tmp_path, rng):
    """Engine state survives save/load byte-for-byte."""
    import jax
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
    from sfmfromscratch_tpu.pipeline.checkpoint import save_checkpoint, load_checkpoint

    eng = SfmEngine.__new__(SfmEngine)  # bare engine, no run
    from sfmfromscratch_tpu.pipeline.tracks import MapStore
    from sfmfromscratch_tpu.config import PipelineConfig

    eng.config = PipelineConfig()
    eng.map = MapStore()
    ids = eng.map.add_tracks(rng.standard_normal((5, 3)), rng.uniform(0, 100, (5, 2)), 0)
    eng.map.add_observations(ids, rng.uniform(0, 100, (5, 2)), 1)
    eng.global_poses = [(rng.standard_normal(3), rng.standard_normal(3))]
    eng.global_K = [np.eye(3)]
    eng._kp_tracks = {1: np.full(16, -1, np.int64), 2: np.arange(16, dtype=np.int64)}
    eng._rng_key = jax.random.key(5)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(eng, path, next_frame=3)

    eng2 = SfmEngine.__new__(SfmEngine)
    eng2.config = PipelineConfig()
    nxt = load_checkpoint(eng2, path)
    assert nxt == 3
    np.testing.assert_allclose(eng2.map.points(), eng.map.points())
    f1, t1, xy1 = eng.map.observations()
    f2, t2, xy2 = eng2.map.observations()
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(xy1, xy2)
    np.testing.assert_array_equal(eng2._kp_tracks[2], eng._kp_tracks[2])
    np.testing.assert_allclose(
        np.asarray(jax.random.key_data(eng2._rng_key)),
        np.asarray(jax.random.key_data(eng._rng_key)),
    )


def test_cli_help_and_resize(tmp_path):
    from sfmfromscratch_tpu.cli import main
    from PIL import Image

    with pytest.raises(SystemExit):
        main(["--help"])

    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    Image.new("RGB", (100, 80)).save(src / "a.jpg")
    assert main(["resize", str(src), str(dst), "--ratio", "0.5", "--no-exif"]) == 0
    with Image.open(dst / "a.jpg") as im:
        assert im.size == (50, 40)


def test_async_checkpointer_roundtrip(tmp_path, rng):
    import jax
    from sfmfromscratch_tpu.pipeline.checkpoint import AsyncCheckpointer
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
    from sfmfromscratch_tpu.pipeline.tracks import MapStore
    from sfmfromscratch_tpu.config import PipelineConfig

    eng = SfmEngine.__new__(SfmEngine)
    eng.config = PipelineConfig()
    eng.map = MapStore()
    ids = eng.map.add_tracks(rng.standard_normal((6, 3)), rng.uniform(0, 50, (6, 2)), 0)
    eng.map.add_observations(ids, rng.uniform(0, 50, (6, 2)), 1)
    eng.global_poses = [(rng.standard_normal(3), rng.standard_normal(3))]
    eng.global_K = [np.eye(3)]
    eng._kp_tracks = {1: np.arange(10, dtype=np.int64)}
    eng._rng_key = jax.random.key(9)

    ck = AsyncCheckpointer(str(tmp_path / "ckpts"))
    ck.save(eng, next_frame=5, step=1)
    ck.wait()

    eng2 = SfmEngine.__new__(SfmEngine)
    eng2.config = PipelineConfig()
    assert ck.restore(eng2, step=1) == 5
    np.testing.assert_allclose(eng2.map.points(), eng.map.points())
    assert eng2.map.num_observations == eng.map.num_observations
    np.testing.assert_array_equal(eng2._kp_tracks[1], eng._kp_tracks[1])


@pytest.mark.slow
def test_export_ply_and_colmap(tmp_path):
    """PLY + COLMAP sparse-text export of a reconstruction (io/export.py) —
    output the reference cannot produce (it only writes its own npz,
    Runner.py:357-359)."""
    import numpy as np

    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
    from tests.render import render_sequence, write_sequence
    from tests.test_pipeline import _small_config

    rng = np.random.default_rng(42)
    images, K, poses, X = render_sequence(rng, num_views=4, num_points=110)
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)
    eng = SfmEngine(str(d), 4, config=_small_config(), single_K=K,
                    output_dir=str(tmp_path / "out"))

    ply = eng.save_ply(str(tmp_path / "model.ply"))
    lines = open(ply).read().splitlines()
    assert lines[0] == "ply"
    n_vert = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    assert n_vert == eng.map.num_tracks + len(eng.global_poses)
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == n_vert
    assert all(len(l.split()) == 6 for l in body[:10])

    cm = eng.save_colmap(str(tmp_path / "colmap"))
    cams = open(f"{cm}/cameras.txt").read().splitlines()
    imgs_txt = open(f"{cm}/images.txt").read().splitlines()
    pts_txt = open(f"{cm}/points3D.txt").read().splitlines()
    n_cams = len(eng.global_poses)
    assert sum(1 for l in cams if not l.startswith("#")) == n_cams
    # images.txt: two lines per image (pose, observations)
    assert sum(1 for l in imgs_txt if not l.startswith("#")) == 2 * n_cams
    n_pts = sum(1 for l in pts_txt if not l.startswith("#"))
    assert n_pts == eng.map.num_tracks
    # every 3-D point line: id x y z rgb error + pairs
    first = [l for l in pts_txt if not l.startswith("#")][0].split()
    assert (len(first) - 8) % 2 == 0 and len(first) >= 10


def test_export_formats_on_stub_map(tmp_path):
    """Fast-profile export format contract: save_ply / save_colmap consume the
    engine's attribute surface (map.observations/points, global_poses,
    global_K) — a hand-built stub pins the FORMAT without paying a full
    engine run (the engine-sourced variant above is in the slow profile)."""
    import numpy as np

    from sfmfromscratch_tpu.io.export import save_colmap, save_ply

    rng = np.random.default_rng(0)
    P, C = 23, 3
    frames = np.repeat(np.arange(C), P)[: 2 * P]
    tracks = np.concatenate([np.arange(P), np.arange(P)])[: len(frames)]
    xy = rng.uniform(0, 200, (len(frames), 2))
    pts = rng.standard_normal((P, 3))

    class _Map:
        num_tracks = P

        def observations(self):
            return frames, tracks, xy

        def points(self):
            return pts

    class _Eng:
        map = _Map()
        global_poses = [(rng.standard_normal(3) * 0.1, rng.standard_normal(3))
                        for _ in range(C)]
        global_K = [np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])] * C

    eng = _Eng()
    ply = save_ply(eng, str(tmp_path / "m.ply"))
    lines = open(ply).read().splitlines()
    assert lines[0] == "ply"
    n_vert = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    assert n_vert == P + C
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == n_vert and all(len(l.split()) == 6 for l in body)

    cm = save_colmap(eng, str(tmp_path / "colmap"))
    cams = open(f"{cm}/cameras.txt").read().splitlines()
    imgs_txt = open(f"{cm}/images.txt").read().splitlines()
    pts_txt = open(f"{cm}/points3D.txt").read().splitlines()
    assert sum(1 for l in cams if not l.startswith("#")) == C
    assert sum(1 for l in imgs_txt if not l.startswith("#")) == 2 * C
    pts_lines = [l for l in pts_txt if not l.startswith("#")]
    assert len(pts_lines) == P
    first = pts_lines[0].split()
    assert (len(first) - 8) % 2 == 0 and len(first) >= 10
