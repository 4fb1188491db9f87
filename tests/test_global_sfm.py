"""Global (motion-averaging) SfM engine: end-to-end on a rendered scene.

The global pipeline replaces the reference's sequential PnP chain
(Runner.py:221-287) with all-pairs relative poses + rotation/translation
averaging + multiview triangulation; these tests check it reaches the same
quality bar as the incremental engine on the same synthetic sequence."""

import os

import numpy as np
import pytest

from sfmfromscratch_tpu.config import (
    BundleAdjustConfig,
    ExtractorConfig,
    MatcherConfig,
    PipelineConfig,
    RansacConfig,
)
from sfmfromscratch_tpu.ops.lie import so3_exp
from sfmfromscratch_tpu.pipeline.global_sfm import GlobalSfmEngine
from tests.render import render_sequence, write_sequence


@pytest.fixture(scope="module")
def rendered(tmp_path_factory):
    rng = np.random.default_rng(7)
    # Orbit rig rather than the incremental fixture's forward dolly: global
    # SfM derives every camera from two-view geometry alone, which is only
    # observable when parallax comfortably exceeds keypoint noise (the
    # incremental chain leans on PnP against triangulated structure instead).
    # 5 deg/view is TempleRing-class spacing.
    images, K, poses, X = render_sequence(
        rng, num_views=6, num_points=160, orbit_step_deg=5.0,
    )
    d = tmp_path_factory.mktemp("gseq")
    write_sequence(str(d), images)
    return dict(dir=str(d), K=K, poses=poses, X=X, n=len(images))


def _small_config():
    return PipelineConfig(
        extractor=ExtractorConfig(
            num_interest_points=400, ksize=3, gaussian_size=7, sigma=3.0,
            alpha=0.05, feature_width=16, pyramid_level=2, pyramid_scale_factor=1.2,
        ),
        matcher=MatcherConfig(ratio_threshold=0.85, max_matches=400),
        ransac=RansacConfig(max_iterations=384),
        ba=BundleAdjustConfig(max_lm_iters=15, ftol=1e-6),
        scale_factor=1.0,
    )


@pytest.fixture(scope="module")
def engine(rendered, tmp_path_factory):
    out = tmp_path_factory.mktemp("gout")
    return GlobalSfmEngine(
        rendered["dir"], rendered["n"], config=_small_config(),
        single_K=rendered["K"], model_name="gmodel", output_dir=str(out),
        pair_window=3, rel_num_hypotheses=512,
    )


def test_global_engine_reconstructs(engine, rendered):
    assert engine.map.num_tracks > 40
    # one pose per physical image, camera 0 = identity gauge
    assert len(engine.global_poses) == rendered["n"]
    rv0, t0 = engine.global_poses[0]
    assert np.allclose(rv0, 0, atol=1e-5) and np.allclose(t0, 0, atol=1e-5)
    err_before, err_after = engine.errors_before_after_ba
    assert err_after <= err_before + 1e-6
    assert err_after < 2.0


def test_global_rotations_match_ground_truth(engine, rendered):
    """Averaged absolute rotations (gauge-aligned to camera 0) should match
    ground truth within a few degrees."""
    gt = rendered["poses"]
    R0_gt = gt[0][0]
    for c in range(len(engine.global_poses)):
        rvec, _ = engine.global_poses[c]
        R = np.asarray(so3_exp(rvec.astype(np.float32)))
        gt_rel = gt[c][0] @ R0_gt.T        # camera c relative to camera 0
        dR = R @ gt_rel.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 5.0, f"camera {c}: {ang:.2f} deg"


def test_global_centers_match_ground_truth(engine, rendered):
    """Camera centers should match ground truth up to a global similarity
    (scale is unobservable): compare via Umeyama-aligned RMSE."""
    from sfmfromscratch_tpu.utils.metrics import absolute_trajectory_error

    gt = rendered["poses"]
    gt_c = np.stack([-R.T @ t for R, t in gt])
    est_c = []
    for rvec, t in engine.global_poses:
        R = np.asarray(so3_exp(rvec.astype(np.float32)), np.float64)
        est_c.append(-R.T @ t)
    est_c = np.stack(est_c)
    ate = absolute_trajectory_error(est_c, gt_c)
    extent = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
    assert ate / extent < 0.08, f"ATE {ate:.4f} vs extent {extent:.4f}"


def test_global_engine_saves(engine):
    path = os.path.join(engine.output_dir, "gmodel.npz")
    assert os.path.exists(path)
    data = GlobalSfmEngine.load("gmodel", output_dir=engine.output_dir, show=False)
    assert data["p3d"].shape[1] == 3
    assert data["poses"].shape[0] == len(engine.global_poses)


def test_global_multiview_tracks(engine):
    """The window pair graph must produce genuinely multi-view tracks (>= 3
    observations), which the reference's consecutive-pair chain never links."""
    frames, tracks, _ = engine.map.observations()
    counts = np.bincount(tracks, minlength=engine.map.num_tracks)
    assert (counts >= 3).sum() > 10


@pytest.mark.slow
def test_cli_global_pipeline(rendered, tmp_path, capsys):
    """`reconstruct --pipeline global` end-to-end through the CLI."""
    from sfmfromscratch_tpu.cli import main

    rc = main([
        "reconstruct", rendered["dir"], "--max-img", "4",
        "--focal", str(rendered["K"][0, 0]),
        "--scale-factor", "1.0", "--pipeline", "global",
        "--num-interest-points", "400", "--ksize", "3", "--sigma", "3.0",
        "--feature-width", "16", "--pyramid-level", "2",
        "--pyramid-scale-factor", "1.2", "--ransac-iterations", "384",
        "--model-name", "cli_g", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tracks=" in out and "mean reprojection error" in out
    assert (tmp_path / "cli_g.npz").exists()


@pytest.mark.slow
def test_global_engine_on_mesh(rendered, tmp_path):
    """Global pipeline on the virtual 8-device mesh: DP-sharded relative
    poses + sharded BA must match the single-device reconstruction quality."""
    from sfmfromscratch_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    eng = GlobalSfmEngine(
        rendered["dir"], rendered["n"], config=_small_config(),
        single_K=rendered["K"], output_dir=str(tmp_path),
        pair_window=3, rel_num_hypotheses=512, mesh=mesh,
    )
    eb, ea = eng.errors_before_after_ba
    assert ea < 2.0 and ea <= eb + 1e-6
    assert eng.map.num_tracks > 40


@pytest.mark.slow
def test_global_retrieval_unordered(tmp_path):
    """Retrieval pair selection reconstructs an UNORDERED collection — the
    images are shuffled so the sequential-window assumption is void. Uses the
    perspective-correct renderer: VLAD retrieval + the cycle filter must find
    the true neighbors among shuffled 10-deg-spaced views (the sprite
    renderer's unwarped patches made every wide pair garbage, so this test
    was previously seed-fragile)."""
    from sfmfromscratch_tpu.utils.metrics import absolute_trajectory_error
    from tests.render import render_planes

    rng = np.random.default_rng(3)
    images, K, poses, X = render_planes(
        rng, num_views=12, orbit_step_deg=10.0,
    )
    perm = rng.permutation(len(images))
    d = tmp_path / "shuffled"
    d.mkdir()
    write_sequence(str(d), [images[p] for p in perm])

    eng = GlobalSfmEngine(
        str(d), len(images), config=_small_config(), single_K=K,
        output_dir=str(tmp_path), pair_mode="retrieval", retrieval_k=4,
        rel_num_hypotheses=512,
    )
    eb, ea = eng.errors_before_after_ba
    assert ea < 2.0
    assert eng.map.num_tracks > 40

    gt_c = np.stack([-poses[p][0].T @ poses[p][1] for p in perm])
    est_c = []
    for rvec, t in eng.global_poses:
        R = np.asarray(so3_exp(rvec.astype(np.float32)), np.float64)
        est_c.append(-R.T @ t)
    ate = absolute_trajectory_error(np.stack(est_c), gt_c)
    extent = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
    assert ate / extent < 0.08, f"ATE {ate:.4f} vs extent {extent:.4f}"


@pytest.mark.slow
def test_keyframed_registration(tmp_path):
    """keyframe_step > 1: the view graph runs on every k-th frame and the
    rest register by batched PnP against the keyframe map. Pins the dense
    -video path (BASELINE config 5 at 1000 views: full-graph ATE ~13%,
    keyframed ~3.9% and 1.4x faster)."""
    import cv2

    from sfmfromscratch_tpu.utils.metrics import absolute_trajectory_error
    from tests.render import render_sequence, write_sequence

    rng = np.random.default_rng(11)
    N = 20
    images, K, poses, X = render_sequence(
        rng, num_views=N, num_points=300, img_hw=(240, 320), patch=11,
        orbit_step_deg=1.5,
    )
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)

    eng = GlobalSfmEngine(str(d), N, config=_small_config(), single_K=K,
                          pair_window=2, keyframe_step=2,
                          output_dir=str(tmp_path / "out"))
    assert len(eng.global_poses) == N          # every frame got a pose
    assert eng.errors_before_after_ba[1] < 2.0
    failed = [w for w in eng.warnings if "registration failed" in w]
    assert len(failed) <= 2

    C_est = []
    for rvec, t in eng.global_poses:
        R, _ = cv2.Rodrigues(np.asarray(rvec, np.float64).reshape(3, 1))
        C_est.append(-R.T @ np.asarray(t, np.float64).reshape(3))
    C_est = np.stack(C_est)
    C_gt = np.stack([-R.T @ np.asarray(t).reshape(3) for R, t in poses])
    ate = absolute_trajectory_error(C_est, C_gt)
    extent = np.linalg.norm(C_gt.max(0) - C_gt.min(0))
    assert 100 * ate / extent < 8.0


@pytest.mark.slow
def test_auto_keyframe_selection(tmp_path):
    """keyframe_step="auto": flow-adaptive selection picks sparser keyframes
    where the camera moves faster, and the reconstruction still lands."""
    from tests.render import render_sequence, write_sequence

    rng = np.random.default_rng(11)
    N = 20
    images, K, poses, X = render_sequence(
        rng, num_views=N, num_points=300, img_hw=(240, 320), patch=11,
        orbit_step_deg=1.5,
    )
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)

    eng = GlobalSfmEngine(str(d), N, config=_small_config(), single_K=K,
                          pair_window=2, keyframe_step="auto",
                          keyframe_flow_px=25.0,
                          output_dir=str(tmp_path / "out"))
    sel = [w for w in eng.warnings if "auto keyframes" in w]
    assert sel, eng.warnings
    assert 2 < len(eng.keyframes) < N        # actually subsampled
    assert len(eng.global_poses) == N
    assert eng.errors_before_after_ba[1] < 2.0


def test_connectivity_repair_restores_bridging_edges():
    """Edge dropping must never disconnect the view graph (a cut component
    keeps identity poses — measured 34% ATE on the 47-view sprite orbit
    before this guard): _repair_connectivity restores the best previously
    -weighted zeroed edges, damped, until the graph is connected."""
    import types

    eng = types.SimpleNamespace()
    eng.max_img = 6
    # chain 1-2-3 and 4-5-6 plus two dropped bridges (3,4) and (2,5).
    eng._edges = [(1, 2), (2, 3), (4, 5), (5, 6), (3, 4), (2, 5)]
    eng._edge_w = np.array([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    eng._edge_inl = {k: np.zeros(4, bool) for k in eng._edges}
    inl_prev = {k: np.ones(4, bool) for k in eng._edges}
    w_prev = np.array([1.0, 1.0, 1.0, 1.0, 0.4, 0.9])
    eng.warnings = []
    eng._connected = lambda alive: GlobalSfmEngine._connected(eng, alive)

    GlobalSfmEngine._repair_connectivity(eng, w_prev, inl_prev, "test")
    # the HIGHER-prior-weight bridge (2,5) is restored, damped; (3,4) stays 0
    assert eng._edge_w[5] == pytest.approx(0.25 * 0.9)
    assert eng._edge_w[4] == 0.0
    assert eng._edge_inl[(2, 5)].all()
    assert any("connectivity repair" in w for w in eng.warnings)
    # already-connected graphs are untouched
    before = eng._edge_w.copy()
    GlobalSfmEngine._repair_connectivity(eng, w_prev, inl_prev, "test2")
    np.testing.assert_array_equal(eng._edge_w, before)
