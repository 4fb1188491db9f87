"""Degenerate-input robustness: the reference dies on any pose failure
(Runner.py:263-264); these tests pin the engine's graceful behavior on the
failure modes real collections contain — featureless frames, duplicate
(zero-baseline) images, minimal sequences, disconnected view graphs."""

import os
import shutil

import numpy as np
import pytest
from PIL import Image

from sfmfromscratch_tpu.pipeline.incremental import SfmEngine
from sfmfromscratch_tpu.pipeline.global_sfm import GlobalSfmEngine
from tests.render import render_sequence, write_sequence
from tests.test_pipeline import _small_config


@pytest.fixture(scope="module")
def orbit(tmp_path_factory):
    rng = np.random.default_rng(5)
    images, K, poses, X = render_sequence(
        rng, num_views=6, num_points=150, orbit_step_deg=4.0, img_hw=(240, 320)
    )
    d = tmp_path_factory.mktemp("orbit")
    write_sequence(str(d), images)
    return dict(dir=str(d), K=K, images=images)


@pytest.mark.slow
def test_featureless_frame_recovery(orbit, tmp_path):
    """A flat (featureless, zero-overlap) frame mid-sequence: incremental
    recover mode chains through it with warnings; the global pipeline keeps
    the reachable component and warns about the disconnected camera."""
    d = tmp_path / "seq"
    shutil.copytree(orbit["dir"], d)
    Image.fromarray(np.full((240, 320), 128, np.uint8)).save(str(d / "4.jpg"))

    eng = SfmEngine(str(d), 6, config=_small_config(), single_K=orbit["K"],
                    on_pose_failure="recover")
    assert len(eng.global_poses) == 5
    assert any("pose recovery engaged" in w for w in eng.warnings)
    assert eng.errors_before_after_ba[1] < 3.0

    geng = GlobalSfmEngine(str(d), 6, config=_small_config(),
                           single_K=orbit["K"], pair_window=3)
    assert len(geng.global_poses) == 6
    assert any("components" in w for w in geng.warnings)
    assert geng.errors_before_after_ba[1] < 3.0


@pytest.mark.slow
def test_duplicate_image_zero_baseline(orbit, tmp_path):
    """An exact duplicate frame (zero-baseline pair) must not break either
    pipeline: triangulation/averaging gates degenerate geometry instead of
    propagating it."""
    d = tmp_path / "seq"
    shutil.copytree(orbit["dir"], d)
    shutil.copy(str(d / "2.jpg"), str(d / "3.jpg"))

    eng = SfmEngine(str(d), 5, config=_small_config(), single_K=orbit["K"],
                    on_pose_failure="recover")
    assert eng.errors_before_after_ba[1] < 3.0

    geng = GlobalSfmEngine(str(d), 5, config=_small_config(),
                           single_K=orbit["K"], pair_window=2)
    assert geng.errors_before_after_ba[1] < 3.0


@pytest.mark.slow
def test_minimal_two_view_sequences(orbit, tmp_path):
    """max_img=2 degenerates to the bootstrap alone — both engines must
    produce a two-view reconstruction, not crash on an empty chain."""
    rng = np.random.default_rng(5)
    images, K, poses, X = render_sequence(
        rng, num_views=2, num_points=150, orbit_step_deg=4.0, img_hw=(240, 320)
    )
    d = tmp_path / "two"
    d.mkdir()
    write_sequence(str(d), images)
    eng = SfmEngine(str(d), 2, config=_small_config(), single_K=K)
    assert eng.errors_before_after_ba[1] < 3.0
    geng = GlobalSfmEngine(str(d), 2, config=_small_config(), single_K=K,
                           pair_window=2)
    assert geng.errors_before_after_ba[1] < 3.0
