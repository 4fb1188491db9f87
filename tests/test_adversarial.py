import pytest
"""Accuracy under non-ideal imaging (VERDICT round-2 item 6).

The reference's demo modality is real JPEG photographs (main.py:29-30) whose
sensors bring noise, exposure hunting and motion blur; every accuracy number
in this repo previously came from clean synthetics. ``degrade_sequence``
(tests/render.py) applies a measured-parameter imaging model — shot+read
noise, smooth exposure/gamma drift, directional motion blur on every third
frame — AFTER rendering, so the geometry ground truth is intact and the
accuracy deltas are attributable to imaging alone. Measured deltas are
tabulated in docs/PARITY.md.
"""

import numpy as np

from tests.render import degrade_sequence, render_planes, render_sequence, write_sequence


def _ate_pct(eng, poses):
    from sfmfromscratch_tpu.utils.metrics import (
        absolute_trajectory_error, camera_centers,
    )

    rvecs = np.stack([rv for rv, _ in eng.global_poses])
    ts = np.stack([t for _, t in eng.global_poses])
    est = camera_centers(rvecs, ts)
    start = 0 if len(est) == len(poses) else 1
    gt = np.stack([-(R.T @ t) for R, t in poses[start: start + len(est)]])
    extent = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    return 100 * absolute_trajectory_error(est, gt) / extent


def test_degrade_model_properties(rng):
    imgs = [rng.uniform(0, 1, (60, 80)).astype(np.float32) for _ in range(6)]
    out = degrade_sequence(rng, imgs)
    assert len(out) == 6
    for o, i in zip(out, imgs):
        assert o.shape == i.shape
        assert o.min() >= 0.0 and o.max() <= 1.0
        assert not np.allclose(o, i)
    # frame 2 (index 2, blur_every=3) is blurred: high-frequency energy drops
    def hf(x):
        return float(np.abs(np.diff(x, axis=1)).mean())
    assert hf(out[2]) < hf(out[1])


@pytest.mark.slow
def test_incremental_engine_on_degraded_sequence(rng, tmp_path):
    """Sequential engine, clean vs degraded imaging on the identical scene:
    the degraded run must still reconstruct (graceful degradation, not
    collapse). Perspective-correct renderer — the sprite renderer's 9-px
    texture stamps don't survive a 5-px motion blur, which is a renderer
    artifact, not an engine property (see tests/render.py docstrings)."""
    from tests.test_pipeline import _small_config
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    images, K, poses, _ = render_planes(rng, num_views=6, orbit_step_deg=3.0)
    clean = tmp_path / "clean"
    dirty = tmp_path / "dirty"
    for d, ims in ((clean, images), (dirty, degrade_sequence(rng, images))):
        d.mkdir()
        write_sequence(str(d), ims)

    e0 = SfmEngine(str(clean), 6, config=_small_config(), single_K=K)
    e1 = SfmEngine(str(dirty), 6, config=_small_config(), single_K=K)
    a0 = e0.errors_before_after_ba[1]
    a1 = e1.errors_before_after_ba[1]
    t0, t1 = _ate_pct(e0, poses), _ate_pct(e1, poses)
    print(f"\nadversarial(incremental): clean reproj {a0:.2f} px ATE {t0:.2f}%"
          f" | degraded reproj {a1:.2f} px ATE {t1:.2f}%")
    assert a1 < 2.5                       # still sub-pixel-ish after BA
    assert t1 < 8.0                       # trajectory survives the imaging
    assert e1.map.num_tracks > 0.4 * e0.map.num_tracks


@pytest.mark.slow
def test_global_engine_on_degraded_planes(rng, tmp_path):
    """Global engine on the perspective-correct renderer under the full
    imaging model — the closest fixture to the reference's real-photo demo."""
    from tests.test_pipeline import _small_config
    from sfmfromscratch_tpu.pipeline.global_sfm import GlobalSfmEngine

    images, K, poses, _ = render_planes(rng, num_views=8, orbit_step_deg=8.0)
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), degrade_sequence(rng, images))
    eng = GlobalSfmEngine(str(d), 8, config=_small_config(), single_K=K,
                          pair_window=3)
    a = eng.errors_before_after_ba[1]
    t = _ate_pct(eng, poses)
    print(f"\nadversarial(global/planes): reproj {a:.2f} px ATE {t:.2f}%")
    assert a < 2.0
    # This noisy 8-view scene is high-variance under descriptor tie-breaks:
    # measured 0.2-5% ATE across numerically-equivalent feature paths (vmap
    # vs lax.map batching). Same graceful-degradation bound as the
    # incremental fixture.
    assert t < 8.0
