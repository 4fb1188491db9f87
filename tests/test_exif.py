"""EXIF-intrinsics path: real JPEG files with EXIF focal lengths feeding
per-image K through the engine — the reference's most-used input modality
(reference main.py:29-30, SFM.py:311-374, Runner.py:340-342).
"""

import os

import numpy as np
import pytest

from sfmfromscratch_tpu.geometry.camera import (
    SensorType,
    focal_length_from_exif,
    intrinsics_from_exif,
)
from tests.render import render_sequence, write_sequence

FOCAL_LENGTH_TAG = 0x920A  # 37386


# ---------------------------------------------------------------- unit level


def test_focal_from_exif_rational_tuple():
    # Older PIL returns FocalLength as a (numerator, denominator) tuple
    # (reference handles this at SFM.py:330-334).
    assert focal_length_from_exif({FOCAL_LENGTH_TAG: (44, 10)}) == pytest.approx(4.4)


def test_focal_from_exif_float():
    assert focal_length_from_exif({FOCAL_LENGTH_TAG: 26.0}) == pytest.approx(26.0)


def test_focal_from_exif_ifdrational():
    # Modern Pillow returns IFDRational (a Fraction subclass, not a tuple).
    from PIL.TiffImagePlugin import IFDRational

    assert focal_length_from_exif({FOCAL_LENGTH_TAG: IFDRational(263, 10)}) == pytest.approx(26.3)


def test_focal_from_exif_missing_tag():
    assert focal_length_from_exif({0x010F: "maker"}) is None


# ---------------------------------------------------------------- file level


def _write_jpeg(path, focal_mm=None, extra_tags=None, size=(64, 48)):
    from PIL import Image

    im = Image.fromarray(np.zeros((size[1], size[0], 3), np.uint8))
    kwargs = {}
    if focal_mm is not None or extra_tags:
        exif = Image.Exif()
        if focal_mm is not None:
            exif[FOCAL_LENGTH_TAG] = float(focal_mm)
        for k, v in (extra_tags or {}).items():
            exif[k] = v
        kwargs["exif"] = exif
    im.save(path, **kwargs)


def test_intrinsics_from_exif_roundtrip(tmp_path):
    p = str(tmp_path / "a.jpg")
    _write_jpeg(p, focal_mm=26.0, size=(472, 312))
    K = intrinsics_from_exif(p, SensorType.CROP_FRAME)
    # fx = f_mm * width / sensor_w_mm, fy = f_mm * height / sensor_h_mm
    # (reference SFM.py:366-372); CROP_FRAME = (23.6, 15.6) mm.
    assert K[0, 0] == pytest.approx(26.0 * 472 / 23.6)
    assert K[1, 1] == pytest.approx(26.0 * 312 / 15.6)
    assert K[0, 2] == pytest.approx(236.0) and K[1, 2] == pytest.approx(156.0)
    assert K[2, 2] == 1.0 and K[0, 1] == 0.0


def test_intrinsics_from_exif_no_exif_raises(tmp_path):
    p = str(tmp_path / "noexif.jpg")
    _write_jpeg(p, focal_mm=None)
    with pytest.raises(ValueError, match="EXIF"):
        intrinsics_from_exif(p, SensorType.CROP_FRAME)


def test_intrinsics_from_exif_no_focal_raises(tmp_path):
    # EXIF present but no FocalLength tag (reference raise at SFM.py:336-342).
    p = str(tmp_path / "nofocal.jpg")
    _write_jpeg(p, focal_mm=None, extra_tags={0x010F: "maker"})
    with pytest.raises(ValueError, match="focal"):
        intrinsics_from_exif(p, SensorType.CROP_FRAME)


def test_intrinsics_all_sensor_types(tmp_path):
    from sfmfromscratch_tpu.geometry.camera import SENSOR_DIMS_MM

    p = str(tmp_path / "s.jpg")
    _write_jpeg(p, focal_mm=10.0, size=(100, 80))
    for st in SensorType:
        K = intrinsics_from_exif(p, st)
        w_mm, h_mm = SENSOR_DIMS_MM[st]
        assert K[0, 0] == pytest.approx(10.0 * 100 / w_mm)
        assert K[1, 1] == pytest.approx(10.0 * 80 / h_mm)


# ----------------------------------------------------------------- e2e level


@pytest.mark.slow
def test_engine_exif_intrinsics_e2e(tmp_path):
    """Full SfmEngine run with per-image K from EXIF (no single_K), the path
    the reference drives at Runner.py:340-342.

    Image aspect 472x312 matches the CROP_FRAME sensor aspect exactly
    (472/312 = 23.6/15.6), so EXIF-derived K with focal 26 mm equals the
    render K (f = 26 * 472 / 23.6 = 520 px) on both axes.
    """
    from sfmfromscratch_tpu.config import PipelineConfig
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    rng = np.random.default_rng(3)
    images, K_render, poses, X = render_sequence(
        rng, num_views=4, num_points=160, img_hw=(312, 472), f=520.0,
        step_t=(-0.25, 0.02, 0.03), step_r=(0.01, -0.03, 0.006),
    )
    d = str(tmp_path)
    write_sequence(d, images, exif_focal_mm=26.0)

    # EXIF K equals render K on every image.
    for i in range(1, 5):
        K = intrinsics_from_exif(os.path.join(d, f"{i}.jpg"), SensorType.CROP_FRAME)
        np.testing.assert_allclose(K, K_render, rtol=1e-6)

    cfg = PipelineConfig(scale_factor=1.0)
    eng = SfmEngine(d, 4, config=cfg, camera_sensor=SensorType.CROP_FRAME)
    # Per-image K flowed through STAGE A: one K recorded per registered camera.
    assert len(eng.global_K) == len(eng.global_poses) >= 3
    for K in eng.global_K:
        np.testing.assert_allclose(K, K_render, rtol=1e-6)
    before, after = eng.errors_before_after_ba
    assert np.isfinite(after) and after < 2.0


@pytest.mark.slow
def test_engine_exif_scale_factor(tmp_path):
    """With scale_factor=0.5 the engine detects on half-res images and scales
    K to match (fixing the reference's K-vs-resolution inconsistency noted at
    incremental.py::_intrinsics)."""
    from sfmfromscratch_tpu.config import PipelineConfig
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    rng = np.random.default_rng(4)
    images, K_render, _, _ = render_sequence(
        rng, num_views=3, num_points=140, img_hw=(312, 472), f=520.0,
        step_t=(-0.25, 0.02, 0.03), step_r=(0.01, -0.03, 0.006),
    )
    d = str(tmp_path)
    write_sequence(d, images, exif_focal_mm=26.0)

    cfg = PipelineConfig(scale_factor=0.5)
    eng = SfmEngine(d, 3, config=cfg, camera_sensor=SensorType.CROP_FRAME,
                    on_pose_failure="recover")
    S = np.diag([0.5, 0.5, 1.0])
    for K in eng.global_K:
        np.testing.assert_allclose(K, S @ K_render, rtol=1e-6)
