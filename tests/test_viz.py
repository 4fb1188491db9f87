"""Visualization overlays (reference Runner.py:423-719 equivalents)."""

import numpy as np
import pytest

from sfmfromscratch_tpu.viz.overlays import (
    hstack_images,
    show_correspondence_circles,
    show_correspondence_lines,
    show_interest_points,
)


@pytest.fixture
def imgs(rng):
    a = rng.uniform(0, 1, (40, 60, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (50, 70, 3)).astype(np.float32)
    return a, b


def test_hstack(imgs):
    a, b = imgs
    out = hstack_images(a, b)
    assert out.shape == (50, 130, 3)
    np.testing.assert_allclose(out[:40, :60], a)
    np.testing.assert_allclose(out[:50, 60:], b)
    # zero-padded below the shorter image
    assert (out[40:, :60] == 0).all()


def test_hstack_grayscale(imgs):
    a, _ = imgs
    out = hstack_images(a[..., 0], a[..., 0])
    assert out.shape == (40, 120, 3)


def test_show_interest_points(imgs):
    a, _ = imgs
    out = show_interest_points(a, np.array([10, 30]), np.array([15, 25]), radius=3)
    assert out.shape == a.shape
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, a)  # something was drawn


def test_show_correspondence_lines(imgs):
    a, b = imgs
    out = show_correspondence_lines(
        a, b, [5, 20], [6, 21], [7, 22], [8, 23], width=2, radius=2
    )
    assert out.shape == (50, 130, 3)


def test_show_correspondence_circles(imgs):
    a, b = imgs
    out = show_correspondence_circles(a, b, [5], [6], [7], [8], radius=3)
    assert out.shape == (50, 130, 3)


def test_feature_and_match_figures(tmp_path, rng):
    from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig
    from sfmfromscratch_tpu.pipeline.frontend import FeatureRunner
    from sfmfromscratch_tpu.viz.overlays import save_feature_figure, save_match_figure

    img = rng.uniform(0, 0.3, (64, 80)).astype(np.float32)
    img[20:30, 30:40] += 0.6
    cfg = ExtractorConfig(num_interest_points=40, ksize=3, pyramid_level=1,
                          feature_width=16, sigma=3.0)
    fr = FeatureRunner.run(img, img, cfg, MatcherConfig(ratio_threshold=0.99, max_matches=40),
                           scale_factor=1.0)
    save_feature_figure(str(tmp_path / "f.png"), img, img, fr.features1, fr.features2)
    save_match_figure(str(tmp_path / "m.png"), img, img, fr.features1, fr.features2, fr.matches)
    assert (tmp_path / "f.png").exists()
    assert (tmp_path / "m.png").exists()

def test_compat_feature_runner_print_flags(tmp_path, rng):
    """The compat FeatureRunner honors the reference's debug-render flags
    (Runner.py:68-73): grayscale dumps, feature figure, match figure."""
    from PIL import Image

    from sfmfromscratch_tpu.compat import FeatureRunner

    img = (rng.uniform(0, 0.3, (64, 80, 3)) * 255).astype(np.uint8)
    img[20:30, 30:40] += 150
    p1 = str(tmp_path / "a.jpg")
    p2 = str(tmp_path / "b.jpg")
    Image.fromarray(img).save(p1)
    Image.fromarray(img).save(p2)
    out = tmp_path / "out"
    FeatureRunner(
        p1, p2, scale_factor=1.0,
        extractor_params={"num_interest_points": 40, "ksize": 3,
                          "pyramid_level": 1, "feature_width": 16, "sigma": 3.0},
        match_threshold=0.99, print_img=True, print_features=True,
        print_matches=True, output_dir=str(out),
    )
    for name in ("image1_bw.jpg", "image2_bw.jpg", "features.jpg", "matches.jpg"):
        assert (out / name).exists(), name
