import numpy as np
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig
from sfmfromscratch_tpu.ops.harris import detect_harris_keypoints, harris_response
from sfmfromscratch_tpu.ops.image import (
    conv2d_same,
    gaussian_kernel,
    rgb_to_gray,
    sobel_gradients,
    build_pyramid,
)
from sfmfromscratch_tpu.ops.matcher import match_ratio_test
from sfmfromscratch_tpu.ops.sift import sift_descriptors


@pytest.fixture(scope="module")
def checker_image(request):
    rng = np.random.default_rng(7)
    img = rng.uniform(0.0, 0.2, (96, 128)).astype(np.float32)
    # Bright blocks create strong corners.
    for (r, c) in [(20, 30), (50, 80), (70, 40), (30, 100)]:
        img[r : r + 12, c : c + 12] += 0.8
    return np.clip(img, 0, 1)


def _ref_modules():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from FeatureExtractor.SIFT.NaiveSIFT import NaiveSIFT
        from FeatureMatcher.NNRatioFeatureMatcher import NNRatioFeatureMatcher

        return NaiveSIFT, NNRatioFeatureMatcher
    except Exception:
        pytest.skip("reference unavailable")


def test_sobel_matches_cv2(checker_image):
    import cv2

    sx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    ref = cv2.filter2D(checker_image, -1, sx, borderType=cv2.BORDER_CONSTANT)
    Ix, _ = sobel_gradients(jnp.asarray(checker_image))
    np.testing.assert_allclose(np.asarray(Ix), ref, atol=1e-4)


def test_gaussian_kernel_matches_reference(checker_image):
    NaiveSIFT, _ = _ref_modules()
    ext = NaiveSIFT(checker_image, {"gaussian_size": 7, "sigma": 6})
    ref_k = ext._generate_gaussian_kernel(7, 6)
    ours = np.asarray(gaussian_kernel(7, 6.0))
    np.testing.assert_allclose(ours, ref_k, atol=1e-6)


def test_harris_response_matches_reference(checker_image):
    NaiveSIFT, _ = _ref_modules()
    import cv2

    ext = NaiveSIFT(checker_image, {"gaussian_size": 7, "sigma": 6, "alpha": 0.05})
    Ix, Iy = ext._compute_image_gradients(checker_image)
    g = ext._generate_gaussian_kernel(7, 6)
    Sxx = cv2.filter2D(Ix * Ix, -1, g, borderType=cv2.BORDER_CONSTANT)
    Sxy = cv2.filter2D(Ix * Iy, -1, g, borderType=cv2.BORDER_CONSTANT)
    Syy = cv2.filter2D(Iy * Iy, -1, g, borderType=cv2.BORDER_CONSTANT)
    ref_R = (Sxx * Syy - Sxy**2) - 0.05 * (Sxx + Syy) ** 2

    ours = np.asarray(harris_response(jnp.asarray(checker_image), 7, 6.0, 0.05))
    np.testing.assert_allclose(ours, ref_R, atol=1e-3 * np.abs(ref_R).max())


def test_harris_keypoints_match_reference_set(checker_image):
    NaiveSIFT, _ = _ref_modules()
    ext = NaiveSIFT(checker_image, {"ksize": 3, "gaussian_size": 7, "sigma": 6,
                                    "alpha": 0.05, "feature_width": 16})
    X_ref, Y_ref, _conf = ext._find_harris_interest_points(checker_image, 100, 16)
    kps = detect_harris_keypoints(
        jnp.asarray(checker_image), k=100, feature_width=16, nms_ksize=3,
        gaussian_size=7, sigma=6.0, alpha=0.05,
    )
    n = int(np.asarray(kps.mask).sum())
    ours = {(int(x), int(y)) for x, y in zip(np.asarray(kps.x)[:n], np.asarray(kps.y)[:n])}
    refs = {(int(x), int(y)) for x, y in zip(X_ref, Y_ref)}
    # Same candidate sets up to float32-vs-float64 response ties.
    inter = len(ours & refs)
    assert inter >= 0.9 * len(refs)


def test_sift_descriptor_matches_reference(checker_image):
    NaiveSIFT, _ = _ref_modules()
    ext = NaiveSIFT(checker_image, {"ksize": 3, "gaussian_size": 7, "sigma": 6,
                                    "alpha": 0.05, "feature_width": 16})
    X, Y, _ = ext._find_harris_interest_points(checker_image, 50, 16)
    ref_desc = ext._get_SIFT_descriptors(checker_image, X, Y, 16)

    mask = jnp.ones((len(X),), dtype=bool)
    ours = np.asarray(
        sift_descriptors(
            jnp.asarray(checker_image), jnp.asarray(X, dtype=jnp.int32),
            jnp.asarray(Y, dtype=jnp.int32), mask, feature_width=16,
            rotation_invariant=False,
        )
    )
    assert ours.shape == ref_desc.shape
    # Bin edges are float-sensitive; compare descriptors by cosine similarity.
    num = (ours * ref_desc).sum(axis=1)
    den = np.linalg.norm(ours, axis=1) * np.linalg.norm(ref_desc, axis=1) + 1e-12
    cos = num / den
    assert np.median(cos) > 0.99
    assert np.mean(cos > 0.95) > 0.9


def test_matcher_matches_reference(rng):
    _, NNRatioFeatureMatcher = _ref_modules()
    d1 = rng.uniform(0, 1, (80, 128)).astype(np.float32)
    d2 = rng.uniform(0, 1, (90, 128)).astype(np.float32)
    ref_matches, ref_conf = NNRatioFeatureMatcher(0.8).match_features_ratio_test(d1, d2)

    res = match_ratio_test(jnp.asarray(d1), jnp.asarray(d2), ratio_threshold=0.8)
    n = int(np.asarray(res.mask).sum())
    ours = np.asarray(res.indices)[:n]
    ref_set = {tuple(m) for m in ref_matches}
    ours_set = {tuple(m) for m in ours}
    assert ours_set == ref_set
    # Best-first ordering
    conf = np.asarray(res.confidence)[:n]
    assert (np.diff(conf) >= -1e-6).all()
    np.testing.assert_allclose(np.sort(conf), np.sort(ref_conf), atol=1e-4)


def test_matcher_masks(rng):
    d1 = rng.uniform(0, 1, (40, 128)).astype(np.float32)
    d2 = rng.uniform(0, 1, (40, 128)).astype(np.float32)
    # Make row 0 a perfect duplicate of db column 5 => strong match.
    d1[0] = d2[5]
    mask1 = np.ones(40, bool)
    mask2 = np.ones(40, bool)
    mask2[5] = False  # kill the match target
    res = match_ratio_test(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(mask1), jnp.asarray(mask2),
        ratio_threshold=0.8,
    )
    n = int(np.asarray(res.mask).sum())
    pairs = {tuple(m) for m in np.asarray(res.indices)[:n]}
    assert all(j != 5 for _, j in pairs)


def test_pyramid_shapes():
    img = jnp.zeros((100, 140))
    lv = build_pyramid(img, 3, 1.1)
    assert [l.shape for l in lv] == [(100, 140), (90, 127), (81, 115)]


def test_rgb_to_gray():
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 0] = 1.0
    g = np.asarray(rgb_to_gray(jnp.asarray(img)))
    np.testing.assert_allclose(g, 0.299, atol=1e-6)
