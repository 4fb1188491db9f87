"""Wide-baseline shootout: TinyPoint (synthetic-trained) vs the SIFT frontend.

For each orbit step (baseline angle), render a perspective-correct two-view
pair (tests/render.render_planes), run both extractors + the ratio-test
matcher, and score the epipolar-inlier rate of the resulting matches against
the GROUND-TRUTH essential matrix (no RANSAC in the loop — the metric is
pure match quality). This is VERDICT round-1 item 6's acceptance check.

Usage: python tools/eval_superpoint.py [steps_deg ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _skew(t):
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])


def gt_epipolar_inliers(p1, p2, K, R1, t1, R2, t2, thresh=2.0):
    """Symmetric epipolar distance against the ground-truth relative pose."""
    R = R2 @ R1.T
    t = t2 - R @ t1
    E = _skew(t) @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    ph1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
    ph2 = np.concatenate([p2, np.ones((len(p2), 1))], 1)
    l2 = ph1 @ F.T
    l1 = ph2 @ F
    num = np.abs(np.sum(ph2 * l2, 1))
    d = 0.5 * (num / np.linalg.norm(l2[:, :2], axis=1)
               + num / np.linalg.norm(l1[:, :2], axis=1))
    return d <= thresh


def run_pair(step_deg, seed=0):
    import jax.numpy as jnp

    from tests.render import render_planes
    from sfmfromscratch_tpu.config import ExtractorConfig
    from sfmfromscratch_tpu.ops.matcher import match_ratio_test
    from sfmfromscratch_tpu.ops.superpoint import SuperPointExtractor
    from sfmfromscratch_tpu.pipeline.frontend import extract_features

    rng = np.random.default_rng(seed)
    images, K, poses = render_planes(
        rng, num_views=2, img_hw=(240, 320), f=400.0, orbit_step_deg=step_deg,
    )[:3]
    (R1, t1), (R2, t2) = poses[0], poses[1]
    im1, im2 = (jnp.asarray(im, jnp.float32) for im in images)

    def score(feats1, feats2, use_float_coords=False):
        res = match_ratio_test(
            feats1.descriptors, feats2.descriptors,
            feats1.keypoints.mask, feats2.keypoints.mask, ratio_threshold=0.85,
        )
        n = int(np.asarray(res.mask).sum())
        if n < 8:
            return 0, 0.0
        idx = np.asarray(res.indices)[:n]
        kp1, kp2 = feats1.keypoints, feats2.keypoints
        p1 = np.stack([np.asarray(kp1.xf)[idx[:, 0]], np.asarray(kp1.yf)[idx[:, 0]]], 1)
        p2 = np.stack([np.asarray(kp2.xf)[idx[:, 1]], np.asarray(kp2.yf)[idx[:, 1]]], 1)
        inl = gt_epipolar_inliers(p1, p2, K, R1, t1, R2, t2)
        return n, float(inl.mean())

    cfg = ExtractorConfig(
        num_interest_points=600, ksize=3, gaussian_size=7, sigma=3.0,
        alpha=0.05, feature_width=16, pyramid_level=3, pyramid_scale_factor=1.2,
    )
    sift1, sift2 = extract_features(im1, cfg), extract_features(im2, cfg)
    n_s, r_s = score(sift1, sift2)

    ext = SuperPointExtractor()  # auto: in-repo TinyPoint checkpoint
    tp1, tp2 = ext(im1, k=600), ext(im2, k=600)
    n_t, r_t = score(tp1, tp2)

    from sfmfromscratch_tpu.ops.superpoint import make_hybrid_extractor

    hyb = make_hybrid_extractor(k=600)
    h1, h2 = hyb(im1), hyb(im2)
    n_h, r_h = score(h1, h2)
    return (n_s, r_s), (n_t, r_t), (n_h, r_h)


def main():
    steps = [float(a) for a in sys.argv[1:]] or [8, 14, 20, 26, 32]
    print(f"{'step':>6} | {'SIFT n':>7} {'inl%':>6} | {'TinyPoint n':>11} "
          f"{'inl%':>6} | {'hybrid n':>8} {'inl%':>6}")
    for s in steps:
        (n_s, r_s), (n_t, r_t), (n_h, r_h) = run_pair(s)
        print(f"{s:6.0f} | {n_s:7d} {100*r_s:5.1f}% | {n_t:11d} {100*r_t:5.1f}%"
              f" | {n_h:8d} {100*r_h:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
