"""Feature frontend: scale/rotation-invariant RootSIFT over an image pyramid,
plus the two-image ``FeatureRunner`` convenience wrapper.

This is the engine's equivalent of the reference's extractor hierarchy
(FeatureExtractor ABC -> NaiveSIFT -> ScaleRotInvSIFT,
FeatureExtractor/SIFT/*.py) and of ``FeatureRunner`` (Runner.py:22-115).
Per pyramid level the image shape is static, so each level is its own jitted
program; levels of a multi-image batch vmap over the leading axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig
from sfmfromscratch_tpu.ops.harris import detect_harris_keypoints
from sfmfromscratch_tpu.ops.image import build_pyramid, rgb_to_gray, resize_bilinear
from sfmfromscratch_tpu.ops.matcher import match_ratio_test
from sfmfromscratch_tpu.ops.sift import sift_descriptors
from sfmfromscratch_tpu.types import Features, Keypoints, MatchResult


def extract_features_single_scale(
    image_bw: jax.Array,
    cfg: ExtractorConfig,
    k: Optional[int] = None,
    feature_width: Optional[int] = None,
    rotation_invariant: bool = False,
) -> Features:
    """NaiveSIFT-equivalent: Harris + RootSIFT at one scale
    (reference NaiveSIFT.py:9-213)."""
    from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available

    k = k or cfg.num_interest_points
    fw = feature_width or cfg.feature_width
    kps = detect_harris_keypoints(
        image_bw, k=k, feature_width=fw, nms_ksize=cfg.ksize,
        gaussian_size=cfg.gaussian_size, sigma=cfg.sigma, alpha=cfg.alpha,
        use_pallas=pallas_tpu_available(),
    )
    desc = sift_descriptors(
        image_bw, kps.x, kps.y, kps.mask, feature_width=fw,
        rotation_invariant=rotation_invariant,
    )
    return Features(keypoints=kps, descriptors=desc)


def extract_features(image_bw: jax.Array, cfg: ExtractorConfig) -> Features:
    """ScaleRotInvSIFT-equivalent: per-pyramid-level Harris + rotation-invariant
    RootSIFT, keypoint coordinates rescaled to level-0 pixels
    (reference ScaleRotInvSIFT.py:89-107).

    Output capacity is ``(k // levels) * levels`` slots (reference budgets
    ``int(k / levels)`` per level, ScaleRotInvSIFT.py:90).
    """
    levels = build_pyramid(image_bw, cfg.pyramid_level, cfg.pyramid_scale_factor)
    per_level_k = int(cfg.num_interest_points / cfg.pyramid_level)
    min_fw = 3

    xs, ys, xfs, yfs, scores, masks, descs = [], [], [], [], [], [], []
    for level, img in enumerate(levels):
        scale = cfg.pyramid_scale_factor ** level
        fw = max(int(cfg.feature_width / scale), min_fw)
        feats = extract_features_single_scale(
            img, cfg, k=per_level_k, feature_width=fw, rotation_invariant=True
        )
        kp = feats.keypoints
        xs.append((kp.x.astype(jnp.float32) * scale).astype(jnp.int32))
        ys.append((kp.y.astype(jnp.float32) * scale).astype(jnp.int32))
        xfs.append(kp.xf * scale)
        yfs.append(kp.yf * scale)
        scores.append(kp.score)
        masks.append(kp.mask)
        descs.append(feats.descriptors)

    kps = Keypoints(
        x=jnp.concatenate(xs),
        y=jnp.concatenate(ys),
        score=jnp.concatenate(scores),
        mask=jnp.concatenate(masks),
        xf=jnp.concatenate(xfs),
        yf=jnp.concatenate(yfs),
    )
    return Features(keypoints=kps, descriptors=jnp.concatenate(descs))


def make_dog_extractor(cfg: ExtractorConfig):
    """DoG-frontend factory for the engine's ``feature_extractor`` slot:
    Difference-of-Gaussians scale-space detection (ops/dog.py — the north
    star's 'Harris/DoG' second detector family) + the same rotation-invariant
    RootSIFT descriptor stage. Returns a callable (image_bw) -> Features with
    the engine's fixed-capacity contract."""
    from sfmfromscratch_tpu.ops.dog import detect_dog_keypoints

    def extract(image_bw: jax.Array) -> Features:
        kps = detect_dog_keypoints(image_bw, k=cfg.num_interest_points)
        desc = sift_descriptors(
            image_bw, kps.x, kps.y, kps.mask,
            feature_width=max(cfg.feature_width, 16),
            rotation_invariant=True,
        )
        return Features(keypoints=kps, descriptors=desc)

    return extract


@functools.partial(jax.jit, static_argnames=("cfg", "serial"))
def extract_features_batch(
    images_bw: jax.Array, cfg: ExtractorConfig, serial: bool = False,
) -> Features:
    """Batched pyramid extraction: (B, H, W) images -> Features with leading
    batch axis. One compiled program for the whole image set; on a mesh, shard
    the batch axis for pair/data parallelism (SURVEY.md §2.3 item 1).

    Jitted with the (frozen, hashable) config static: executed eagerly this
    traced per-level Harris/SIFT programs plus ~7 eager concatenates per call,
    and over a tunneled chip every eager dispatch costs ~8-25 ms (round-3
    profiling) — the features stage's real cost was dispatch, not compute.

    ``serial=True`` runs the per-image program under ``lax.map`` instead of
    ``vmap`` — on a single chip this is 1.75x FASTER (measured: 68 vs 119 ms
    for 8 x 360x480 x 2500 kp): vmap turns SIFT's per-keypoint dynamic-slice
    patch windows into a doubly-batched gather that TPU executes poorly,
    while lax.map keeps the fast single-image gather and still compiles to
    ONE program. Use vmap (default) when the batch axis is SHARDED over a
    mesh — a scan over a sharded axis would serialize the DP story."""
    if serial:
        return jax.lax.map(lambda im: extract_features(im, cfg), images_bw)
    return jax.vmap(lambda im: extract_features(im, cfg))(images_bw)


def preprocess_image(img: np.ndarray, scale_factor: float) -> jax.Array:
    """Host decode output -> scaled grayscale device array
    (reference Runner.py:33-46: load, resize by scale_factor, rgb2gray)."""
    arr = jnp.asarray(img, dtype=jnp.float32)
    if arr.ndim == 3:
        arr = rgb_to_gray(arr)
    if scale_factor != 1.0:
        h, w = arr.shape
        arr = resize_bilinear(arr, (int(h * scale_factor), int(w * scale_factor)))
    return arr


@functools.partial(jax.jit, static_argnames=("scale_factor",))
def preprocess_image_batch(imgs: jax.Array, scale_factor: float) -> jax.Array:
    """Batched ``preprocess_image``: (B, H, W[, 3]) stacked decodes -> (B, h, w)
    grayscale, ONE device program + ONE upload for the whole chunk (the
    per-image eager path pays an upload plus 1-2 program launches per image —
    round-3 features-stage profile).  Accepts uint8 input (preferred: 4x less
    tunnel upload traffic).

    Numerics: uint8 -> [0,1] is CANONICALLY ``x * float32(1/255)``, not
    ``x / 255.0``.  XLA strength-reduces constant division to reciprocal
    multiply anyway, and its runtime f32 divide (reciprocal + Newton) is not
    bit-equal to the host's correctly-rounded divide — so the multiply form
    is the only one that is bit-identical between host numpy and every XLA
    backend (verified on CPU; round-3 regression hunt).  The vmapped
    gray/resize math is bit-identical to the per-image path."""
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    if imgs.ndim == 4:
        imgs = jax.vmap(rgb_to_gray)(imgs)
    if scale_factor != 1.0:
        h, w = imgs.shape[1], imgs.shape[2]
        out_hw = (int(h * scale_factor), int(w * scale_factor))
        imgs = jax.vmap(lambda a: resize_bilinear(a, out_hw))(imgs)
    return imgs


@dataclasses.dataclass
class FeatureRunner:
    """Two-view feature pipeline: load -> resize -> gray -> extract -> match
    (reference Runner.py:22-115). Operates on already-decoded numpy images or
    file paths."""

    features1: Features
    features2: Features
    matches: MatchResult
    image1_bw: jax.Array
    image2_bw: jax.Array

    @classmethod
    def run(
        cls,
        im1,
        im2,
        cfg: ExtractorConfig,
        matcher_cfg: MatcherConfig = MatcherConfig(),
        scale_factor: float = 0.5,
    ) -> "FeatureRunner":
        from sfmfromscratch_tpu.io.images import load_image
        from sfmfromscratch_tpu.utils.cache import maybe_enable_compile_cache

        maybe_enable_compile_cache()   # no-op unless the backend is a TPU
        if isinstance(im1, str):
            im1 = load_image(im1)
        if isinstance(im2, str):
            im2 = load_image(im2)
        g1 = preprocess_image(im1, scale_factor)
        g2 = preprocess_image(im2, scale_factor)
        f1 = extract_features(g1, cfg)
        f2 = extract_features(g2, cfg)
        from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available

        matches = match_ratio_test(
            f1.descriptors,
            f2.descriptors,
            f1.keypoints.mask,
            f2.keypoints.mask,
            ratio_threshold=matcher_cfg.ratio_threshold,
            max_matches=matcher_cfg.max_matches,
            use_pallas=pallas_tpu_available(),
        )
        return cls(features1=f1, features2=f2, matches=matches, image1_bw=g1, image2_bw=g2)


def matches_to_coords(
    matches: MatchResult, f1: Features, f2: Features, num_matches: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-``num_matches`` match indices -> (p1, p2, mask) pixel coordinate
    arrays (reference Runner.py:423-434 ``_convert_matches_to_coords``)."""
    idx = matches.indices[:num_matches]
    m = matches.mask[:num_matches]
    p1 = jnp.stack(
        [f1.keypoints.x[idx[:, 0]].astype(jnp.float32), f1.keypoints.y[idx[:, 0]].astype(jnp.float32)],
        axis=-1,
    )
    p2 = jnp.stack(
        [f2.keypoints.x[idx[:, 1]].astype(jnp.float32), f2.keypoints.y[idx[:, 1]].astype(jnp.float32)],
        axis=-1,
    )
    return p1, p2, m
