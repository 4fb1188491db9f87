"""Fixed-capacity masked container types (pytrees).

XLA requires static shapes, so every variable-length collection in the
reference (keypoints, matches, inliers, tracks — SURVEY.md §7.3) becomes a
fixed-capacity array plus a validity mask here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class Keypoints(NamedTuple):
    """Detected interest points, capacity-K with validity mask.

    Replaces the reference's variable-length (X, Y, confidences) triples
    (NaiveSIFT.py:42-45).
    """

    x: jax.Array          # (K,) int32 pixel column (level-0 coords)
    y: jax.Array          # (K,) int32 pixel row
    score: jax.Array      # (K,) float32 detector response
    mask: jax.Array       # (K,) bool
    xf: jax.Array         # (K,) float32 subpixel-refined column (== x when unrefined)
    yf: jax.Array         # (K,) float32 subpixel-refined row

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]


class Features(NamedTuple):
    """Keypoints plus their descriptors."""

    keypoints: Keypoints
    descriptors: jax.Array  # (K, 128) float32


class MatchResult(NamedTuple):
    """Fixed-capacity matches, best-first (reference NNRatioFeatureMatcher.py:56-58).

    ``indices[:, 0]`` indexes features1, ``indices[:, 1]`` features2.
    """

    indices: jax.Array      # (M, 2) int32
    confidence: jax.Array   # (M,) float32 = NN distance ratio (lower is better)
    mask: jax.Array         # (M,) bool


class PairGeometry(NamedTuple):
    """Per-image-pair matched pixel coordinates + intrinsics — the engine's
    equivalent of the reference's ``Matches`` record (Runner.py:118-125), but
    keeping the keypoint indices the reference discards (they enable exact
    index-based track linking instead of the reference's 5-px nearest-neighbor
    re-association, Runner.py:241-247)."""

    p1: jax.Array        # (M, 2) float32 pixel coords in image 1
    p2: jax.Array        # (M, 2) float32 pixel coords in image 2
    idx1: jax.Array      # (M,) int32 keypoint index in image 1
    idx2: jax.Array      # (M,) int32 keypoint index in image 2
    mask: jax.Array      # (M,) bool
    K1: jax.Array        # (3, 3)
    K2: jax.Array        # (3, 3)
