"""Two-view reconstruction: the minimum end-to-end slice (BASELINE config 1).

One call: images -> features -> ratio matches -> essential-matrix RANSAC ->
triangulation -> Gauss-Newton refinement -> (R, t, points, diagnostics).
Everything after host preprocessing is jitted device work.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig, RansacConfig
from sfmfromscratch_tpu.geometry.camera import projection_matrix, two_view_reprojection_error
from sfmfromscratch_tpu.geometry.ransac import ransac_essential_pose
from sfmfromscratch_tpu.geometry.triangulation import refine_points_gn, triangulate_dlt
from sfmfromscratch_tpu.pipeline.frontend import FeatureRunner, matches_to_coords


class TwoViewResult(NamedTuple):
    R: jax.Array             # (3, 3) relative rotation (cam1 -> cam2)
    t: jax.Array             # (3,) unit translation
    points: jax.Array        # (M, 3) triangulated points (masked)
    mask: jax.Array          # (M,) valid triangulated inliers
    p1: jax.Array            # (M, 2)
    p2: jax.Array            # (M, 2)
    num_inliers: jax.Array
    mean_reproj_error: jax.Array


def reconstruct_two_view(
    im1,
    im2,
    K: np.ndarray,
    extractor: Optional[ExtractorConfig] = None,
    matcher: Optional[MatcherConfig] = None,
    ransac: Optional[RansacConfig] = None,
    scale_factor: float = 1.0,
    seed: int = 5,
) -> TwoViewResult:
    """Full two-view pipeline on one image pair (paths or arrays)."""
    ecfg = extractor or ExtractorConfig()
    mcfg = matcher or MatcherConfig(ratio_threshold=0.85)
    rcfg = ransac or RansacConfig()

    fr = FeatureRunner.run(im1, im2, ecfg, mcfg, scale_factor=scale_factor)
    p1, p2, mask = matches_to_coords(fr.matches, fr.features1, fr.features2,
                                     mcfg.max_matches)
    Kj = jnp.asarray(K, dtype=jnp.float32)
    pose = ransac_essential_pose(
        jax.random.key(seed), p1, p2, Kj, Kj, mask,
        num_hypotheses=rcfg.num_iterations(),
        threshold=rcfg.epipolar_threshold,
        min_cheirality_frac=0.75,
    )
    P1 = projection_matrix(jnp.eye(3), jnp.zeros(3), Kj)
    P2 = projection_matrix(pose.R, pose.t, Kj)
    X = triangulate_dlt(p1, p2, P1, P2)
    X = refine_points_gn(X, p1, p2, P1, P2, mask=pose.inliers, num_iters=8)
    err = two_view_reprojection_error(X, p1, p2, P1, P2, mask=pose.inliers)
    return TwoViewResult(
        R=pose.R, t=pose.t, points=X, mask=pose.inliers, p1=p1, p2=p2,
        num_inliers=pose.num_inliers, mean_reproj_error=err,
    )
