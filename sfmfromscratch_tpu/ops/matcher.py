"""NN-ratio descriptor matching as a matmul + top-2 reduction.

Replaces the reference's dense (n1, n2, 128) broadcast + per-row full argsort +
Python ratio loop (NNRatioFeatureMatcher.py:31-51) with:

    ||a - b||^2 = ||a||^2 + ||b||^2 - 2 a.b^T

one (n1, 128) x (128, n2) matmul on the MXU followed by ``lax.top_k(k=2)``.
Outputs are fixed-capacity and sorted best-first (ascending NN distance ratio),
matching the reference's output contract (NNRatioFeatureMatcher.py:56-58).
A fused Pallas kernel (ops/pallas/match_kernel.py) computes the same result
without materializing the full distance matrix in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.types import MatchResult

_BIG = 1e12


def pairwise_sq_dists(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """(n1, D), (n2, D) -> (n1, n2) squared Euclidean distances via matmul."""
    n1sq = jnp.sum(d1 * d1, axis=-1, keepdims=True)
    n2sq = jnp.sum(d2 * d2, axis=-1, keepdims=True).T
    cross = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
    return jnp.maximum(n1sq + n2sq - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("max_matches", "use_pallas"))
def match_ratio_test(
    d1: jax.Array,
    d2: jax.Array,
    mask1: Optional[jax.Array] = None,
    mask2: Optional[jax.Array] = None,
    ratio_threshold: float = 0.8,
    max_matches: Optional[int] = None,
    use_pallas: bool = False,
) -> MatchResult:
    """Lowe's ratio-test matching, asymmetric (queries = rows of d1), matching
    reference semantics: accept row i iff d_first / d_second <= ratio and the
    second-best distance is > 0; output sorted ascending by ratio.

    Invalid rows/columns (masks) are excluded. Output capacity is
    ``max_matches`` (default n1) with a validity mask. ``use_pallas`` routes
    the distance/top-2 core through the fused VMEM-resident kernel
    (ops/pallas/match_kernel.py) on TPU backends.
    """
    n1 = d1.shape[0]
    # Capacity can never exceed the number of query rows (e.g. a 3-level
    # pyramid yields floor(k/3)*3 descriptors — fewer than the requested k).
    cap = min(max_matches, n1) if max_matches is not None else n1

    if use_pallas:
        from sfmfromscratch_tpu.ops.pallas.match_kernel import match_top2_fused

        sq1, sq2, nearest = match_top2_fused(d1, d2, mask2)
        dist1 = jnp.sqrt(sq1)
        dist2 = jnp.sqrt(sq2)
        nearest = nearest.astype(jnp.int32)
    else:
        sq = pairwise_sq_dists(d1, d2)
        if mask2 is not None:
            sq = jnp.where(mask2[None, :], sq, _BIG)
        # Need the two smallest distances per row.
        neg_top2, _idx2 = jax.lax.top_k(-sq, 2)
        dist1 = jnp.sqrt(jnp.maximum(-neg_top2[:, 0], 0.0))
        dist2 = jnp.sqrt(jnp.maximum(-neg_top2[:, 1], 0.0))
        nearest = _idx2[:, 0].astype(jnp.int32)

    ratio = dist1 / jnp.maximum(dist2, 1e-12)
    ok = (dist2 > 0) & (ratio <= ratio_threshold) & (dist2 < jnp.sqrt(_BIG) - 1)
    if mask1 is not None:
        ok = ok & mask1

    # Sort best-first over fixed capacity.
    sort_key = jnp.where(ok, ratio, jnp.inf)
    order_key, order = jax.lax.top_k(-sort_key, cap)
    rows = order.astype(jnp.int32)
    out_mask = jnp.isfinite(-order_key)
    indices = jnp.stack([rows, nearest[rows]], axis=-1)
    confidence = jnp.where(out_mask, ratio[rows], 0.0)
    indices = jnp.where(out_mask[:, None], indices, 0)
    return MatchResult(indices=indices, confidence=confidence, mask=out_mask)


@functools.partial(jax.jit, static_argnames=("max_matches", "use_pallas"))
def match_pairs_batch(
    descriptors: jax.Array,   # (C, K, D) per-image descriptor stacks
    kp_mask: jax.Array,       # (C, K) bool valid-keypoint masks
    kp_xf: jax.Array,         # (C, K) subpixel x per image
    kp_yf: jax.Array,         # (C, K) subpixel y per image
    pair_i: jax.Array,        # (B,) int32 first image index per pair
    pair_j: jax.Array,        # (B,) int32 second image index per pair
    ratio_threshold: jax.Array | float = 0.8,
    max_matches: Optional[int] = None,
    use_pallas: bool = False,
):
    """Ratio-test matching of MANY image pairs as ONE device program.

    The pipelines match hundreds of pairs per sequence; dispatching
    ``match_ratio_test`` per pair costs a host->device round trip each
    (~25 ms over a tunneled chip — 14 s of the 200-view run was exactly
    this). Here the per-image features stay device-resident, each pair's
    inputs are gathered on device from ``pair_i``/``pair_j``, and the whole
    batch runs as one vmapped matmul + top-2 program.

    Returns ``(MatchResult with (B, M, ...) leaves, p1, p2)`` where
    ``p1[b], p2[b]`` are the (M, 2) subpixel coordinates of pair ``b``'s
    matches (already gathered through the match indices, so downstream
    geometry never re-gathers on host).

    ``use_pallas=True`` routes the top-2 core through the natively-batched
    fused kernel (custom_vmap rule in ops/pallas/match_kernel.py) — no
    (B, K, K) HBM distance tensor: at 9 pairs x 2500^2 that tensor alone is
    225 MB of write+read traffic (~0.5 s of the round-2 headline wall).
    """
    d1, d2 = descriptors[pair_i], descriptors[pair_j]
    m1, m2 = kp_mask[pair_i], kp_mask[pair_j]

    res = jax.vmap(
        lambda a, b, ma, mb: match_ratio_test(
            a, b, ma, mb, ratio_threshold=ratio_threshold,
            max_matches=max_matches, use_pallas=use_pallas,
        )
    )(d1, d2, m1, m2)

    idx1, idx2 = res.indices[..., 0], res.indices[..., 1]
    take = lambda coord, pk, idx: jnp.take_along_axis(coord[pk], idx, axis=1)
    p1 = jnp.stack([take(kp_xf, pair_i, idx1), take(kp_yf, pair_i, idx1)], -1)
    p2 = jnp.stack([take(kp_xf, pair_j, idx2), take(kp_yf, pair_j, idx2)], -1)
    return res, p1.astype(jnp.float32), p2.astype(jnp.float32)
