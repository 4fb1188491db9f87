"""Vectorized RANSAC: all hypotheses as one batched, jitted program.

The reference runs 5,967 sequential Python iterations, each with host SVDs and
(for pose) a full per-point DLT cheirality scan (SFM.py:38-160) — its dominant
hot loop (SURVEY.md §3.5). Here the entire hypothesis population is evaluated
at once:

* minimal-sample indices: masked uniform keys + ``top_k`` (no replacement),
* B fundamental matrices via one batched eigh (epipolar.eight_point_fundamental),
* B x N epipolar distances as one broadcasted matmul,
* cheirality via the closed-form two-view depth (triangulation.two_view_depths)
  instead of a DLT per point per candidate,
* argmax selection on-device.

Scoring semantics follow the reference: an inlier is a correspondence whose
point-to-epipolar-line distance in image 2 is below ``threshold``
(SFM.py:86-95); a pose candidate is acceptable when every valid correspondence
triangulates in front of both cameras (SFM.py:105-124), with a graceful
fallback to the max-cheirality candidate when noise makes the strict rule
unsatisfiable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.utils.precision import mm_f32

from sfmfromscratch_tpu.geometry.epipolar import (
    eight_point_fundamental,
    epipolar_distances,
    essential_from_fundamental,
)
from sfmfromscratch_tpu.geometry.triangulation import two_view_depths
from sfmfromscratch_tpu.ops.smallsvd import decompose_essential


class RansacPoseResult(NamedTuple):
    R: jax.Array            # (3, 3) best relative rotation
    t: jax.Array            # (3,) best unit translation
    F: jax.Array            # (3, 3) fundamental matrix of the winning hypothesis
    inliers: jax.Array      # (N,) bool epipolar-inlier mask
    num_inliers: jax.Array  # () int32
    cheirality_ok: jax.Array  # () bool: strict all-points-in-front held


class RansacFResult(NamedTuple):
    F: jax.Array
    inliers: jax.Array
    num_inliers: jax.Array


class RansacFAdaptiveResult(NamedTuple):
    F: jax.Array
    inliers: jax.Array
    num_inliers: jax.Array
    hyps_used: jax.Array    # () int32 — hypotheses actually evaluated


def _hypotheses_needed(
    best_count: jax.Array, n_valid: jax.Array, sample_size: int, confidence: float
) -> jax.Array:
    """Standard adaptive-RANSAC stopping rule: with inlier ratio w estimated
    from the best support so far, ``log(1-p) / log(1 - w^s)`` hypotheses give
    probability p of having drawn one all-inlier minimal sample (the closed
    form the reference evaluates once with an assumed w=0.4, SFM.py:184-187 —
    here re-evaluated from the DATA after every stage)."""
    w = best_count.astype(jnp.float32) / jnp.maximum(n_valid, 1).astype(jnp.float32)
    w = jnp.clip(w, 0.0, 1.0)
    fail = jnp.clip(1.0 - w**sample_size, 1e-12, 1.0 - 1e-7)
    return jnp.log1p(-confidence) / jnp.log(fail)


def sample_minimal_indices(
    key: jax.Array, n: int, mask: Optional[jax.Array], num_hypotheses: int, sample_size: int
) -> jax.Array:
    """(B, sample_size) distinct valid indices per hypothesis.

    Samples without replacement by ranking i.i.d. uniforms (invalid entries are
    pushed to the bottom) — the batched analogue of ``np.random.choice(...,
    replace=False)`` at SFM.py:49."""
    # Strided-bucket sampling: point j belongs to bucket j % s; each hypothesis
    # draws the minimum-key point of every bucket. Samples are distinct by
    # construction and each bucket sees an even share of the valid prefix
    # (matches arrive sorted valid-first). One batched argmin per bucket —
    # no sort-based top_k, no sequential carry — which is an order of
    # magnitude cheaper on TPU at B ~ 6000 hypotheses.
    m = n // sample_size
    # Only B*s random draws are needed (threefry over a (B, n) key tensor is
    # ~200 ms at B=6000 on v5e): draw a uniform per (hypothesis, bucket) and
    # map it to the r-th VALID member of the bucket via a rank comparison.
    u = jax.random.uniform(key, (num_hypotheses, sample_size))   # (B, s)
    if mask is None:
        loc = jnp.floor(u * m).astype(jnp.int32)
        loc = jnp.minimum(loc, m - 1)
    else:
        mask_bm = jnp.transpose(mask[: m * sample_size].reshape(m, sample_size))
        cnt = jnp.sum(mask_bm, axis=-1)                          # (s,) valid per bucket
        rank = jnp.cumsum(mask_bm.astype(jnp.int32), axis=-1)    # (s, m) 1..cnt
        k = jnp.floor(u * jnp.maximum(cnt, 1)[None, :]).astype(jnp.int32)
        k = jnp.minimum(k, jnp.maximum(cnt - 1, 0)[None, :])
        # position of the (k+1)-th valid member: #{i : rank_i <= k}
        loc = jnp.sum(
            (rank[None] <= k[:, :, None]).astype(jnp.int32), axis=-1
        )
        loc = jnp.minimum(loc, m - 1)
    offsets = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 1)  # bucket id
    return loc * sample_size + offsets


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
@mm_f32
def ransac_fundamental(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    mask: Optional[jax.Array] = None,
    num_hypotheses: int = 1000,
    threshold: float = 1.0,
    sample_size: int = 8,
) -> RansacFResult:
    """Robust fundamental-matrix inlier search — the reference's static
    ``find_inliers`` (SFM.py:126-160) as one program.

    Returns the winning F and its epipolar-inlier mask.
    """
    n = p1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    idx = sample_minimal_indices(key, n, mask, num_hypotheses, sample_size)
    sp1 = p1[idx]                        # (B, s, 2)
    sp2 = p2[idx]
    F = eight_point_fundamental(sp1, sp2)  # (B, 3, 3)
    d = epipolar_distances(F, p1, p2)      # (B, N)
    inl = (d < threshold) & mask[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    return RansacFResult(F=F[best], inliers=inl[best], num_inliers=scores[best])


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
@mm_f32
def ransac_fundamental_batch(
    keys: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    mask: jax.Array,
    num_hypotheses: int = 1000,
    threshold: float = 1.0,
    sample_size: int = 8,
) -> RansacFResult:
    """``ransac_fundamental`` vmapped over a leading pair axis: all image
    pairs' inlier filters run as ONE device program (the per-call dispatch and
    small-batch SVD overheads dominate when pairs are filtered one by one)."""
    return jax.vmap(
        lambda k, a, b, m: ransac_fundamental(
            k, a, b, m, num_hypotheses=num_hypotheses, threshold=threshold,
            sample_size=sample_size,
        )
    )(keys, p1, p2, mask)


@functools.partial(
    jax.jit,
    static_argnames=("max_hypotheses", "stage_size", "sample_size", "lo_rounds"),
)
@mm_f32
def ransac_fundamental_adaptive(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    mask: Optional[jax.Array] = None,
    max_hypotheses: int = 6144,
    stage_size: int = 512,
    threshold: float = 1.0,
    sample_size: int = 8,
    confidence: float = 0.98,
    lo_rounds: int = 2,
) -> RansacFAdaptiveResult:
    """Adaptive (early-terminating) fundamental-matrix RANSAC.

    One ``lax.while_loop`` over fixed-shape stages of ``stage_size``
    hypotheses: after each stage the required hypothesis count is re-derived
    from the best support found (``_hypotheses_needed``), so well-matched
    pairs stop after one or two stages while the worst case still evaluates
    ``max_hypotheses`` — the same guarantee as the fixed-count program for a
    fraction of the device work. XLA-friendly: every stage is the same
    fixed-shape batched program; only the trip count is data-dependent.

    Finishes with ``lo_rounds`` of locally-optimized refit (masked full-set
    8-point on the winner's inliers, kept when the MSAC score improves) — a
    quality upgrade over the reference's minimal-sample winner
    (SFM.py:126-160).
    """
    n = p1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    maskf = mask.astype(p1.dtype)
    n_valid = jnp.sum(mask)
    thr2 = jnp.asarray(threshold * threshold, p1.dtype)

    def score_stage(sub):
        idx = sample_minimal_indices(sub, n, mask, stage_size, sample_size)
        F = eight_point_fundamental(p1[idx], p2[idx])        # (S, 3, 3)
        d = epipolar_distances(F, p1, p2)                    # (S, N)
        inl = (d < threshold) & mask[None, :]
        cnt = jnp.sum(inl, axis=-1)
        msac = jnp.sum(jnp.minimum(d * d, thr2) * maskf[None, :], axis=-1)
        b = jnp.argmin(msac)
        return F[b], inl[b], msac[b], cnt[b]

    def cond(carry):
        _key, _F, _inl, _msac, best_cnt, done = carry
        needed = _hypotheses_needed(best_cnt, n_valid, sample_size, confidence)
        # Futility stop: the stopping rule asks for MORE effort exactly when a
        # pair is hopeless (w ~ 0 => needed ~ inf), so junk pairs would burn
        # the full budget — and under vmap stall their whole chunk. If two
        # stages found no support beyond the minimal sample, no model exists.
        futile = (done >= 2 * stage_size) & (best_cnt < sample_size + 4)
        return (done.astype(jnp.float32) < jnp.minimum(
            needed, float(max_hypotheses)
        )) & (done < max_hypotheses) & ~futile

    def body(carry):
        key, F_b, inl_b, msac_b, cnt_b, done = carry
        key, sub = jax.random.split(key)
        F_s, inl_s, msac_s, cnt_s = score_stage(sub)
        better = msac_s < msac_b
        F_b = jnp.where(better, F_s, F_b)
        inl_b = jnp.where(better, inl_s, inl_b)
        msac_b = jnp.where(better, msac_s, msac_b)
        cnt_b = jnp.where(better, cnt_s, cnt_b)
        return key, F_b, inl_b, msac_b, cnt_b, done + stage_size

    carry0 = (
        key,
        jnp.eye(3, dtype=p1.dtype),
        jnp.zeros((n,), dtype=bool),
        jnp.asarray(jnp.inf, p1.dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    _key, F_b, inl_b, msac_b, _cnt, done = jax.lax.while_loop(cond, body, carry0)

    # LO refit: full-inlier-set masked 8-point, keep on MSAC improvement.
    def lo_round(state, _):
        F_c, inl_c, msac_c = state
        F_r = eight_point_fundamental(p1, p2, mask=inl_c)
        d_r = epipolar_distances(F_r, p1, p2)
        msac_r = jnp.sum(jnp.minimum(d_r * d_r, thr2) * maskf)
        better = msac_r < msac_c
        F_c = jnp.where(better, F_r, F_c)
        inl_c = jnp.where(better, (d_r < threshold) & mask, inl_c)
        msac_c = jnp.where(better, msac_r, msac_c)
        return (F_c, inl_c, msac_c), None

    (F_b, inl_b, _), _ = jax.lax.scan(
        lo_round, (F_b, inl_b, msac_b), None, length=lo_rounds
    )
    return RansacFAdaptiveResult(
        F=F_b, inliers=inl_b, num_inliers=jnp.sum(inl_b), hyps_used=done
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_hypotheses", "stage_size", "sample_size", "lo_rounds"),
)
@mm_f32
def ransac_fundamental_adaptive_batch(
    keys: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    mask: jax.Array,
    max_hypotheses: int = 6144,
    stage_size: int = 512,
    threshold: float = 1.0,
    sample_size: int = 8,
    confidence: float = 0.98,
    lo_rounds: int = 2,
) -> RansacFAdaptiveResult:
    """``ransac_fundamental_adaptive`` vmapped over a leading pair axis.

    Under ``vmap`` the while-loop runs until every lane has met its stopping
    rule (finished lanes are frozen by the batching rule), so a chunk costs
    the max stage count over its pairs — typically 1-2 stages instead of the
    fixed program's 12."""
    return jax.vmap(
        lambda k, a, b, m: ransac_fundamental_adaptive(
            k, a, b, m,
            max_hypotheses=max_hypotheses, stage_size=stage_size,
            threshold=threshold, sample_size=sample_size,
            confidence=confidence, lo_rounds=lo_rounds,
        )
    )(keys, p1, p2, mask)


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "sample_size", "cheirality_subset")
)
@mm_f32
def ransac_essential_pose(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    K1: jax.Array,
    K2: jax.Array,
    mask: Optional[jax.Array] = None,
    num_hypotheses: int = 1000,
    threshold: float = 1.0,
    sample_size: int = 8,
    min_cheirality_frac: float = 1.0,
    cheirality_subset: int = 1024,
    R_base: Optional[jax.Array] = None,
    t_base: Optional[jax.Array] = None,
) -> RansacPoseResult:
    """Relative-pose RANSAC — the reference's ``ransac_camera_motion``
    (SFM.py:38-103) fully vectorized.

    Per hypothesis: 8-point F -> E = K2^T F K1 -> 4 (R, t) candidates; the
    candidate with the most points in front of both cameras wins; a hypothesis
    is 'strict' when its winner has a cheirality fraction >= ``min_cheirality_frac``
    (the reference demands 1.0, SFM.py:105-124). Strict hypotheses are ranked by
    epipolar inlier count; if none is strict, the max-cheirality hypothesis wins.
    By default the base camera is canonical (R=I, t=0), as in the pipeline's
    only use (Runner.py:202-203). A non-canonical base (``R_base``/``t_base``)
    reproduces the reference signature's full surface (SFM.py:38-44): the base
    pose enters only the cheirality check, where the reference triangulates
    with P1 = K1[R_base|t_base] and P2 = K2[R_cand|t_cand] (SFM.py:105-124) —
    equivalent to a canonical-frame depth test under the transformed candidate
    R' = R_cand R_base^T, t' = t_cand - R' t_base.

    Cheirality is evaluated on the first ``cheirality_subset`` correspondences
    (matches arrive sorted best-first, so this is the highest-confidence
    subset); the reference triangulates every point per candidate, which at
    B=5967 x 4 candidates x N=2500 points materializes multi-GB intermediates
    for no statistical gain.
    """
    n = p1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    n_valid = jnp.sum(mask)

    idx = sample_minimal_indices(key, n, mask, num_hypotheses, sample_size)
    F = eight_point_fundamental(p1[idx], p2[idx])            # (B, 3, 3)
    E = essential_from_fundamental(F, K1, K2)
    R1, R2, t = decompose_essential(E)                       # (B,3,3) x2, (B,3)

    Rc = jnp.stack([R1, R1, R2, R2], axis=1)                 # (B, 4, 3, 3)
    tc = jnp.stack([t, -t, t, -t], axis=1)                   # (B, 4, 3)

    def che_pose(Rcand, tcand):
        """Pose used for the depth test; identity map for a canonical base."""
        if R_base is None:
            return Rcand, tcand
        Rb = jnp.asarray(R_base, Rcand.dtype)
        tb = jnp.asarray(t_base, tcand.dtype)
        Rr = Rcand @ Rb.T
        tr = tcand - jnp.einsum("...ij,j->...i", Rr, tb)
        return Rr, tr

    ns = min(cheirality_subset, n)
    p1_s, p2_s, mask_s = p1[:ns], p2[:ns], mask[:ns]
    n_valid_s = jnp.sum(mask_s)
    z1, z2 = two_view_depths(*che_pose(Rc, tc), p1_s, p2_s, K1, K2)  # (B, 4, ns)
    eps = 1e-6
    front = (z1 > eps) & (z2 > eps) & mask_s[None, None, :]
    che_count = jnp.sum(front, axis=-1)                      # (B, 4)
    best_cand = jnp.argmax(che_count, axis=-1)               # (B,)
    best_che = jnp.max(che_count, axis=-1)                   # (B,)

    d = epipolar_distances(F, p1, p2)                        # (B, N)
    inl = (d < threshold) & mask[None, :]
    inliers = jnp.sum(inl, axis=-1)                          # (B,)
    # MSAC score: truncated squared distances. Inlier *count* plateaus when
    # several basins fit ~the same support (small-baseline pairs); the
    # residual-weighted score still separates them.
    thr2 = jnp.asarray(threshold * threshold, d.dtype)
    msac = jnp.sum(jnp.minimum(d * d, thr2) * mask[None, :], axis=-1)

    strict = best_che >= (min_cheirality_frac * n_valid_s).astype(best_che.dtype)
    strict_score = jnp.where(strict, -msac, -jnp.inf)
    any_strict = jnp.max(strict_score) > -jnp.inf
    best_strict = jnp.argmax(strict_score)
    best_loose = jnp.argmax(best_che * (n + 1) + inliers)
    best = jnp.where(any_strict, best_strict, best_loose)

    # Locally-optimized refit (LO-RANSAC): re-solve F from the winner's FULL
    # inlier set (masked normalized n-point), keep it if the MSAC score
    # improves; two rounds. The minimal-sample winner fixes the basin, the
    # refit reaches the basin's bottom — decisive on small-baseline pairs
    # where 8-point noise is comparable to the parallax.
    def lo_round(state, _):
        F_b, inl_b, msac_b = state
        F_r = eight_point_fundamental(p1, p2, mask=inl_b)
        d_r = epipolar_distances(F_r, p1, p2)
        msac_r = jnp.sum(jnp.minimum(d_r * d_r, thr2) * mask)
        better = msac_r < msac_b
        F_b = jnp.where(better, F_r, F_b)
        inl_b = jnp.where(better, (d_r < threshold) & mask, inl_b)
        msac_b = jnp.where(better, msac_r, msac_b)
        return (F_b, inl_b, msac_b), None

    (F_best, inl_best, _), _ = jax.lax.scan(
        lo_round, (F[best], inl[best], msac[best]), None, length=2
    )

    # Decompose the refit F's essential matrix and re-select the cheirality
    # candidate (the LO refit can change the pose, not just the inlier set).
    E_f = essential_from_fundamental(F_best[None], K1, K2)
    R1f, R2f, tf = decompose_essential(E_f)
    Rcf = jnp.stack([R1f, R1f, R2f, R2f], axis=1)[0]         # (4, 3, 3)
    tcf = jnp.stack([tf, -tf, tf, -tf], axis=1)[0]           # (4, 3)
    z1f, z2f = two_view_depths(*che_pose(Rcf, tcf), p1_s, p2_s, K1, K2)  # (4, ns)
    front_f = (z1f > eps) & (z2f > eps) & mask_s[None, :]
    che_f = jnp.sum(front_f, axis=-1)                        # (4,)
    cand = jnp.argmax(che_f)
    strict_f = jnp.max(che_f) >= (
        min_cheirality_frac * n_valid_s
    ).astype(che_f.dtype)

    return RansacPoseResult(
        R=Rcf[cand],
        t=tcf[cand],
        F=F_best,
        inliers=inl_best,
        num_inliers=jnp.sum(inl_best),
        cheirality_ok=strict_f,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_hypotheses", "stage_size", "sample_size", "cheirality_subset"
    ),
)
@mm_f32
def ransac_essential_pose_adaptive(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    K1: jax.Array,
    K2: jax.Array,
    mask: Optional[jax.Array] = None,
    max_hypotheses: int = 6144,
    stage_size: int = 512,
    threshold: float = 1.0,
    sample_size: int = 8,
    confidence: float = 0.98,
    min_cheirality_frac: float = 1.0,
    cheirality_subset: int = 1024,
) -> RansacPoseResult:
    """Adaptive (early-terminating) relative-pose RANSAC.

    Same hypothesis pipeline as :func:`ransac_essential_pose` (8-point F ->
    E -> 4 candidates -> cheirality + MSAC ranking) but evaluated in
    fixed-shape stages inside one ``lax.while_loop`` with the standard
    adaptive stopping rule (``_hypotheses_needed``), then finished with the
    same LO refit + candidate re-selection tail. Typical pairs stop after
    1-2 stages; the worst case matches the fixed-count program."""
    n = p1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    maskf = mask.astype(p1.dtype)
    n_valid = jnp.sum(mask)
    thr2 = jnp.asarray(threshold * threshold, p1.dtype)

    ns = min(cheirality_subset, n)
    p1_s, p2_s, mask_s = p1[:ns], p2[:ns], mask[:ns]
    n_valid_s = jnp.sum(mask_s)
    eps = 1e-6
    min_strict = (min_cheirality_frac * n_valid_s).astype(jnp.int32)

    def score_stage(sub):
        idx = sample_minimal_indices(sub, n, mask, stage_size, sample_size)
        F = eight_point_fundamental(p1[idx], p2[idx])            # (S, 3, 3)
        E = essential_from_fundamental(F, K1, K2)
        R1, R2, t = decompose_essential(E)
        Rc = jnp.stack([R1, R1, R2, R2], axis=1)                 # (S, 4, 3, 3)
        tc = jnp.stack([t, -t, t, -t], axis=1)                   # (S, 4, 3)
        z1, z2 = two_view_depths(Rc, tc, p1_s, p2_s, K1, K2)     # (S, 4, ns)
        front = (z1 > eps) & (z2 > eps) & mask_s[None, None, :]
        best_che = jnp.max(jnp.sum(front, axis=-1), axis=-1)     # (S,)
        d = epipolar_distances(F, p1, p2)                        # (S, N)
        inl = (d < threshold) & mask[None, :]
        cnt = jnp.sum(inl, axis=-1)
        msac = jnp.sum(jnp.minimum(d * d, thr2) * maskf[None, :], axis=-1)
        strict = best_che >= min_strict
        s_score = jnp.where(strict, -msac, -jnp.inf)
        sb = jnp.argmax(s_score)
        lb = jnp.argmax(best_che * (n + 1) + cnt)
        return (
            F[sb], inl[sb], msac[sb], cnt[sb], strict[sb],
            F[lb], inl[lb], cnt[lb],
            (best_che * (n + 1) + cnt)[lb],
        )

    def cond(carry):
        (_key, done, _Fs, _inls, _msacs, _has_s, _Fl, _inll, _lsc, best_cnt) = carry
        needed = _hypotheses_needed(best_cnt, n_valid, sample_size, confidence)
        # Futility stop (see ransac_fundamental_adaptive): junk pairs must not
        # burn the full budget and stall their vmapped chunk.
        futile = (done >= 2 * stage_size) & (best_cnt < sample_size + 4)
        return (done.astype(jnp.float32) < jnp.minimum(
            needed, float(max_hypotheses)
        )) & (done < max_hypotheses) & ~futile

    def body(carry):
        key, done, F_s, inl_s, msac_s, has_s, F_l, inl_l, lsc, best_cnt = carry
        key, sub = jax.random.split(key)
        (Fsb, inlsb, msacsb, cntsb, strictsb,
         Flb, inllb, cntlb, lscb) = score_stage(sub)
        sb_better = strictsb & (msacsb < msac_s)
        F_s = jnp.where(sb_better, Fsb, F_s)
        inl_s = jnp.where(sb_better, inlsb, inl_s)
        msac_s = jnp.where(sb_better, msacsb, msac_s)
        has_s = has_s | strictsb
        lb_better = lscb > lsc
        F_l = jnp.where(lb_better, Flb, F_l)
        inl_l = jnp.where(lb_better, inllb, inl_l)
        lsc = jnp.where(lb_better, lscb, lsc)
        # Stopping rule follows the support of the current winner.
        best_cnt = jnp.maximum(
            best_cnt, jnp.where(sb_better | (strictsb & ~has_s), cntsb, 0)
        )
        best_cnt = jnp.maximum(best_cnt, jnp.where(has_s, best_cnt, cntlb))
        return (key, done + stage_size, F_s, inl_s, msac_s, has_s,
                F_l, inl_l, lsc, best_cnt)

    carry0 = (
        key,
        jnp.asarray(0, jnp.int32),
        jnp.eye(3, dtype=p1.dtype),
        jnp.zeros((n,), dtype=bool),
        jnp.asarray(jnp.inf, p1.dtype),
        jnp.asarray(False),
        jnp.eye(3, dtype=p1.dtype),
        jnp.zeros((n,), dtype=bool),
        jnp.asarray(-jnp.inf, jnp.float32),
        jnp.asarray(0, jnp.int32),
    )
    (_k, _done, F_s, inl_s, msac_s, has_s, F_l, inl_l, _lsc, _bc) = (
        jax.lax.while_loop(cond, body, carry0)
    )
    F0 = jnp.where(has_s, F_s, F_l)
    inl0 = jnp.where(has_s, inl_s, inl_l)
    msac0 = jnp.where(
        has_s, msac_s,
        jnp.sum(
            jnp.minimum(
                epipolar_distances(F_l[None], p1, p2)[0] ** 2, thr2
            ) * maskf
        ),
    )

    # LO refit + pose decomposition (same tail as the fixed-count program).
    def lo_round(state, _):
        F_b, inl_b, msac_b = state
        F_r = eight_point_fundamental(p1, p2, mask=inl_b)
        d_r = epipolar_distances(F_r, p1, p2)
        msac_r = jnp.sum(jnp.minimum(d_r * d_r, thr2) * maskf)
        better = msac_r < msac_b
        F_b = jnp.where(better, F_r, F_b)
        inl_b = jnp.where(better, (d_r < threshold) & mask, inl_b)
        msac_b = jnp.where(better, msac_r, msac_b)
        return (F_b, inl_b, msac_b), None

    (F_best, inl_best, _), _ = jax.lax.scan(
        lo_round, (F0, inl0, msac0), None, length=2
    )

    E_f = essential_from_fundamental(F_best[None], K1, K2)
    R1f, R2f, tf = decompose_essential(E_f)
    Rcf = jnp.stack([R1f, R1f, R2f, R2f], axis=1)[0]
    tcf = jnp.stack([tf, -tf, tf, -tf], axis=1)[0]
    z1f, z2f = two_view_depths(Rcf, tcf, p1_s, p2_s, K1, K2)
    front_f = (z1f > eps) & (z2f > eps) & mask_s[None, :]
    che_f = jnp.sum(front_f, axis=-1)
    cand = jnp.argmax(che_f)
    strict_f = jnp.max(che_f) >= min_strict

    return RansacPoseResult(
        R=Rcf[cand],
        t=tcf[cand],
        F=F_best,
        inliers=inl_best,
        num_inliers=jnp.sum(inl_best),
        cheirality_ok=strict_f,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_hypotheses", "stage_size", "sample_size", "cheirality_subset"
    ),
)
@mm_f32
def ransac_essential_pose_adaptive_batch(
    keys: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    K1: jax.Array,
    K2: jax.Array,
    mask: jax.Array,
    max_hypotheses: int = 6144,
    stage_size: int = 256,
    threshold: float = 1.0,
    sample_size: int = 8,
    confidence: float = 0.98,
    min_cheirality_frac: float = 0.75,
    cheirality_subset: int = 512,
) -> RansacPoseResult:
    """``ransac_essential_pose_adaptive`` vmapped over a leading pair axis
    (the global view-graph stage): finished lanes freeze while stragglers
    keep drawing, so a chunk costs its max lane's stages."""
    return jax.vmap(
        lambda k, a, b, ka, kb, m: ransac_essential_pose_adaptive(
            k, a, b, ka, kb, m,
            max_hypotheses=max_hypotheses, stage_size=stage_size,
            threshold=threshold, sample_size=sample_size,
            confidence=confidence, min_cheirality_frac=min_cheirality_frac,
            cheirality_subset=cheirality_subset,
        )
    )(keys, p1, p2, K1, K2, mask)


@functools.partial(
    jax.jit,
    static_argnames=("num_hypotheses", "sample_size", "cheirality_subset"),
)
@mm_f32
def ransac_essential_pose_batch(
    keys: jax.Array,         # (P,) PRNG keys
    p1: jax.Array,           # (P, N, 2)
    p2: jax.Array,           # (P, N, 2)
    K1: jax.Array,           # (P, 3, 3)
    K2: jax.Array,           # (P, 3, 3)
    mask: jax.Array,         # (P, N) bool
    num_hypotheses: int = 1024,
    threshold: float = 1.0,
    sample_size: int = 8,
    min_cheirality_frac: float = 0.75,
    cheirality_subset: int = 512,
) -> RansacPoseResult:
    """``ransac_essential_pose`` vmapped over a leading pair axis — the global
    view-graph stage: relative poses of a whole batch of image pairs as ONE
    device program (each pair carries its own intrinsics). The per-pair masks
    are expected to be pre-filtered epipolar inliers (pipeline STAGE A), so a
    modest hypothesis count suffices."""
    return jax.vmap(
        lambda k, a, b, ka, kb, m: ransac_essential_pose(
            k, a, b, ka, kb, m,
            num_hypotheses=num_hypotheses, threshold=threshold,
            sample_size=sample_size, min_cheirality_frac=min_cheirality_frac,
            cheirality_subset=cheirality_subset,
        )
    )(keys, p1, p2, K1, K2, mask)
