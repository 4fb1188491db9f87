"""Planar two-view geometry: homography fit, degeneracy detection, and
pose-from-homography decomposition.

Plane-dominant image pairs are DEGENERATE for the 8-point fundamental/essential
pipeline: a match set explained by one homography ``p2 ~ H p1`` is compatible
with a whole family ``F = [e2]x H`` of fundamental matrices, so the minimal
-sample E winner (and its Sampson refinement, whose cost is flat along the
family) can land 10-20 deg off in rotation while scoring perfect epipolar
inliers (observed on the plane renderer: cv2's own findEssentialMat +
recoverPose is 14 deg off on such pairs).  The cure used by production SfM
(DEGENSAC, ORB-SLAM's H/F model selection) is to detect H-dominant support and
recover the relative pose by DECOMPOSING the homography instead — for a truly
planar match set that decomposition is well-posed.

All routines are batched, fixed-shape, mask-aware jitted programs (one program
for a whole edge set; TPU-first).  No reference counterpart exists (the
reference never handles planar degeneracy; its demo scenes are 3-D enough not
to notice — SFM.py:38-103).

Decomposition follows Faugeras & Lustman (1988) via SVD of the calibrated
homography, yielding 8 (R, t, n) candidates filtered by cheirality.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.utils.precision import mm_f32


class HomographyFit(NamedTuple):
    H: jax.Array            # (..., 3, 3) image-space homography, p2 ~ H p1
    num_inliers: jax.Array  # (...,) symmetric-transfer inliers
    ok: jax.Array           # (...,) fit succeeded (enough support)


class HomographyPose(NamedTuple):
    """Top-2 cheirality-ranked decompositions.

    A homography of a FULLY planar support admits two physically valid
    (R, t, n) interpretations (the classic twofold ambiguity) — both
    reproject every planar point perfectly, so cheirality alone cannot pick.
    Candidate 0 is the higher-voted one; callers disambiguate with off-plane
    points (epipolar residuals under E = [t]x R) or, failing that, with view
    -graph consistency (pipeline.global_sfm's averaging swap)."""

    R: jax.Array            # (..., 2, 3, 3)
    t: jax.Array            # (..., 2, 3) unit norm
    n: jax.Array            # (..., 2, 3) plane normal in camera 1
    num_pos: jax.Array      # (..., 2) cheirality-positive points per candidate
    ok: jax.Array           # (...,) decomposition well-posed (candidate 0)


def _normalize_points(p, mask):
    """Hartley normalization (masked): centroid 0, RMS distance sqrt(2)."""
    w = mask.astype(p.dtype)
    cnt = jnp.maximum(jnp.sum(w, -1), 1.0)
    mean = jnp.sum(p * w[..., None], -2) / cnt[..., None]
    d = jnp.sqrt(jnp.sum((p - mean[..., None, :]) ** 2, -1))
    scale = jnp.sqrt(2.0) / jnp.maximum(
        jnp.sum(d * w, -1) / cnt, 1e-8
    )
    T = jnp.zeros(p.shape[:-2] + (3, 3), p.dtype)
    T = T.at[..., 0, 0].set(scale).at[..., 1, 1].set(scale)
    T = T.at[..., 0, 2].set(-scale * mean[..., 0])
    T = T.at[..., 1, 2].set(-scale * mean[..., 1])
    T = T.at[..., 2, 2].set(1.0)
    pn = (p - mean[..., None, :]) * scale[..., None, None]
    return pn, T


def _dlt_homography(p1n, p2n, w):
    """Weighted DLT: rows of A h = 0 for normalized correspondences.

    p1n, p2n: (..., N, 2) normalized points; w: (..., N) weights.
    Returns (..., 3, 3) normalized-space homography (null vector of A^T W A
    via eigh — fixed 9x9, batched)."""
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], -1)
    A = jnp.concatenate([r1, r2], -2)                      # (..., 2N, 9)
    ww = jnp.concatenate([w, w], -1)                       # (..., 2N)
    AtA = jnp.einsum("...ni,...n,...nj->...ij", A, ww, A)  # (..., 9, 9)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]                                    # smallest eigval
    return h.reshape(h.shape[:-1] + (3, 3))


def _transfer_err2(H, p1, p2):
    """Squared forward transfer error ||p2 - H p1||^2 (image units)."""
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    q = jnp.einsum("...ij,...nj->...ni", H, p1h)
    q = q[..., :2] / jnp.where(
        jnp.abs(q[..., 2:3]) < 1e-12, 1e-12, q[..., 2:3]
    )
    return jnp.sum((q - p2) ** 2, -1)


@functools.partial(jax.jit, static_argnames=("irls_rounds",))
@mm_f32
def fit_homography(
    p1: jax.Array,          # (..., N, 2)
    p2: jax.Array,          # (..., N, 2)
    mask: jax.Array,        # (..., N) bool
    threshold: float = 2.0,
    irls_rounds: int = 3,
) -> HomographyFit:
    """Masked IRLS homography fit + inlier count (batched).

    The input matches are typically already epipolar-RANSAC inliers, so a
    full RANSAC is unnecessary: a DLT fit with ``irls_rounds`` of truncated
    -quadratic reweighting rejects the off-plane minority.  ``num_inliers``
    counts symmetric-transfer agreement at ``threshold`` px — compare against
    the epipolar inlier count for H-degeneracy detection."""
    thr2 = jnp.asarray(threshold * threshold, p1.dtype)
    p1n, T1 = _normalize_points(p1, mask)
    p2n, T2 = _normalize_points(p2, mask)
    w = mask.astype(p1.dtype)
    Hn = _dlt_homography(p1n, p2n, w)
    for _ in range(irls_rounds):
        H = jnp.linalg.solve(T2, Hn @ T1)    # unnormalize: T2^-1 Hn T1
        e2 = _transfer_err2(H, p1, p2)
        w = mask.astype(p1.dtype) * (e2 < thr2).astype(p1.dtype)
        Hn = _dlt_homography(p1n, p2n, w + 1e-3 * mask.astype(p1.dtype))
    H = jnp.linalg.solve(T2, Hn @ T1)
    e2f = _transfer_err2(H, p1, p2)
    b2f = _transfer_err2(jnp.linalg.inv(H), p2, p1)
    inl = (e2f < thr2) & (b2f < thr2) & mask
    num = jnp.sum(inl, -1)
    ok = num >= 8
    return HomographyFit(H=H, num_inliers=num, ok=ok)


def _faugeras_candidates(Hc):
    """All 8 Faugeras (R', t', n') solutions in the SVD frame.

    Hc: (..., 3, 3) CALIBRATED homography (K2^-1 H K1).  Returns
    (R (...,8,3,3), t (...,8,3), n (...,8,3)) mapped back to camera frames.
    Near-pure-rotation cases (d1 ~= d3) collapse gracefully (x1, x3 -> 0)."""
    U, S, Vt = jnp.linalg.svd(Hc)
    V = jnp.swapaxes(Vt, -1, -2)
    # Work with positive-determinant U, V (absorb signs into s).
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[..., 0], S[..., 1], S[..., 2]
    eps = 1e-9
    den = jnp.maximum(d1**2 - d3**2, eps)
    x1 = jnp.sqrt(jnp.clip((d1**2 - d2**2) / den, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((d2**2 - d3**2) / den, 0.0, None))
    d2s = jnp.maximum(d2, eps)

    outsR, outsT, outsN = [], [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # d' = +d2 branch
            sin_t = (d1 - d3) * x1 * x3 * e1 * e3 / d2s
            cos_t = (d1 * x3**2 + d3 * x1**2) / d2s
            Rp = jnp.zeros(Hc.shape[:-2] + (3, 3), Hc.dtype)
            Rp = (
                Rp.at[..., 0, 0].set(cos_t).at[..., 0, 2].set(-sin_t)
                .at[..., 1, 1].set(1.0)
                .at[..., 2, 0].set(sin_t).at[..., 2, 2].set(cos_t)
            )
            tp = jnp.stack(
                [(d1 - d3) * x1 * e1, jnp.zeros_like(d1),
                 -(d1 - d3) * x3 * e3], -1,
            )
            npl = jnp.stack(
                [x1 * e1, jnp.zeros_like(d1), x3 * e3], -1
            )
            outsR.append(Rp); outsT.append(tp); outsN.append(npl)
            # d' = -d2 branch
            sin_p = (d1 + d3) * x1 * x3 * e1 * e3 / d2s
            cos_p = (d3 * x1**2 - d1 * x3**2) / d2s
            Rm = jnp.zeros(Hc.shape[:-2] + (3, 3), Hc.dtype)
            Rm = (
                Rm.at[..., 0, 0].set(cos_p).at[..., 0, 2].set(sin_p)
                .at[..., 1, 1].set(-1.0)
                .at[..., 2, 0].set(sin_p).at[..., 2, 2].set(-cos_p)
            )
            tm = jnp.stack(
                [(d1 + d3) * x1 * e1, jnp.zeros_like(d1),
                 (d1 + d3) * x3 * e3], -1,
            )
            outsR.append(Rm); outsT.append(tm); outsN.append(npl)

    Rs = jnp.stack(outsR, -3)                              # (..., 8, 3, 3)
    ts = jnp.stack(outsT, -2)                              # (..., 8, 3)
    ns = jnp.stack(outsN, -2)
    # Map back: R = s U R' V^T, t = U t', n = V n'.
    R = s[..., None, None, None] * jnp.einsum(
        "...ij,...cjk,...lk->...cil", U, Rs, V
    )
    t = jnp.einsum("...ij,...cj->...ci", U, ts)
    n = jnp.einsum("...ij,...cj->...ci", V, ns)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R, t, n


@jax.jit
@mm_f32
def pose_from_homography(
    H: jax.Array,           # (3, 3) image-space homography
    K1: jax.Array,          # (3, 3)
    K2: jax.Array,
    p1: jax.Array,          # (N, 2)
    p2: jax.Array,
    mask: jax.Array,        # (N,) bool — points the plane explains
) -> HomographyPose:
    """Relative pose (R, t) of camera 2 w.r.t. camera 1 from a homography
    (single pair; see ``pose_from_homography_batch`` for an edge set).

    Decomposes the calibrated homography into the 8 Faugeras candidates and
    selects by cheirality: the winner maximizes points with positive depth in
    BOTH cameras (under [I|0], [R|t]) and positive plane depth ``n . x > 0``
    for the normalized rays of camera 1.  ``ok`` is False when fewer than
    half the masked points (or 8) back the winner."""
    from sfmfromscratch_tpu.geometry.triangulation import two_view_depths

    Hc = jnp.linalg.solve(K2, H @ K1)                       # K2^-1 H K1
    # Sign-normalize: x2^T Hc x1 > 0 for the masked correspondences.
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    x1c = jnp.einsum("ij,nj->ni", jnp.linalg.inv(K1), x1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], -1)
    x2c = jnp.einsum("ij,nj->ni", jnp.linalg.inv(K2), x2)
    dots = jnp.einsum("ni,ij,nj->n", x2c, Hc, x1c) * mask.astype(H.dtype)
    sgn = jnp.where(jnp.sum(dots) < 0, -1.0, 1.0)
    Hc = Hc * sgn

    R, t, n = _faugeras_candidates(Hc)                      # (8,3,3),(8,3),(8,3)
    z1, z2 = two_view_depths(R, t, p1, p2, K1, K2)          # (8, N)
    pos = (z1 > 1e-6) & (z2 > 1e-6) & mask[None, :]
    nd = jnp.einsum("cj,nj->cn", n, x1c)                    # plane depth
    score = jnp.sum(pos & (nd > 0), -1)                     # (8,)

    # Top-2 by cheirality vote, suppressing near-duplicates of the winner
    # (opposite-normal twins share R, t up to sign conventions).
    best = jnp.argmax(score)
    R0 = R[best]
    dup = jnp.sum((R - R0[None]) ** 2, (-1, -2)) < 1e-6
    score2 = jnp.where(dup, -1, score)
    second = jnp.argmax(score2)
    idx = jnp.stack([best, second])
    num_pos = score[idx]
    n_valid = jnp.sum(mask)
    ok = num_pos[0] >= jnp.maximum(0.5 * n_valid, 8.0)
    return HomographyPose(
        R=R[idx], t=t[idx], n=n[idx], num_pos=num_pos, ok=ok
    )


@jax.jit
@mm_f32
def pose_from_homography_batch(H, K1, K2, p1, p2, mask) -> HomographyPose:
    """``pose_from_homography`` vmapped over a leading edge axis — one device
    program for a whole view graph's planar-degenerate edges."""
    return jax.vmap(pose_from_homography)(H, K1, K2, p1, p2, mask)


def _skew(t):
    z = jnp.zeros_like(t[..., 0])
    return jnp.stack([
        jnp.stack([z, -t[..., 2], t[..., 1]], -1),
        jnp.stack([t[..., 2], z, -t[..., 0]], -1),
        jnp.stack([-t[..., 1], t[..., 0], z], -1),
    ], -2)


@jax.jit
@mm_f32
def candidate_epipolar_rms(
    R2: jax.Array,          # (2, 3, 3) pose candidates
    t2: jax.Array,          # (2, 3)
    K1: jax.Array, K2: jax.Array,
    p1: jax.Array, p2: jax.Array,     # (N, 2)
    off_mask: jax.Array,    # (N,) points OFF the dominant plane
):
    """Mean squared epipolar distance of off-plane points under each pose
    candidate's essential geometry — the local disambiguator for the twofold
    homography ambiguity (both candidates explain the PLANE perfectly; only
    off-plane structure separates them).  Returns ((2,) rms, () count)."""
    from sfmfromscratch_tpu.geometry.epipolar import epipolar_distances

    E = _skew(t2) @ R2                                     # (2, 3, 3)
    K2iT = jnp.linalg.inv(K2).T
    K1i = jnp.linalg.inv(K1)
    F = jnp.einsum("ij,cjk,kl->cil", K2iT, E, K1i)
    d = epipolar_distances(F, p1, p2)                      # (2, N)
    w = off_mask.astype(d.dtype)
    cnt = jnp.sum(w)
    rms = jnp.sqrt(jnp.sum(d * d * w[None, :], -1) / jnp.maximum(cnt, 1.0))
    return rms, cnt


@jax.jit
@mm_f32
def candidate_epipolar_rms_batch(R2, t2, K1, K2, p1, p2, off_mask):
    """Leading edge axis vmap of ``candidate_epipolar_rms``."""
    return jax.vmap(candidate_epipolar_rms)(R2, t2, K1, K2, p1, p2, off_mask)
