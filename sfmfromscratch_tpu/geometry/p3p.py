"""Closed-form P3P minimal solver (Grunert), fully batched for TPU.

Replaces the 6-point DLT hypothesis generator in ``pnp_ransac`` (which needs a
batched 12x12 eigendecomposition per hypothesis — the dominant cost of the
incremental chain, see docs/PERFORMANCE.md) with pure closed-form arithmetic:

* Grunert's distance equations reduce to a quartic in the distance ratio
  v = s3/s1.  Rather than hard-coding the classical coefficient formulas, the
  quartic is assembled mechanically from small polynomial products
  (N^2 - 2 cos(gamma) N D + G D^2), which is less error-prone and identical in
  cost.
* The quartic is solved in closed form (Ferrari's factorization into two
  quadratics via the resolvent cubic, solved trigonometrically/Cardano) — no
  ``eig``/``eigh``, which TPUs either lack (nonsymmetric) or pay dearly for —
  then polished with a few Newton steps to recover float32 accuracy.
* Each real root yields camera-frame distances; absolute orientation is a
  batched 3x3 Kabsch/Procrustes.

Every sample yields up to 4 candidate poses with a validity mask; RANSAC
scores all of them (scoring is cheap elementwise work on the MXU-friendly
component-wise layout).

Reference parity: this is the TPU-native replacement for the minimal solver
inside ``cv2.solvePnPRansac`` (reference PoseEstimator.py:54-62); robustness
and refinement semantics live in ``geometry.pnp.pnp_ransac``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.smallsvd import inv3

_EPS = 1e-12


def _solve_cubic_largest(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """Largest real root of x^3 + a x^2 + b x + c (batched, closed form).

    Uses the trigonometric method for the 3-real-root case and Cardano for the
    single-real-root case; both branches are computed and selected with
    ``where`` (XLA-friendly, no control flow).
    """
    # Depress: x = s - a/3  ->  s^3 + P s + Q
    P = b - a * a / 3.0
    Q = 2.0 * a * a * a / 27.0 - a * b / 3.0 + c
    disc = (Q / 2.0) ** 2 + (P / 3.0) ** 3

    # Cardano branch (disc > 0): one real root.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s_card = jnp.cbrt(-Q / 2.0 + sq) + jnp.cbrt(-Q / 2.0 - sq)

    # Trig branch (disc <= 0): three real roots; the largest is
    # 2 sqrt(-P/3) cos(phi/3) with phi = acos(3Q/(2P) sqrt(-3/P)).
    Pn = jnp.minimum(P, -_EPS)                      # P <= 0 in this branch
    rho = jnp.sqrt(-Pn / 3.0)
    arg = 3.0 * Q / (2.0 * Pn) * jnp.sqrt(-3.0 / Pn)
    phi = jnp.arccos(jnp.clip(arg, -1.0, 1.0))
    s_trig = 2.0 * rho * jnp.cos(phi / 3.0)

    s = jnp.where(disc > 0.0, s_card, s_trig)
    return s - a / 3.0


def quartic_roots(coeffs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0.

    ``coeffs``: (..., 5) ordered [c4, c3, c2, c1, c0].
    Returns ``(roots (..., 4), valid (..., 4))``; invalid slots hold 0.
    Closed form (Ferrari) + Newton polish on the original quartic.
    """
    c4, c3, c2, c1, c0 = (coeffs[..., i] for i in range(5))
    # Scale-normalize for conditioning, then monic-normalize.
    scale = jnp.max(jnp.abs(coeffs), axis=-1)
    ok_lead = jnp.abs(c4) > 1e-9 * jnp.maximum(scale, _EPS)
    c4s = jnp.where(ok_lead, c4, 1.0)
    p3 = c3 / c4s
    p2 = c2 / c4s
    p1 = c1 / c4s
    p0 = c0 / c4s

    # Depressed quartic y^4 + p y^2 + q y + r,  x = y - p3/4.
    e = p3 / 4.0
    p = p2 - 3.0 * e * e * 2.0                      # p2 - 3 p3^2 / 8
    q = p1 - p3 * p2 / 2.0 + p3 * p3 * p3 / 8.0
    r = p0 - p3 * p1 / 4.0 + p3 * p3 * p2 / 16.0 - 3.0 * (p3 ** 4) / 256.0

    # Resolvent cubic in w = m^2:  w^3 + 2p w^2 + (p^2 - 4r) w - q^2 = 0.
    w = _solve_cubic_largest(2.0 * p, p * p - 4.0 * r, -q * q)
    w = jnp.maximum(w, 0.0)
    m = jnp.sqrt(w)

    biquad = m < 1e-6                               # q ~ 0: y^4 + p y^2 + r
    m_safe = jnp.where(biquad, 1.0, m)

    # Ferrari split: (y^2 + m y + S)(y^2 - m y + T),
    #   S = (p + w - q/m)/2, T = (p + w + q/m)/2.
    S = (p + w - q / m_safe) / 2.0
    T = (p + w + q / m_safe) / 2.0
    d1 = m * m - 4.0 * S
    d2 = m * m - 4.0 * T
    # Permissive acceptance: a discriminant that is marginally negative from
    # float32 cancellation (near-double roots — endemic here because the
    # u = N/D substitution degenerates when D(v) ~ 0) still yields a root
    # whose real part Newton-polishes onto the true double root.
    tol1 = 1e-3 * (m * m + jnp.abs(4.0 * S)) + 1e-9
    tol2 = 1e-3 * (m * m + jnp.abs(4.0 * T)) + 1e-9
    sd1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    sd2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    roots_f = jnp.stack(
        [(-m + sd1) / 2.0, (-m - sd1) / 2.0, (m + sd2) / 2.0, (m - sd2) / 2.0],
        axis=-1,
    )
    valid_f = jnp.stack(
        [d1 >= -tol1, d1 >= -tol1, d2 >= -tol2, d2 >= -tol2], axis=-1
    )

    # Biquadratic branch: y^2 = (-p +/- sqrt(p^2 - 4r)) / 2.
    db = p * p - 4.0 * r
    sdb = jnp.sqrt(jnp.maximum(db, 0.0))
    z1 = (-p + sdb) / 2.0
    z2 = (-p - sdb) / 2.0
    sz1 = jnp.sqrt(jnp.maximum(z1, 0.0))
    sz2 = jnp.sqrt(jnp.maximum(z2, 0.0))
    roots_b = jnp.stack([sz1, -sz1, sz2, -sz2], axis=-1)
    valid_b = jnp.stack(
        [(db >= 0.0) & (z1 >= 0.0)] * 2 + [(db >= 0.0) & (z2 >= 0.0)] * 2,
        axis=-1,
    )

    y = jnp.where(biquad[..., None], roots_b, roots_f)
    valid = jnp.where(biquad[..., None], valid_b, valid_f)
    x = y - e[..., None]

    # Newton polish on the ORIGINAL (unnormalized-by-depression) monic quartic
    # recovers accuracy lost to float32 closed-form cancellation.
    def body(x, _):
        f = (((x + p3[..., None]) * x + p2[..., None]) * x + p1[..., None]) * x + p0[..., None]
        fp = ((4.0 * x + 3.0 * p3[..., None]) * x + 2.0 * p2[..., None]) * x + p1[..., None]
        fp = jnp.where(jnp.abs(fp) < _EPS, jnp.where(fp < 0, -_EPS, _EPS), fp)
        return x - f / fp, None

    # 6 iterations: Newton is only linearly convergent at the (frequent)
    # near-double roots.
    x, _ = jax.lax.scan(body, x, None, length=6)
    valid = valid & ok_lead[..., None] & jnp.isfinite(x)
    return jnp.where(valid, x, 0.0), valid


def _kabsch(Xw: jax.Array, Yc: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched absolute orientation: R, t with Yc_i ~= R Xw_i + t.

    ``Xw``/``Yc``: (..., 3, 3) — 3 points, rows. The rotation is the polar
    factor of the 3x3 correlation H, computed by the Newton polar iteration
    X <- (X + X^-T)/2 with closed-form 3x3 inverses — pure batched arithmetic.
    jnp.linalg.svd on a (512, 4, 3, 3) batch costs 14 ms on v5e (iterative
    QDWH inside a tiny-matrix loop); eight Newton steps cost well under 1 ms
    and converge quadratically to float32 orthogonality for the
    well-conditioned triangle correlations P3P produces. Mirror cases
    (det H < 0 — degenerate samples the SVD path "rescued" with an axis
    flip into a junk pose) now return a det=-1 factor whose pose scores
    zero inliers downstream, which is equivalent in effect."""
    Xm = jnp.mean(Xw, axis=-2, keepdims=True)
    Ym = jnp.mean(Yc, axis=-2, keepdims=True)
    Xc = Xw - Xm
    Yc_c = Yc - Ym
    H = jnp.swapaxes(Xc, -1, -2) @ Yc_c             # (..., 3, 3) rank <= 2!
    # THREE centered points span a plane, so H is always rank-2 — polar
    # iteration needs full rank. Complete it with the triangle-NORMAL
    # correlation: a proper rotation maps cross products to cross products,
    # so adding ||H||*outer(nx_hat, ny_hat) fills the null direction with the
    # same rotation's action (and pins det(H') > 0 for consistent triangles,
    # so the polar factor IS the proper Kabsch rotation).
    nx = jnp.cross(Xc[..., 1, :] - Xc[..., 0, :], Xc[..., 2, :] - Xc[..., 0, :])
    ny = jnp.cross(Yc_c[..., 1, :] - Yc_c[..., 0, :],
                   Yc_c[..., 2, :] - Yc_c[..., 0, :])
    nx = nx / jnp.maximum(jnp.linalg.norm(nx, axis=-1, keepdims=True), 1e-30)
    ny = ny / jnp.maximum(jnp.linalg.norm(ny, axis=-1, keepdims=True), 1e-30)
    nrm = jnp.linalg.norm(H, axis=(-2, -1), keepdims=True)
    H = H + nrm * nx[..., :, None] * ny[..., None, :]
    # Newton polar iteration with DETERMINANT SCALING (Higham): the optimal
    # per-step scale gamma = |det X|^(-1/3) makes convergence effectively
    # condition-independent (plain Newton needs ~log2(cond) linear steps
    # first; with scaling, 6-8 steps reach f32 orthogonality even at
    # cond ~ 1e6). Degenerate/collinear samples yield non-finite or det<0
    # results, gated by the caller.
    def det3(M):
        return (
            M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
            - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
            + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
        )

    X = H / jnp.maximum(nrm, 1e-30)
    for _ in range(12):
        gam = jnp.cbrt(jnp.maximum(jnp.abs(det3(X)), 1e-30))[..., None, None]
        X = 0.5 * (X / gam + gam * jnp.swapaxes(inv3(X), -1, -2))
    Q = X                                            # ~ U V^T (polar factor)
    R = jnp.swapaxes(Q, -1, -2)                      # V U^T
    t = Ym[..., 0, :] - jnp.einsum("...ij,...j->...i", R, Xm[..., 0, :])
    return R, t


def p3p_poses(
    Xs: jax.Array, xs: jax.Array, K: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Grunert P3P: world points ``Xs`` (B, 3, 3) + pixels ``xs`` (B, 3, 2)
    -> up to 4 world-to-camera poses per sample.

    Returns ``(R (B, 4, 3, 3), t (B, 4, 3), valid (B, 4))``.
    """
    dt = Xs.dtype
    Kinv = jnp.linalg.inv(K).astype(dt)
    ones = jnp.ones(xs.shape[:-1] + (1,), dt)
    rays = jnp.concatenate([xs, ones], axis=-1) @ Kinv.T        # (B, 3, 3)
    f = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)    # unit bearings

    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    P1, P2, P3 = Xs[..., 0, :], Xs[..., 1, :], Xs[..., 2, :]
    cos_a = jnp.sum(f2 * f3, axis=-1)       # angle opposite side a = |P2P3|
    cos_b = jnp.sum(f1 * f3, axis=-1)       # opposite b = |P1P3|
    cos_g = jnp.sum(f1 * f2, axis=-1)       # opposite c = |P1P2|
    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)

    geom_ok = b2 > _EPS
    b2s = jnp.where(geom_ok, b2, 1.0)
    A = (a2 - c2) / b2s
    cb2 = c2 / b2s

    # With u = s2/s1, v = s3/s1, Q(v) = v^2 - 2 cos_b v + 1 (so s1^2 = b^2/Q):
    #   u = N(v) / D(v),   N = (1-A) v^2 + 2 A cos_b v - (1+A),
    #                      D = 2 cos_a v - 2 cos_g,
    # and substituting u into the third law-of-cosines equation gives
    #   N^2 - 2 cos_g N D + G D^2 = 0,  G = -(c2/b2) Q + 1.
    n2 = 1.0 - A
    n1 = 2.0 * A * cos_b
    n0 = -(1.0 + A)
    d1 = 2.0 * cos_a
    d0 = -2.0 * cos_g
    g2 = -cb2
    g1 = 2.0 * cb2 * cos_b
    g0 = 1.0 - cb2

    # Quartic coefficients by polynomial products (highest degree first).
    # N^2
    q4 = n2 * n2
    q3 = 2.0 * n2 * n1
    q2 = 2.0 * n2 * n0 + n1 * n1
    q1 = 2.0 * n1 * n0
    q0 = n0 * n0
    # -2 cos_g * (N * D)
    q3 = q3 - 2.0 * cos_g * (n2 * d1)
    q2 = q2 - 2.0 * cos_g * (n2 * d0 + n1 * d1)
    q1 = q1 - 2.0 * cos_g * (n1 * d0 + n0 * d1)
    q0 = q0 - 2.0 * cos_g * (n0 * d0)
    # + G * D^2
    D2_2 = d1 * d1
    D2_1 = 2.0 * d1 * d0
    D2_0 = d0 * d0
    q4 = q4 + g2 * D2_2
    q3 = q3 + g2 * D2_1 + g1 * D2_2
    q2 = q2 + g2 * D2_0 + g1 * D2_1 + g0 * D2_2
    q1 = q1 + g1 * D2_0 + g0 * D2_1
    q0 = q0 + g0 * D2_0

    v, v_ok = quartic_roots(jnp.stack([q4, q3, q2, q1, q0], axis=-1))  # (B, 4)

    # Distances from each root.
    Qv = v * v - 2.0 * cos_b[..., None] * v + 1.0
    Qv_ok = Qv > _EPS
    s1 = jnp.sqrt(b2s[..., None] / jnp.where(Qv_ok, Qv, 1.0))
    # u from the linear substitution u = N/D — singular when D(v) ~ 0 (the
    # v = cos_g/cos_a degeneracy).  Also recover u from the third
    # law-of-cosines quadratic  u^2 - 2 u cos_g + (1 - (c2/b2) Q) = 0  and
    # keep whichever candidate best satisfies the FIRST equation
    # u^2 + v^2 - 2 u v cos_a - (a2/b2) Q = 0 (not used in either derivation,
    # so it discriminates).
    Dv = d1[..., None] * v + d0[..., None]
    D_ok = jnp.abs(Dv) > 1e-6
    Nv = (n2[..., None] * v + n1[..., None]) * v + n0[..., None]
    u_lin = Nv / jnp.where(D_ok, Dv, 1.0)
    disc_u = cos_g[..., None] ** 2 - 1.0 + cb2[..., None] * Qv
    sq_u = jnp.sqrt(jnp.maximum(disc_u, 0.0))
    u_qp = cos_g[..., None] + sq_u
    u_qm = cos_g[..., None] - sq_u
    ab2 = (a2 / b2s)[..., None]

    def _res1(u):
        return jnp.abs(u * u + v * v - 2.0 * u * v * cos_a[..., None] - ab2 * Qv)

    r_lin = jnp.where(D_ok, _res1(u_lin), jnp.inf)
    r_qp = jnp.where(disc_u >= 0.0, _res1(u_qp), jnp.inf)
    r_qm = jnp.where(disc_u >= 0.0, _res1(u_qm), jnp.inf)
    u = jnp.where(r_lin <= jnp.minimum(r_qp, r_qm), u_lin,
                  jnp.where(r_qp <= r_qm, u_qp, u_qm))
    u_ok = jnp.isfinite(jnp.minimum(r_lin, jnp.minimum(r_qp, r_qm)))
    s2 = u * s1
    s3 = v * s1
    valid = (
        v_ok & Qv_ok & u_ok & geom_ok[..., None]
        & (v > _EPS) & (u > _EPS) & (s1 > _EPS)
    )

    # Camera-frame points: Yc_i = s_i f_i  -> absolute orientation.
    s = jnp.stack([s1, s2, s3], axis=-1)                        # (B, 4, 3)

    # Distance-domain Newton polish (the Lambda-Twist trick): float32 quartic
    # root extraction leaves ~1e-2 relative error when roots cluster; a few
    # Newton steps on the three law-of-cosines residuals in (s1, s2, s3)
    # restore full float32 accuracy.  Batched analytic 3x3 Jacobian.
    cos_abg = jnp.stack([cos_a, cos_b, cos_g], axis=-1)[..., None, :]  # (B,1,3)
    abc2 = jnp.stack([a2, b2, c2], axis=-1)[..., None, :]

    def _polish(s, _):
        s1_, s2_, s3_ = s[..., 0], s[..., 1], s[..., 2]
        ca, cb, cg = cos_abg[..., 0], cos_abg[..., 1], cos_abg[..., 2]
        r = jnp.stack(
            [
                s2_ * s2_ + s3_ * s3_ - 2.0 * s2_ * s3_ * ca - abc2[..., 0],
                s1_ * s1_ + s3_ * s3_ - 2.0 * s1_ * s3_ * cb - abc2[..., 1],
                s1_ * s1_ + s2_ * s2_ - 2.0 * s1_ * s2_ * cg - abc2[..., 2],
            ],
            axis=-1,
        )
        zero = jnp.zeros_like(s1_)
        J = jnp.stack(
            [
                jnp.stack([zero, 2.0 * (s2_ - s3_ * ca), 2.0 * (s3_ - s2_ * ca)], axis=-1),
                jnp.stack([2.0 * (s1_ - s3_ * cb), zero, 2.0 * (s3_ - s1_ * cb)], axis=-1),
                jnp.stack([2.0 * (s1_ - s2_ * cg), 2.0 * (s2_ - s1_ * cg), zero], axis=-1),
            ],
            axis=-2,
        )
        # Damped solve guards singular Jacobians on degenerate samples.
        JtJ = jnp.swapaxes(J, -1, -2) @ J + 1e-9 * jnp.eye(3, dtype=s.dtype)
        g = jnp.einsum("...ji,...j->...i", J, r)
        # closed-form damped 3x3 solve — batched LU costs ~ms at this batch
        ds = jnp.einsum("...ij,...j->...i", inv3(JtJ), g)
        return s - ds, None

    s, _ = jax.lax.scan(_polish, s, None, length=3)
    valid = valid & jnp.all(s > _EPS, axis=-1) & jnp.all(jnp.isfinite(s), axis=-1)

    # Final gate: the polished distances must actually satisfy the law-of-
    # cosines system (rejects roots rescued too permissively upstream).
    s1f, s2f, s3f = s[..., 0], s[..., 1], s[..., 2]
    rfin = jnp.stack(
        [
            s2f * s2f + s3f * s3f - 2.0 * s2f * s3f * cos_abg[..., 0] - abc2[..., 0],
            s1f * s1f + s3f * s3f - 2.0 * s1f * s3f * cos_abg[..., 1] - abc2[..., 1],
            s1f * s1f + s2f * s2f - 2.0 * s1f * s2f * cos_abg[..., 2] - abc2[..., 2],
        ],
        axis=-1,
    )
    scale2 = (a2 + b2 + c2)[..., None, None]
    valid = valid & jnp.all(jnp.abs(rfin) < 1e-3 * scale2 + 1e-9, axis=-1)
    Yc = s[..., :, None] * f[..., None, :, :]                   # (B, 4, 3, 3)
    Xw = jnp.broadcast_to(Xs[..., None, :, :], Yc.shape)
    R, t = _kabsch(Xw, Yc)
    valid = valid & jnp.all(jnp.isfinite(t), axis=-1)
    # The polar iteration can fail to converge on ill-conditioned (near
    # -collinear) samples, leaving a non-orthogonal factor that is NOT a
    # rotation — such a matrix can overfit RANSAC support with a bogus pose
    # (observed: a degraded-imaging scene's chain ATE blew 5% -> 21% before
    # this gate). Require orthogonality to float32 tolerance, and reject
    # mirror (det -1) factors from degenerate samples.
    RtR = jnp.einsum("...ji,...jk->...ik", R, R)
    orth_err = jnp.max(
        jnp.abs(RtR - jnp.eye(3, dtype=R.dtype)), axis=(-2, -1)
    )
    det3R = (
        R[..., 0, 0] * (R[..., 1, 1] * R[..., 2, 2] - R[..., 1, 2] * R[..., 2, 1])
        - R[..., 0, 1] * (R[..., 1, 0] * R[..., 2, 2] - R[..., 1, 2] * R[..., 2, 0])
        + R[..., 0, 2] * (R[..., 1, 0] * R[..., 2, 1] - R[..., 1, 1] * R[..., 2, 0])
    )
    valid = valid & (orth_err < 2e-4) & (det3R > 0)
    return R, t, valid
