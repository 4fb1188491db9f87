"""Global motion averaging: rotation + translation averaging on the view graph.

This is the TPU-native *global SfM* core — the method family (1DSfM, Ozyesil &
Singer LUD, chordal rotation averaging) designed for exactly the
"1000+ image landmark scene" regime of BASELINE.json config 5, where the
reference's strictly sequential PnP chain (Runner.py:221-287) cannot scale:
every stage here is a fixed-shape batched array program — segment-sums over the
edge list + batched 3x3 linear algebra — with no per-camera Python loop.

Conventions (matching geometry.ransac / geometry.pnp): world-to-camera poses
``x_cam = R X + t``; an edge (i, j) carries the relative pose of j w.r.t. i,
``R_ij = R_j R_i^T``, and the essential-matrix translation direction
``t_ij ~ R_j (c_i - c_j)`` (unit scale), where ``c = -R^T t`` is the camera
center.

Both solvers accept padded edge lists (weight 0 edges are inert), are jittable
with static camera/edge counts, and use only TPU-friendly primitives
(``segment_sum``, batched 3x3 SVD/solve, ``lax.scan``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.utils.precision import mm_f32
from sfmfromscratch_tpu.ba.schur import conjugate_gradient


def _project_so3(M: jax.Array) -> jax.Array:
    """Batched projection onto SO(3): argmax_R trace(R^T M) = U diag(1,1,d) V^T
    for M = U S V^T with d = det(U V^T)."""
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    d = jnp.where(d == 0, 1.0, jnp.sign(d))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    return (U * D[..., None, :]) @ Vt


@functools.partial(jax.jit, static_argnames=("num_cameras", "num_iters"))
@mm_f32
def rotation_averaging(
    R_rel: jax.Array,        # (E, 3, 3) relative rotations R_ij = R_j R_i^T
    edge_i: jax.Array,       # (E,) int32
    edge_j: jax.Array,       # (E,) int32
    R_init: jax.Array,       # (C, 3, 3) initial absolute rotations (e.g. chained)
    edge_w: Optional[jax.Array] = None,   # (E,) weights; 0 disables an edge
    num_cameras: int = 0,
    num_iters: int = 64,
    eps_start: float = 0.5,
    eps_final: float = 0.05,
) -> jax.Array:
    """Robust rotation averaging by IRLS-weighted SO(3) Jacobi sweeps with an
    annealed Huber->Weiszfeld-L1 weight.

    Each sweep sets ``R_i <- proj_SO3( sum_j w_e contribution_e + 0.1 R_i )``
    where edge (i, j) contributes ``R_ij^T R_j`` to camera i and ``R_ij R_i``
    to camera j. The weight ``w_e = 1 / max(r_e, eps_t)`` (chordal residual
    ``r_e = ||R_ij R_i - R_j||_F``) is exactly Huber-IRLS at threshold
    ``eps_t``; annealing ``eps_t`` from 0.5 to 0.05 starts near-L2 (smooth
    basin, tolerant of a rough init) and finishes near the Weiszfeld L1
    geodesic-median update (Hartley et al.), which rejects outlier edges
    (wrong loop closures) sharply. Gauge re-anchored to ``R_0 = I`` every
    sweep. ``num_cameras`` must be static (segment_sum output shape).
    """
    C = num_cameras if num_cameras else R_init.shape[0]
    Ecnt = R_rel.shape[0]
    w0 = jnp.ones(Ecnt, R_rel.dtype) if edge_w is None else edge_w
    decay = (eps_final / eps_start) ** (1.0 / max(num_iters // 2, 1))

    def sweep(R, t):
        eps_t = jnp.maximum(eps_start * decay ** t, eps_final)
        Ri = R[edge_i]                                   # (E, 3, 3)
        Rj = R[edge_j]
        r = jnp.linalg.norm(R_rel @ Ri - Rj, axis=(-2, -1))
        w = w0 / jnp.maximum(r, eps_t)
        w = w / jnp.maximum(jnp.mean(w), 1e-9)           # keep damping ratio fixed
        contrib_i = jnp.swapaxes(R_rel, -1, -2) @ Rj     # pulls R_i toward R_ij^T R_j
        contrib_j = R_rel @ Ri
        S = jax.ops.segment_sum(w[:, None, None] * contrib_i, edge_i, num_segments=C)
        S = S + jax.ops.segment_sum(w[:, None, None] * contrib_j, edge_j, num_segments=C)
        S = S + 0.1 * R                                  # damping / keeps isolated cameras
        Rn = _project_so3(S)
        # Gauge: right-multiply by R_0^{-1} so camera 0 stays the identity.
        return Rn @ jnp.swapaxes(Rn[0], -1, -2)[None], None

    R, _ = jax.lax.scan(sweep, R_init, jnp.arange(num_iters, dtype=R_init.dtype))
    return R


@functools.partial(
    jax.jit, static_argnames=("num_cameras", "cg_iters", "irls_rounds")
)
@mm_f32
def chordal_rotation_init(
    R_rel: jax.Array,        # (E, 3, 3) relative rotations R_ij = R_j R_i^T
    edge_i: jax.Array,
    edge_j: jax.Array,
    R_init: jax.Array,       # (C, 3, 3) warm start (e.g. spanning-chain walk)
    edge_w: Optional[jax.Array] = None,
    num_cameras: int = 0,
    cg_iters: int = 512,
    irls_rounds: int = 2,
) -> jax.Array:
    """Chordal relaxation (Martinec–Pajdla): globally solve the LINEAR system
    ``min_M sum_e w_e ||M_j - R_ij M_i||_F^2`` over unconstrained 3x3 blocks,
    then project to SO(3).

    Why this exists: the Jacobi IRLS sweeps in :func:`rotation_averaging`
    propagate corrections one graph hop per sweep, so on a large-diameter view
    graph (a 1000-view sequence is a ~500-hop near-chain) the spanning-chain
    init's accumulated drift never gets absorbed — measured 9.3 deg median
    error at C=1000 still 1.6 deg after 2048 sweeps. Conjugate gradients on
    the chordal normal equations move information globally in O(sqrt(cond))
    iterations; the Jacobi IRLS pass afterwards only has LOCAL robust cleanup
    left to do. The system is a graph Laplacian with orthonormal 3x3 block
    weights:

        S(M)_i = sum_{e=(i,j)} w_e (M_i - R_ij^T M_j)
               + sum_{e=(j,i)} w_e (M_i - R_ji M_j)  [+ anchor at camera 0]

    solved matrix-free (two segment-sums per matvec). ``irls_rounds`` outer
    rounds reweight edges by their chordal residual (Huber), so contaminated
    edges do not bend the global solution. The gauge anchors camera 0 to
    ``R_init[0]`` through a quadratic penalty.
    """
    C = num_cameras if num_cameras else R_init.shape[0]
    E = R_rel.shape[0]
    w0 = jnp.ones(E, R_rel.dtype) if edge_w is None else edge_w
    w0 = w0 / jnp.maximum(jnp.mean(w0), 1e-9)
    anchor = 4.0  # quadratic gauge penalty weight at camera 0

    R_rel_T = jnp.swapaxes(R_rel, -1, -2)

    def S_op(M, w):
        Mi = M[edge_i]
        Mj = M[edge_j]
        wi = w[:, None, None]
        term_j = wi * (Mj - R_rel @ Mi)          # d/dM_j of the edge cost
        term_i = wi * (Mi - R_rel_T @ Mj)        # d/dM_i (R orthonormal)
        S = jax.ops.segment_sum(term_j, edge_j, num_segments=C)
        S = S + jax.ops.segment_sum(term_i, edge_i, num_segments=C)
        return S.at[0].add(anchor * M[0])

    b = jnp.zeros((C, 3, 3), R_init.dtype).at[0].set(anchor * R_init[0])

    def solve_round(M, _):
        # Huber reweight by current chordal residual (first round: raw w0).
        r = jnp.linalg.norm(R_rel @ M[edge_i] - M[edge_j], axis=(-2, -1))
        w = w0 / jnp.maximum(r / 0.3, 1.0)
        # CG on the residual system around the current estimate.
        rhs = (b - S_op(M, w)).reshape(-1)
        d = conjugate_gradient(
            lambda x: S_op(x.reshape(C, 3, 3), w).reshape(-1),
            rhs, num_iters=cg_iters,
        )
        return M + d.reshape(C, 3, 3), None

    M = R_init
    M, _ = jax.lax.scan(solve_round, M, jnp.arange(max(irls_rounds, 1)))
    R = _project_so3(M)
    # Gauge: camera 0 back to exactly R_init[0].
    return (R @ jnp.swapaxes(R[0], -1, -2)[None]) @ R_init[0][None]


@functools.partial(
    jax.jit, static_argnames=("num_cameras", "num_iters", "cg_iters")
)
@mm_f32
def translation_averaging(
    u_dir: jax.Array,        # (E, 3) unit world directions of (c_i - c_j)
    edge_i: jax.Array,
    edge_j: jax.Array,
    c_init: jax.Array,       # (C, 3) initial camera centers
    edge_w: Optional[jax.Array] = None,
    num_cameras: int = 0,
    num_iters: int = 12,
    cg_iters: int = 64,
    huber_start: float = 0.5,
    huber_final: float = 0.05,
    edge_s: Optional[jax.Array] = None,   # (E,) per-edge scale estimates
) -> jax.Array:
    """Robust translation averaging on the view graph, matrix-free.

    Two regimes, chosen by whether per-edge SCALE estimates are available:

    * ``edge_s`` given (the global pipeline derives them from two-view depth
      ratios along shared tracks): each IRLS round solves the anchored
      Laplacian system ``min_c sum_e w_e ||c_i - c_j - s_e u_e||^2`` by CG.
      Fully determined on ANY connected graph — including near-chains, where
      direction-only formulations are provably degenerate (a subchain can
      collapse onto a point while one stretched edge absorbs the gauge).
      ``s_e`` is re-estimated each round as a blend of the data anchor and
      the current stretch, so anchor noise washes out as the shape converges.

    * ``edge_s`` absent: Govindu's projection least squares — the scale
      eliminated analytically via ``||(I - u u^T)(c_i - c_j)||^2`` — with the
      trivial collapse excluded by the linear gauge ``sum_e w_e u_e . d_e =
      sum_e w_e`` imposed as a quadratic penalty. Exact on parallel-RIGID
      graphs; on near-chain graphs prefer supplying ``edge_s``.

    Both regimes Huber-damp edges by their scale-free residual (annealed
    near-L2 -> near-L1, Weiszfeld-style) and softly reject orientation-flipped
    edges. Camera 0 is pinned at the origin; one CG solve per round,
    segment-sums only (nothing materialized), one ``psum`` per matvec when
    sharded.
    """
    C = num_cameras if num_cameras else c_init.shape[0]
    E = u_dir.shape[0]
    w0 = jnp.ones(E, u_dir.dtype) if edge_w is None else edge_w
    pin = 10.0                                           # camera-0 origin prior
    sum_w0 = jnp.maximum(jnp.sum(w0), 1e-9)
    anchored = edge_s is not None

    def cg(apply, c, b):
        def cg_step(state, _):
            x, rr, p, rs = state
            Ap = apply(p)
            denom = jnp.sum(p * Ap)
            alpha = rs / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            rs_new = jnp.sum(rr * rr)
            beta = rs_new / jnp.where(rs < 1e-12, 1e-12, rs)
            return (x, rr, rr + beta * p, rs_new), None

        r0 = b - apply(c)
        (c_new, *_), _ = jax.lax.scan(
            cg_step, (c, r0, r0, jnp.sum(r0 * r0)), None, length=cg_iters
        )
        return c_new

    decay = (huber_final / huber_start) ** (1.0 / max(num_iters // 2, 1))

    if anchored:
        s_data = edge_s.astype(u_dir.dtype)

        def apply_L(c, w):
            d = c[edge_i] - c[edge_j]
            wd = w[:, None] * d
            out = jax.ops.segment_sum(wd, edge_i, num_segments=C)
            out = out - jax.ops.segment_sum(wd, edge_j, num_segments=C)
            out = out.at[0].add(pin * c[0])
            return out + 1e-8 * c

        def outer(c, t):
            delta_t = jnp.maximum(huber_start * decay ** t, huber_final)
            d = c[edge_i] - c[edge_j]
            along = jnp.sum(u_dir * d, axis=-1)
            # Blend the data anchor with the current stretch: by the last
            # rounds the shape dominates, so anchor noise washes out.
            lam = 0.5 ** t
            s = lam * s_data + (1.0 - lam) * jnp.maximum(along, 0.05 * s_data)
            r = jnp.linalg.norm(d - s[:, None] * u_dir, axis=-1)
            rn = r / jnp.maximum(s, 1e-9)
            w = w0 * jnp.minimum(1.0, delta_t / jnp.maximum(rn, 1e-9))
            wsu = (w * s)[:, None] * u_dir
            b = jax.ops.segment_sum(wsu, edge_i, num_segments=C)
            b = b - jax.ops.segment_sum(wsu, edge_j, num_segments=C)
            c_new = cg(lambda p: apply_L(p, w), c, b)
            return c_new - c_new[0][None], None

        c, _ = jax.lax.scan(
            outer, c_init - c_init[0][None],
            jnp.arange(num_iters, dtype=c_init.dtype),
        )
        return c

    # ---- direction-only regime (projection LS + stretch-gauge penalty) ----
    rho = 1.0                                            # gauge penalty weight
    target = sum_w0                                      # sum of stretches

    def gvec(w):
        # gradient of the linear gauge functional g(c) = sum_e w_e u_e . d_e
        wu = w[:, None] * u_dir
        return (
            jax.ops.segment_sum(wu, edge_i, num_segments=C)
            - jax.ops.segment_sum(wu, edge_j, num_segments=C)
        )

    def apply_A(c, w, g):
        d = c[edge_i] - c[edge_j]                        # (E, 3)
        proj = d - u_dir * jnp.sum(u_dir * d, axis=-1, keepdims=True)
        wp = w[:, None] * proj
        out = jax.ops.segment_sum(wp, edge_i, num_segments=C)
        out = out - jax.ops.segment_sum(wp, edge_j, num_segments=C)
        out = out.at[0].add(pin * c[0])
        return out + rho * jnp.sum(g * c) * g

    def outer(c, t):
        delta_t = jnp.maximum(huber_start * decay ** t, huber_final)
        d = c[edge_i] - c[edge_j]
        along = jnp.sum(u_dir * d, axis=-1)
        # Normalize the typical edge length to 1 so the Huber threshold and
        # orientation test are scale-free.
        mean_len = jnp.sum(w0 * jnp.abs(along)) / sum_w0
        scale = jnp.maximum(mean_len, 1e-9)
        r = jnp.linalg.norm(d - along[:, None] * u_dir, axis=-1) / scale
        w = w0 * jnp.minimum(1.0, delta_t / jnp.maximum(r, 1e-9))
        w = w * jnp.where(along > 0, 1.0, 0.05)
        g = gvec(w)
        b = rho * target * g
        c_new = cg(lambda p: apply_A(p, w, g), c, b)
        return c_new - c_new[0][None], None

    # IRLS weights must be derived from the (good) init — a uniform-weight
    # first solve would let outlier directions drag the solution out of the
    # init's basin before reweighting can react.
    c, _ = jax.lax.scan(
        outer, c_init - c_init[0][None],
        jnp.arange(num_iters, dtype=c_init.dtype),
    )
    return c


@jax.jit
@mm_f32
def relative_translations_known_rotations(
    R_ij: jax.Array,    # (E, 3, 3) relative rotations (e.g. from averaging)
    p1: jax.Array,      # (E, N, 2) pixels in image i
    p2: jax.Array,      # (E, N, 2) pixels in image j
    K1: jax.Array,      # (E, 3, 3)
    K2: jax.Array,      # (E, 3, 3)
    mask: jax.Array,    # (E, N) bool inlier masks
) -> Tuple[jax.Array, jax.Array]:
    """Per-edge translation directions given (trusted) relative rotations.

    The minimal-sample essential decomposition yields noisy ``t`` on
    small-baseline pairs; with ``R_ij`` fixed each correspondence gives the
    LINEAR constraint ``t . (c x r2) = 0`` with ``c = R_ij r1`` (cross-multiply
    ``z2 r2 = z1 c + t`` by ``c x r2``), so the direction is the smallest
    eigenvector of the 3x3 scatter of unit constraint normals over ALL inliers
    — one batched eigh for the whole edge list. Component-wise (..., N) layout
    throughout (the TPU lane rule, docs/PERFORMANCE.md).

    Returns ``(t (E, 3) unit, conf (E,) in [0, 1])``: ``t`` is
    cheirality-signed (majority positive depths wins) and ``conf`` is the
    relative eigengap ``(l1 - l0) / l1`` — near 0 when the direction is
    ill-constrained (degenerate or pure-rotation pairs), usable as an
    averaging weight multiplier.
    """
    from sfmfromscratch_tpu.geometry.triangulation import two_view_depths

    K1i = jnp.linalg.inv(K1)                      # (E, 3, 3)
    K2i = jnp.linalg.inv(K2)
    u1, v1 = p1[..., 0], p1[..., 1]               # (E, N)
    u2, v2 = p2[..., 0], p2[..., 1]

    def backproject(Ki, u, v):
        return (
            Ki[:, 0, 0, None] * u + Ki[:, 0, 1, None] * v + Ki[:, 0, 2, None],
            Ki[:, 1, 0, None] * u + Ki[:, 1, 1, None] * v + Ki[:, 1, 2, None],
            Ki[:, 2, 0, None] * u + Ki[:, 2, 1, None] * v + Ki[:, 2, 2, None],
        )

    r1x, r1y, r1z = backproject(K1i, u1, v1)
    r2x, r2y, r2z = backproject(K2i, u2, v2)
    cx = R_ij[:, 0, 0, None] * r1x + R_ij[:, 0, 1, None] * r1y + R_ij[:, 0, 2, None] * r1z
    cy = R_ij[:, 1, 0, None] * r1x + R_ij[:, 1, 1, None] * r1y + R_ij[:, 1, 2, None] * r1z
    cz = R_ij[:, 2, 0, None] * r1x + R_ij[:, 2, 1, None] * r1y + R_ij[:, 2, 2, None] * r1z
    wx = cy * r2z - cz * r2y                      # w = c x r2
    wy = cz * r2x - cx * r2z
    wz = cx * r2y - cy * r2x
    norm = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    s = mask / jnp.maximum(norm, 1e-12)           # unit normals, masked
    wx, wy, wz = wx * s, wy * s, wz * s

    def dot(a, b):
        return jnp.sum(a * b, axis=-1)

    M = jnp.stack([
        jnp.stack([dot(wx, wx), dot(wx, wy), dot(wx, wz)], -1),
        jnp.stack([dot(wy, wx), dot(wy, wy), dot(wy, wz)], -1),
        jnp.stack([dot(wz, wx), dot(wz, wy), dot(wz, wz)], -1),
    ], -2)                                        # (E, 3, 3)
    evals, evecs = jnp.linalg.eigh(M)             # ascending
    t = evecs[..., :, 0]                          # (E, 3)
    conf = (evals[..., 1] - evals[..., 0]) / jnp.maximum(evals[..., 1], 1e-9)

    z1, z2 = jax.vmap(two_view_depths)(R_ij, t, p1, p2, K1, K2)
    pos = jnp.sum(mask & (z1 > 0) & (z2 > 0), axis=-1)
    neg = jnp.sum(mask & (z1 < 0) & (z2 < 0), axis=-1)
    t = t * jnp.where(pos >= neg, 1.0, -1.0)[:, None]
    return t, conf


def chain_initial_rotations(
    R_rel: jax.Array, edge_i: jax.Array, edge_j: jax.Array, num_cameras: int
) -> jax.Array:
    """Host-side spanning-chain initialization: walk edges in order, composing
    ``R_j = R_ij R_i`` the first time each camera j is reached. Cameras never
    reached stay identity. (Cheap O(E) numpy — runs once before averaging.)"""
    import numpy as np

    R = np.tile(np.eye(3, dtype=np.float64), (num_cameras, 1, 1))
    seen = np.zeros(num_cameras, bool)
    seen[0] = True
    R_rel = np.asarray(R_rel, np.float64)
    ei = np.asarray(edge_i)
    ej = np.asarray(edge_j)
    changed = True
    while changed:
        changed = False
        for e in range(len(ei)):
            i, j = int(ei[e]), int(ej[e])
            if seen[i] and not seen[j]:
                R[j] = R_rel[e] @ R[i]
                seen[j] = True
                changed = True
            elif seen[j] and not seen[i]:
                R[i] = R_rel[e].T @ R[j]
                seen[i] = True
                changed = True
    return jnp.asarray(R, jnp.float32)


def chain_initial_centers(
    u_dir: jax.Array, edge_i: jax.Array, edge_j: jax.Array, num_cameras: int
) -> jax.Array:
    """Host-side center init: walk edges, stepping unit length along the edge
    direction (c_i - c_j = u => c_j = c_i - u) the first time j is reached."""
    import numpy as np

    c = np.zeros((num_cameras, 3), np.float64)
    seen = np.zeros(num_cameras, bool)
    seen[0] = True
    u = np.asarray(u_dir, np.float64)
    ei = np.asarray(edge_i)
    ej = np.asarray(edge_j)
    changed = True
    while changed:
        changed = False
        for e in range(len(ei)):
            i, j = int(ei[e]), int(ej[e])
            if seen[i] and not seen[j]:
                c[j] = c[i] - u[e]
                seen[j] = True
                changed = True
            elif seen[j] and not seen[i]:
                c[i] = c[j] + u[e]
                seen[i] = True
                changed = True
    return jnp.asarray(c, jnp.float32)
