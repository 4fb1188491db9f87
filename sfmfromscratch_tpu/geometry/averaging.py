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


def _project_so3(M: jax.Array) -> jax.Array:
    """Batched projection onto SO(3): argmax_R trace(R^T M) = U diag(1,1,d) V^T
    for M = U S V^T with d = det(U V^T)."""
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    d = jnp.where(d == 0, 1.0, jnp.sign(d))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    return (U * D[..., None, :]) @ Vt


@functools.partial(jax.jit, static_argnames=("num_cameras", "num_iters"))
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
    jax.jit, static_argnames=("num_cameras", "num_iters", "cg_iters")
)
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
) -> jax.Array:
    """Translation averaging by projection-matrix least squares (Govindu) with
    IRLS robustness.

    The per-edge scale is eliminated analytically: for fixed directions the
    optimal ``s_e`` makes each edge term ``d_e^T (I - u_e u_e^T) d_e`` with
    ``d_e = c_i - c_j`` — a quadratic in the centers alone. The trivial
    ``c = 0`` collapse is excluded by the linear gauge constraint
    ``sum_e w_e u_e . d_e = E`` (every edge stretched positively along its
    direction, total fixed), imposed as a quadratic penalty; camera 0 is
    pinned at the origin the same way. Each IRLS round is ONE matrix-free CG
    solve (segment-sums only — no materialized Laplacian); weights Huber-damp
    edges by residual and softly reject orientation-flipped edges
    (``u_e . d_e < 0``), the failure mode L2 projection methods are known for.
    """
    C = num_cameras if num_cameras else c_init.shape[0]
    E = u_dir.shape[0]
    w0 = jnp.ones(E, u_dir.dtype) if edge_w is None else edge_w
    pin = 10.0                                           # camera-0 origin prior
    rho = 1.0                                            # gauge penalty weight
    target = jnp.sum(w0)                                 # sum of stretches

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

    def solve(c, w):
        g = gvec(w)
        b = rho * target * g

        def cg_step(state, _):
            x, rr, p, rs = state
            Ap = apply_A(p, w, g)
            denom = jnp.sum(p * Ap)
            alpha = rs / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            rs_new = jnp.sum(rr * rr)
            beta = rs_new / jnp.where(rs < 1e-12, 1e-12, rs)
            return (x, rr, rr + beta * p, rs_new), None

        r0 = b - apply_A(c, w, g)
        (c_new, *_), _ = jax.lax.scan(
            cg_step, (c, r0, r0, jnp.sum(r0 * r0)), None, length=cg_iters
        )
        return c_new

    decay = (huber_final / huber_start) ** (1.0 / max(num_iters // 2, 1))

    def outer(c, t):
        delta_t = jnp.maximum(huber_start * decay ** t, huber_final)
        d = c[edge_i] - c[edge_j]
        along = jnp.sum(u_dir * d, axis=-1)
        # Normalize the typical edge length to 1 so the Huber threshold and
        # orientation test are scale-free.
        mean_len = jnp.sum(w0 * jnp.abs(along)) / jnp.maximum(jnp.sum(w0), 1e-9)
        scale = jnp.maximum(mean_len, 1e-9)
        r = jnp.linalg.norm(d - along[:, None] * u_dir, axis=-1) / scale
        w = w0 * jnp.minimum(1.0, delta_t / jnp.maximum(r, 1e-9))
        w = w * jnp.where(along > 0, 1.0, 0.05)
        c_new = solve(c, w)
        return c_new - c_new[0][None], None

    # No plain-L2 warm solve: IRLS weights must be derived from the (good)
    # init — a uniform-weight first solve would let outlier directions drag
    # the solution out of the init's basin before reweighting can react.
    c, _ = jax.lax.scan(
        outer, c_init - c_init[0][None],
        jnp.arange(num_iters, dtype=c_init.dtype),
    )
    return c


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
