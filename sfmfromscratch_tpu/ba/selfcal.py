"""Self-calibrating bundle adjustment: a shared focal-length scale optimized
JOINTLY with poses and points.

The reference derives K from the EXIF focal + a sensor-size table
(SFM.py:311-374) and never questions it — but EXIF focals are nominal (zoom
detents, spec rounding) and a few-percent error bends the whole
reconstruction. Alternating [BA -> 1-D focal refit] does NOT work: once BA
converges at the wrong focal, poses/points have absorbed the error and the
focal gradient vanishes (measured: a 6%-wrong focal refits to scale 1.0000).
The scale must be INSIDE the normal equations.

One extra global parameter adds a BORDER to the Schur-reduced camera system:

    [ h_ss  q^T ] [ds]   [b_s]
    [ q     S   ] [dc] = [b_c]     (points already eliminated)

solved matrix-free with TWO preconditioned-CG solves per LM iteration
(u = S^-1 b_c and v = S^-1 q), then ds = (b_s - q.u) / (h_ss - q.v),
dc = u - ds v, and the point back-substitution gains a -ds V^-1 Wsp term.
Everything else (damping, Huber IRLS, accept/reject) mirrors ba/lm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ba.lm import BAResult, huber_weights, robust_cost
from sfmfromscratch_tpu.ba.problem import (
    BAProblem,
    jacobian_blocks,
    mean_reprojection_error,
    total_cost,
)
from sfmfromscratch_tpu.ba.schur import (
    back_substitute_points,
    build_normal_blocks,
    conjugate_gradient,
    schur_matvec,
    schur_rhs,
)
from sfmfromscratch_tpu.utils.precision import mm_f32


def _scaled(problem: BAProblem, s) -> BAProblem:
    K = problem.K
    return problem._replace(K=K.at[:, 0, 0].mul(s).at[:, 1, 1].mul(s))


@functools.partial(
    jax.jit, static_argnames=("max_iters", "cg_iters", "huber_delta")
)
@mm_f32
def bundle_adjust_selfcal(
    problem: BAProblem,
    max_iters: int = 30,
    cg_iters: int = 50,
    init_damping: float = 1e-3,
    damping_up: float = 4.0,
    damping_down: float = 0.5,
    ftol: float = 1e-2,
    huber_delta: float = 0.0,
):
    """LM over (focal scale, cameras, points). Returns (BAResult, s)."""
    C = problem.num_cameras
    Pn = problem.num_points

    def cost_fn(cam, pts, s):
        p = _scaled(problem, s)
        if huber_delta > 0:
            return robust_cost(p, cam, pts, huber_delta)
        return total_cost(p, cam, pts)

    def lm_step(state):
        cam, pts, s, lam, cost, it, done, eta = state
        eta_used = eta
        p_s = _scaled(problem, s)
        Jc, Jp, r = jacobian_blocks(p_s, cam, pts)
        # d r / d s analytically: r = w (proj - obs); d proj / d s =
        # (proj - principal_point) / s.
        w = problem.obs_w
        proj = jnp.where(
            (w > 0)[:, None], r / jnp.maximum(w, 1e-12)[:, None], 0.0
        ) + problem.obs_xy
        pp = p_s.K[problem.obs_cam][:, :2, 2]
        Js = jnp.where((w > 0)[:, None], (proj - pp) / s * w[:, None], 0.0)
        if huber_delta > 0:
            hw = huber_weights(r, huber_delta)
            r = r * hw[:, None]
            Jc = Jc * hw[:, None, None]
            Jp = Jp * hw[:, None, None]
            Js = Js * hw[:, None]

        op = build_normal_blocks(
            Jc, Jp, r, problem.obs_cam, problem.obs_pt, C, Pn, lam
        )
        # Focal blocks (damped like the rest).
        eps = 1e-8
        Hss = jnp.sum(Js * Js)
        Hss_d = Hss * (1.0 + lam) + eps
        gs = jnp.sum(Js * r)
        Wsp = jax.ops.segment_sum(
            jnp.einsum("ok,okj->oj", Js, Jp), problem.obs_pt, num_segments=Pn
        )                                                       # (P, 3)
        Hsc = jax.ops.segment_sum(
            jnp.einsum("ok,oki->oi", Js, Jc), problem.obs_cam, num_segments=C
        )                                                       # (C, 6)
        VinvWsp = jnp.einsum("pij,pj->pi", op.Vinv, Wsp)        # (P, 3)
        d_o = jnp.einsum("oij,oj->oi", op.W, VinvWsp[problem.obs_pt])
        q = Hsc - jax.ops.segment_sum(d_o, problem.obs_cam, num_segments=C)
        hss_red = Hss_d - jnp.sum(Wsp * VinvWsp)
        b_s = gs - jnp.sum(Wsp * jnp.einsum("pij,pj->pi", op.Vinv, op.gp))

        b_c = schur_rhs(op)
        Uinv = jnp.linalg.inv(op.U)

        def mv(x):
            return schur_matvec(op, x.reshape(C, 6)).reshape(-1)

        def pc(x):
            return jnp.einsum(
                "cij,cj->ci", Uinv, x.reshape(C, 6)
            ).reshape(-1)

        u = conjugate_gradient(mv, b_c.reshape(-1), cg_iters, precond=pc,
                               tol_rel=eta)
        v = conjugate_gradient(mv, q.reshape(-1), cg_iters, precond=pc,
                               tol_rel=eta)
        qf = q.reshape(-1)
        denom = hss_red - jnp.vdot(qf, v)
        ds = (b_s - jnp.vdot(qf, u)) / jnp.where(
            jnp.abs(denom) < 1e-12, 1e-12, denom
        )
        dc = (u - ds * v).reshape(C, 6)
        dc = jnp.where(problem.cam_fixed[:, None], 0.0, dc)
        dp = back_substitute_points(op, dc) - ds * VinvWsp

        cam_new = cam - dc
        pts_new = pts - dp
        s_new = jnp.clip(s - ds, 0.5, 2.0)
        new_cost = cost_fn(cam_new, pts_new, s_new)
        finite = jnp.isfinite(new_cost)
        improved = (new_cost < cost) & finite
        cam = jnp.where(improved, cam_new, cam)
        pts = jnp.where(improved, pts_new, pts)
        s = jnp.where(improved, s_new, s)
        lam = jnp.where(improved, lam * damping_down, lam * damping_up)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        # mirror of ba/lm.py: only a tightly-solved step may declare done
        done = done | (improved & (rel < ftol) & (eta_used <= 2e-3))
        cost = jnp.where(improved, new_cost, cost)
        # Eisenstat-Walker forcing — MUST mirror ba/lm.py:lm_step exactly so
        # the sharded selfcal branch (parallel/sharded_ba.py) stays on the
        # same LM trajectory (tests/test_parallel.py selfcal parity).
        eta = jnp.where(
            improved,
            jnp.clip(jnp.sqrt(jnp.maximum(rel, 0.0)), 1e-3, 0.3),
            jnp.asarray(1e-3, eta.dtype),
        )
        return cam, pts, s, lam, cost, it + 1, done, eta

    def cond(state):
        *_, it, done, eta = state
        return (it < max_iters) & jnp.logical_not(done)

    s0 = jnp.asarray(1.0, problem.points.dtype)
    cost0 = cost_fn(problem.cam_params, problem.points, s0)
    err0 = mean_reprojection_error(problem)
    state = (
        problem.cam_params, problem.points, s0,
        jnp.asarray(init_damping, problem.points.dtype),
        cost0, jnp.asarray(0), jnp.asarray(False),
        jnp.asarray(0.15, problem.points.dtype),
    )
    cam, pts, s, _, cost, it, _, _ = jax.lax.while_loop(cond, lm_step, state)
    err1 = mean_reprojection_error(_scaled(problem, s), cam, pts)
    res = BAResult(
        cam_params=cam, points=pts, initial_cost=cost0, final_cost=cost,
        initial_mean_error=err0, final_mean_error=err1, iterations_used=it,
    )
    return res, s
