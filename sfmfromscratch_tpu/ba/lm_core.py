"""THE Levenberg-Marquardt driver — one implementation, every backend.

Round-3 shipped a parity break because the LM step (Eisenstat-Walker forcing,
acceptance test, tight-solve convergence gate) was maintained as three
hand-mirrored copies in ``ba/lm.py``, ``ba/selfcal.py`` and
``parallel/sharded_ba.py``; round 4 re-mirrored them; this module deletes the
mirroring entirely.  :func:`lm_run` is the single LM loop, parameterized by

- ``reduce_fn``  — identity for single-device, ``lax.psum`` over the mesh
  axis for the observation-sharded solver.  Every cross-observation reduction
  (normal-equation blocks, Schur matvec, cost, mean error, selfcal border)
  routes through it, so the sharded program IS the single-device program with
  a collective spliced into its segment-sums.
- ``selfcal``    — adds the shared-focal-scale border to the Schur system
  (see ba/selfcal.py's module docstring for the bordered algebra).
- ``use_dense``  — exact dense Cholesky on the reduced camera system instead
  of matrix-free PCG (small camera counts; gate in ba/schur.py:dense_gate).
- ``forcing``    — Eisenstat-Walker inexact-Newton forcing on the CG
  tolerance; False pins eta to 0 (full fixed-iteration CG) for A/B numerics
  diagnostics.  Read from ``SFM_NO_CG_FORCING`` by the public wrappers
  *outside* jit and threaded through as a static argument, so toggling the
  env var always takes effect (it participates in every cache key).

Replaces the reference's single scipy-trf solver (SFM.py:405-464) the same
way in every deployment shape: one analytic-Jacobian LM step, Schur
elimination of the points, accept/reject with adaptive damping.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ba.problem import (
    BAProblem,
    jacobian_blocks,
    residuals,
    total_cost,
)
from sfmfromscratch_tpu.ba.schur import (
    back_substitute_points,
    build_normal_blocks,
    conjugate_gradient,
    schur_matvec,
    schur_rhs,
    solve_schur,
    solve_schur_dense,
)

__all__ = [
    "LMRunOut",
    "lm_run",
    "robust_cost",
    "huber_weights",
    "scale_focal",
]


def robust_cost(problem: BAProblem, cam: jax.Array, pts: jax.Array, delta: float) -> jax.Array:
    """Huber cost over per-observation residual norms (delta <= 0 => plain
    least squares, the reference's behavior, SFM.py:421-429)."""
    r = residuals(problem, cam, pts)
    if delta <= 0:
        return jnp.sum(r * r)
    rn = jnp.linalg.norm(r, axis=-1)
    quad = rn * rn
    lin = 2.0 * delta * rn - delta * delta
    return jnp.sum(jnp.where(rn <= delta, quad, lin))


def huber_weights(r: jax.Array, delta: float) -> jax.Array:
    """(O,) IRLS scale factors: sqrt(rho'(|r|)/|r|), 1 inside the quadratic zone."""
    rn = jnp.linalg.norm(r, axis=-1)
    return jnp.where(rn <= delta, 1.0, jnp.sqrt(delta / jnp.maximum(rn, 1e-12)))


def scale_focal(problem: BAProblem, s) -> BAProblem:
    """Problem with fx, fy scaled by the shared selfcal factor ``s``."""
    K = problem.K
    return problem._replace(K=K.at[:, 0, 0].mul(s).at[:, 1, 1].mul(s))


class LMRunOut(NamedTuple):
    cam_params: jax.Array   # (C, 6)
    points: jax.Array       # (P, 3)
    s: jax.Array            # () focal scale (1.0 unless selfcal)
    initial_cost: jax.Array
    final_cost: jax.Array
    initial_mean_error: jax.Array
    final_mean_error: jax.Array
    iterations_used: jax.Array


def _selfcal_border_jacobian(base: BAProblem, p_s: BAProblem, r, s):
    """d r / d s analytically: r = w (proj - obs); d proj / d s =
    (proj - principal_point) / s."""
    w = base.obs_w
    proj = jnp.where(
        (w > 0)[:, None], r / jnp.maximum(w, 1e-12)[:, None], 0.0
    ) + base.obs_xy
    pp = p_s.K[base.obs_cam][:, :2, 2]
    return jnp.where((w > 0)[:, None], (proj - pp) / s * w[:, None], 0.0)


def _solve_bordered(op, Js, Jc, Jp, r, lam, cg_iters, eta, red, cam_fixed):
    """Bordered Schur solve for the selfcal system (points already
    eliminated): two PCG solves on the same psum-per-matvec operator, then
    the 1-D border back-substitution.  ``red`` reduces cross-observation sums
    (identity or psum); the border blocks reduce exactly like U/V/W.

    ``cam_fixed`` zeroes frozen cameras' steps BEFORE the point
    back-substitution (the pre-unification ba/selfcal.py ordering: points
    must back-substitute the camera step that is actually applied, not a
    discarded one)."""
    C = op.U.shape[0]
    Pn = op.Vinv.shape[0]
    eps = 1e-8
    Hss = red(jnp.sum(Js * Js))
    Hss_d = Hss * (1.0 + lam) + eps
    gs = red(jnp.sum(Js * r))
    Wsp = red(jax.ops.segment_sum(
        jnp.einsum("ok,okj->oj", Js, Jp), op.obs_pt, num_segments=Pn
    ))                                                      # (P, 3)
    Hsc = red(jax.ops.segment_sum(
        jnp.einsum("ok,oki->oi", Js, Jc), op.obs_cam, num_segments=C
    ))                                                      # (C, 6)
    VinvWsp = jnp.einsum("pij,pj->pi", op.Vinv, Wsp)        # (P, 3) replicated
    d_o = jnp.einsum("oij,oj->oi", op.W, VinvWsp[op.obs_pt])
    q = Hsc - red(jax.ops.segment_sum(d_o, op.obs_cam, num_segments=C))
    hss_red = Hss_d - jnp.sum(Wsp * VinvWsp)
    b_s = gs - jnp.sum(Wsp * jnp.einsum("pij,pj->pi", op.Vinv, op.gp))

    b_c = schur_rhs(op, reduce_fn=red)
    Uinv = jnp.linalg.inv(op.U)

    def mv(x):
        return schur_matvec(op, x.reshape(C, 6), reduce_fn=red).reshape(-1)

    def pc(x):
        return jnp.einsum("cij,cj->ci", Uinv, x.reshape(C, 6)).reshape(-1)

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
    dc = jnp.where(cam_fixed[:, None], 0.0, dc)
    dp = back_substitute_points(op, dc, reduce_fn=red) - ds * VinvWsp
    return dc, dp, ds


def lm_run(
    base: BAProblem,
    *,
    selfcal: bool,
    use_dense: bool,
    huber_delta: float,
    max_iters: int,
    cg_iters: int,
    init_damping,
    damping_up,
    damping_down,
    ftol,
    forcing: bool = True,
    reduce_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> LMRunOut:
    """Run the LM loop.  ``base``'s observation arrays may be a local shard
    (pass ``reduce_fn=lambda x: lax.psum(x, axis)``); cameras/points/K are
    replicated.  ``selfcal``/``use_dense``/``huber_delta``/``forcing``/
    ``max_iters``/``cg_iters`` must be Python-static (they choose program
    structure); the damping/ftol scalars may be traced."""
    if selfcal and use_dense:
        raise ValueError("the bordered selfcal solve has no dense path")
    red = reduce_fn if reduce_fn is not None else (lambda x: x)
    C = base.num_cameras
    Pn = base.num_points
    dtype = base.points.dtype

    def scaled(s):
        return scale_focal(base, s) if selfcal else base

    def cost_fn(cam, pts, s):
        p = scaled(s)
        if huber_delta > 0:
            return red(robust_cost(p, cam, pts, huber_delta))
        return red(total_cost(p, cam, pts))

    def mean_err(cam, pts, s):
        p = scaled(s)
        r = residuals(p, cam, pts)
        w = p.obs_w
        err = jnp.linalg.norm(r, axis=-1) / jnp.maximum(w, 1e-12)
        err = jnp.where(w > 0, err, 0.0)
        tot = red(jnp.sum(err))
        n = red(jnp.sum((w > 0).astype(r.dtype)))
        return tot / jnp.maximum(n, 1.0)

    def lm_step(state):
        cam, pts, s, lam, cost, it, done, eta = state
        eta_used = eta
        p_s = scaled(s)
        Jc, Jp, r = jacobian_blocks(p_s, cam, pts)
        if selfcal:
            Js = _selfcal_border_jacobian(base, p_s, r, s)
        if huber_delta > 0:
            hw = huber_weights(r, huber_delta)
            r = r * hw[:, None]
            Jc = Jc * hw[:, None, None]
            Jp = Jp * hw[:, None, None]
            if selfcal:
                Js = Js * hw[:, None]
        op = build_normal_blocks(
            Jc, Jp, r, base.obs_cam, base.obs_pt, C, Pn, lam, reduce_fn=red
        )
        if selfcal:
            dc, dp, ds = _solve_bordered(
                op, Js, Jc, Jp, r, lam, cg_iters, eta, red, base.cam_fixed
            )
        elif use_dense:
            dc, dp = solve_schur_dense(op, reduce_fn=red)
            ds = jnp.asarray(0.0, dtype)
            eta_used = jnp.zeros_like(eta)   # exact solve: always "tight"
        else:
            dc, dp = solve_schur(op, cg_iters=cg_iters, tol_rel=eta,
                                 reduce_fn=red)
            ds = jnp.asarray(0.0, dtype)

        dc = jnp.where(base.cam_fixed[:, None], 0.0, dc)
        cam_new = cam - dc
        pts_new = pts - dp
        s_new = jnp.clip(s - ds, 0.5, 2.0) if selfcal else s
        new_cost = cost_fn(cam_new, pts_new, s_new)
        finite = jnp.isfinite(new_cost)
        improved = (new_cost < cost) & finite

        cam = jnp.where(improved, cam_new, cam)
        pts = jnp.where(improved, pts_new, pts)
        s = jnp.where(improved, s_new, s)
        lam = jnp.where(improved, lam * damping_down, lam * damping_up)
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        # Converged only when a TIGHTLY-solved step (eta at its floor, or an
        # exact dense solve) stops making progress: a loose Eisenstat-Walker
        # step that happens to move < ftol must not end the solve early (it
        # parks the trajectory at a basin point up to ~0.5% ATE away from the
        # optimum — measured on the bench scene; this gate recovers it for ~2
        # extra cheap iterations).
        done = done | (improved & (rel_decrease < ftol) & (eta_used <= 2e-3))
        cost = jnp.where(improved, new_cost, cost)
        # Eisenstat-Walker forcing: the next CG solve only needs accuracy
        # proportional to how nonlinear the problem still is.  Fast progress
        # (large relative decrease) => loose tolerance; near convergence (or
        # a rejected step) => tight.  Bounded to [1e-3, 0.3]; the FIRST
        # solve starts at 0.15 — a 0.3-loose first step measurably bends the
        # final trajectory (bench seed-7 scene: ATE 1.02% -> 0.70% of extent
        # for ~0.06 s extra BA time).
        if forcing:
            eta = jnp.where(
                improved,
                jnp.clip(jnp.sqrt(jnp.maximum(rel_decrease, 0.0)), 1e-3, 0.3),
                jnp.asarray(1e-3, eta.dtype),
            )
        else:
            eta = jnp.zeros_like(eta)
        return cam, pts, s, lam, cost, it + 1, done, eta

    def cond(state):
        *_, it, done, eta = state
        return (it < max_iters) & jnp.logical_not(done)

    s0 = jnp.asarray(1.0, dtype)
    cost0 = cost_fn(base.cam_params, base.points, s0)
    err0 = mean_err(base.cam_params, base.points, s0)
    state = (
        base.cam_params,
        base.points,
        s0,
        jnp.asarray(init_damping, dtype),
        cost0,
        jnp.asarray(0),
        jnp.asarray(False),
        jnp.asarray(0.15 if forcing else 0.0, dtype),
    )
    cam, pts, s, _, cost, it, _, _ = jax.lax.while_loop(cond, lm_step, state)
    err1 = mean_err(cam, pts, s)
    return LMRunOut(
        cam_params=cam, points=pts, s=s,
        initial_cost=cost0, final_cost=cost,
        initial_mean_error=err0, final_mean_error=err1,
        iterations_used=it,
    )
