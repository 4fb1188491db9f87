"""Distributed bundle adjustment: observations sharded over the ``data`` mesh
axis, reduced camera system combined with ``psum`` over ICI.

This is the long-sequence / large-map scaling story (SURVEY.md §5.7): each
device owns an observation shard, forms its local J^T J contributions
(cameras: 6x6 blocks, points: 3x3 blocks, cross terms per observation), and
the Schur-complement CG runs replicated with one psum per matvec — the exact
communication pattern of data-parallel gradient training, riding ICI within a
slice and DCN across hosts.

Numerically identical to the single-device LM in ba/lm.py (same blocks, same
CG) — verified by tests/test_parallel.py on the 8-device virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.smallsvd import inv3_spd


from sfmfromscratch_tpu.utils.precision import mm_f32
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sfmfromscratch_tpu.ba.lm import BAResult, huber_weights, robust_cost
from sfmfromscratch_tpu.ba.problem import (
    BAProblem,
    jacobian_blocks,
    mean_reprojection_error,
    total_cost,
)
from sfmfromscratch_tpu.ba.schur import (
    DENSE_SCHUR_MAX_CAMS,
    conjugate_gradient,
    dense_schur_from_blocks,
    point_cam_blocks,
)


def pad_problem_for_sharding(problem: BAProblem, num_shards: int) -> BAProblem:
    """Pad the observation arrays to a multiple of ``num_shards`` with
    zero-weight observations (weight 0 ≡ no contribution)."""
    O = problem.num_obs
    rem = (-O) % num_shards
    if rem == 0:
        return problem
    pad_i = np.zeros(rem, np.int32)
    return problem._replace(
        obs_cam=jnp.concatenate([problem.obs_cam, jnp.asarray(pad_i)]),
        obs_pt=jnp.concatenate([problem.obs_pt, jnp.asarray(pad_i)]),
        obs_xy=jnp.concatenate([problem.obs_xy, jnp.zeros((rem, 2), problem.obs_xy.dtype)]),
        obs_w=jnp.concatenate([problem.obs_w, jnp.zeros(rem, problem.obs_w.dtype)]),
    )


def bundle_adjust_sharded(
    problem: BAProblem,
    mesh: Mesh,
    axis: str = "data",
    max_iters: int = 30,
    cg_iters: int = 50,
    init_damping: float = 1e-3,
    damping_up: float = 4.0,
    damping_down: float = 0.5,
    ftol: float = 1e-2,
    huber_delta: float = 0.0,
    selfcal: bool = False,
):
    """LM + Schur/CG with observation shards on ``axis``. Cameras and points
    are replicated (they are tiny next to the observations). ``huber_delta``
    matches the single-device solver's robust IRLS loss (0 = plain least
    squares).

    ``selfcal=True`` adds the shared-focal-scale border of
    ba/selfcal.py to the sharded system (VERDICT round-1 item 7): the border
    terms (Hss, gs, Wsp, Hsc) are local segment-sums psum-reduced like every
    other normal-equation block, and the bordered solve costs a second CG on
    the same psum-per-matvec operator. Returns ``(BAResult, s)`` instead of
    ``BAResult``."""
    num_shards = mesh.shape[axis]
    problem = pad_problem_for_sharding(problem, num_shards)
    Pn = problem.num_points

    fn = _sharded_lm_fn(
        mesh, axis, max_iters, cg_iters, init_damping, damping_up,
        damping_down, ftol, huber_delta, selfcal,
    )
    pt_fixed = problem.pt_fixed
    if pt_fixed is None:
        pt_fixed = jnp.zeros(Pn, dtype=bool)
    args = (
        problem.cam_params, problem.points, problem.K,
        problem.obs_cam, problem.obs_pt, problem.obs_xy, problem.obs_w,
        problem.cam_fixed, pt_fixed,
    )
    if jax.process_count() > 1:
        # Multi-host: jit over a multi-process mesh needs GLOBAL input arrays;
        # every process holds the full problem (built redundantly, SPMD-style)
        # and contributes the shards it addresses.
        from sfmfromscratch_tpu.parallel.mesh import put_global

        args = tuple(put_global(a, mesh, s)
                     for a, s in zip(args, _sharded_in_specs(axis)))
    cam, pts, s, c0, c1, e0, e1, it = fn(*args)
    res = BAResult(
        cam_params=cam, points=pts, initial_cost=c0, final_cost=c1,
        initial_mean_error=e0, final_mean_error=e1, iterations_used=it,
    )
    return (res, s) if selfcal else res


def _sharded_in_specs(axis: str):
    obs_spec = P(axis)
    rep = P()
    return (rep, rep, rep, obs_spec, obs_spec, obs_spec, obs_spec, rep, rep)


@functools.lru_cache(maxsize=32)
def _sharded_lm_fn(
    mesh: Mesh, axis: str, max_iters: int, cg_iters: int,
    init_damping: float, damping_up: float, damping_down: float,
    ftol: float, huber_delta: float, selfcal: bool,
):
    """Build (once per (mesh, config)) the jitted shard_map LM program.

    Cached so repeated solves — the engine's ba_rounds, the streaming
    window sweep (pipeline/streaming.py) — reuse one compiled program per
    problem shape instead of re-tracing every call."""
    rep = P()

    def lm_program(cam0, pts0, K, obs_cam, obs_pt, obs_xy, obs_w, cam_fixed,
                   pt_fixed):
        """Runs per-shard under shard_map; obs_* are local shards."""
        C = cam0.shape[0]
        Pn = pts0.shape[0]
        # MUST mirror ba/lm.py's gate exactly (sharded == single-device
        # parity): dense exact Schur for small C, matrix-free PCG otherwise.
        import os as _os

        use_dense = (
            C <= DENSE_SCHUR_MAX_CAMS
            and not selfcal
            and not _os.environ.get("SFM_NO_DENSE_SCHUR")
        )
        base = BAProblem(
            cam_params=cam0, points=pts0, K=K,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_xy=obs_xy, obs_w=obs_w,
            cam_fixed=cam_fixed, pt_fixed=pt_fixed,
        )

        def scaled(s):
            if not selfcal:
                return base
            return base._replace(K=K.at[:, 0, 0].mul(s).at[:, 1, 1].mul(s))

        def cost_fn(cam, pts, s):
            local = scaled(s)
            if huber_delta > 0:
                return jax.lax.psum(
                    robust_cost(local, cam, pts, huber_delta), axis
                )
            return jax.lax.psum(total_cost(local, cam, pts), axis)

        def mean_err(cam, pts, s):
            # weighted mean across shards
            from sfmfromscratch_tpu.ba.problem import residuals

            local = scaled(s)
            r = residuals(local, cam, pts)
            w = local.obs_w
            err = jnp.linalg.norm(r, axis=-1) / jnp.maximum(w, 1e-12)
            err = jnp.where(w > 0, err, 0.0)
            tot = jax.lax.psum(jnp.sum(err), axis)
            n = jax.lax.psum(jnp.sum((w > 0).astype(r.dtype)), axis)
            return tot / jnp.maximum(n, 1.0)

        def lm_step(state):
            cam, pts, s, lam, cost, it, done, eta = state
            eta_used = eta
            local = scaled(s)
            Jc, Jp, r = jacobian_blocks(local, cam, pts)
            if selfcal:
                # d r / d s analytically (ba/selfcal.py): r = w (proj - obs);
                # d proj / d s = (proj - principal_point) / s.
                w = local.obs_w
                proj = jnp.where(
                    (w > 0)[:, None], r / jnp.maximum(w, 1e-12)[:, None], 0.0
                ) + local.obs_xy
                pp = local.K[obs_cam][:, :2, 2]
                Js = jnp.where((w > 0)[:, None], (proj - pp) / s * w[:, None], 0.0)
            if huber_delta > 0:
                hw = huber_weights(r, huber_delta)
                r = r * hw[:, None]
                Jc = Jc * hw[:, None, None]
                Jp = Jp * hw[:, None, None]
                if selfcal:
                    Js = Js * hw[:, None]
            UtU = jnp.einsum("oki,okj->oij", Jc, Jc)
            VtV = jnp.einsum("oki,okj->oij", Jp, Jp)
            W = jnp.einsum("oki,okj->oij", Jc, Jp)
            gc_o = jnp.einsum("oki,ok->oi", Jc, r)
            gp_o = jnp.einsum("oki,ok->oi", Jp, r)
            U = jax.lax.psum(jax.ops.segment_sum(UtU, obs_cam, num_segments=C), axis)
            V = jax.lax.psum(jax.ops.segment_sum(VtV, obs_pt, num_segments=Pn), axis)
            gc = jax.lax.psum(jax.ops.segment_sum(gc_o, obs_cam, num_segments=C), axis)
            gp = jax.lax.psum(jax.ops.segment_sum(gp_o, obs_pt, num_segments=Pn), axis)
            eps = 1e-8
            dU = jnp.diagonal(U, axis1=-2, axis2=-1)
            U = U + jnp.eye(6, dtype=U.dtype) * (lam * dU + eps)[..., None, :]
            dV = jnp.diagonal(V, axis1=-2, axis2=-1)
            V = V + jnp.eye(3, dtype=V.dtype) * (lam * dV + eps)[..., None, :]
            Vinv = inv3_spd(V)  # SPD Cholesky inverse: stable closed form, no LAPACK

            def matvec(xflat):
                x = xflat.reshape(C, 6)
                Ux = jnp.einsum("cij,cj->ci", U, x)
                a = jnp.einsum("oji,oj->oi", W, x[obs_cam])
                b = jax.lax.psum(jax.ops.segment_sum(a, obs_pt, num_segments=Pn), axis)
                c = jnp.einsum("pij,pj->pi", Vinv, b)
                d = jnp.einsum("oij,oj->oi", W, c[obs_pt])
                e = jax.lax.psum(jax.ops.segment_sum(d, obs_cam, num_segments=C), axis)
                return (Ux - e).reshape(-1)

            Uinv = jnp.linalg.inv(U)

            def pc(rflat):
                # Block-Jacobi (damped U^-1) preconditioner — same choice as
                # the single-device solve_schur; see ba/schur.py.
                return jnp.einsum(
                    "cij,cj->ci", Uinv, rflat.reshape(C, 6)
                ).reshape(-1)

            cvp = jnp.einsum("pij,pj->pi", Vinv, gp)
            dtmp = jnp.einsum("oij,oj->oi", W, cvp[obs_pt])
            e_rhs = jax.lax.psum(jax.ops.segment_sum(dtmp, obs_cam, num_segments=C), axis)
            b_rhs = (gc - e_rhs).reshape(-1)

            if selfcal:
                # Bordered Schur system (ba/selfcal.py): border blocks are
                # local segment-sums psum-reduced like U/V/W above.
                eps = 1e-8
                Hss = jax.lax.psum(jnp.sum(Js * Js), axis)
                Hss_d = Hss * (1.0 + lam) + eps
                gs = jax.lax.psum(jnp.sum(Js * r), axis)
                Wsp = jax.lax.psum(jax.ops.segment_sum(
                    jnp.einsum("ok,okj->oj", Js, Jp), obs_pt, num_segments=Pn
                ), axis)                                            # (P, 3)
                Hsc = jax.lax.psum(jax.ops.segment_sum(
                    jnp.einsum("ok,oki->oi", Js, Jc), obs_cam, num_segments=C
                ), axis)                                            # (C, 6)
                VinvWsp = jnp.einsum("pij,pj->pi", Vinv, Wsp)       # replicated
                d_o = jnp.einsum("oij,oj->oi", W, VinvWsp[obs_pt])
                q = Hsc - jax.lax.psum(
                    jax.ops.segment_sum(d_o, obs_cam, num_segments=C), axis)
                hss_red = Hss_d - jnp.sum(Wsp * VinvWsp)
                b_s = gs - jnp.sum(Wsp * cvp)

                u = conjugate_gradient(matvec, b_rhs, num_iters=cg_iters,
                                       precond=pc, tol_rel=eta)
                v = conjugate_gradient(matvec, q.reshape(-1), num_iters=cg_iters,
                                       precond=pc, tol_rel=eta)
                qf = q.reshape(-1)
                denom = hss_red - jnp.vdot(qf, v)
                ds = (b_s - jnp.vdot(qf, u)) / jnp.where(
                    jnp.abs(denom) < 1e-12, 1e-12, denom
                )
                dc = (u - ds * v).reshape(C, 6)
            elif use_dense:
                ds = jnp.asarray(0.0, pts.dtype)
                # Local (pt, cam) block sums psum-reduced BEFORE the
                # quadratic form (S is quadratic in them), then the same
                # replicated dense Cholesky as ba/schur.solve_schur_dense.
                Bflat = jax.lax.psum(
                    point_cam_blocks(W, obs_cam, obs_pt, C, Pn), axis
                )
                S = dense_schur_from_blocks(U, Vinv, Bflat)
                cf = jax.scipy.linalg.cho_factor(S, lower=True)
                dc = jax.scipy.linalg.cho_solve(cf, b_rhs).reshape(C, 6)
                eta_used = jnp.zeros_like(eta)   # exact solve: always "tight"
            else:
                ds = jnp.asarray(0.0, pts.dtype)
                dc = conjugate_gradient(
                    matvec, b_rhs, num_iters=cg_iters, precond=pc, tol_rel=eta
                ).reshape(C, 6)
            a2 = jnp.einsum("oji,oj->oi", W, dc[obs_cam])
            b2 = jax.lax.psum(jax.ops.segment_sum(a2, obs_pt, num_segments=Pn), axis)
            dp = jnp.einsum("pij,pj->pi", Vinv, gp - b2)
            if selfcal:
                dp = dp - ds * VinvWsp

            dc = jnp.where(cam_fixed[:, None], 0.0, dc)
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
            rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
            # mirror of ba/lm.py: only a tightly-solved step may declare done
            done = done | (improved & (rel < ftol) & (eta_used <= 2e-3))
            cost = jnp.where(improved, new_cost, cost)
            # Eisenstat-Walker forcing — MUST mirror ba/lm.py:lm_step exactly,
            # or the sharded and single-device solvers take different LM
            # trajectories and the parity tests (tests/test_parallel.py,
            # tests/test_multiprocess.py) fail (round-3 regression).
            eta = jnp.where(
                improved,
                jnp.clip(jnp.sqrt(jnp.maximum(rel, 0.0)), 1e-3, 0.3),
                jnp.asarray(1e-3, eta.dtype),
            )
            return cam, pts, s, lam, cost, it + 1, done, eta

        def cond(state):
            *_, it, done, eta = state
            return (it < max_iters) & jnp.logical_not(done)

        s0 = jnp.asarray(1.0, pts0.dtype)
        cost0 = cost_fn(cam0, pts0, s0)
        err0 = mean_err(cam0, pts0, s0)
        state = (cam0, pts0, s0, jnp.asarray(init_damping, pts0.dtype), cost0,
                 jnp.asarray(0), jnp.asarray(False),
                 jnp.asarray(0.15, pts0.dtype))
        cam, pts, s, _, cost, it, _, _ = jax.lax.while_loop(cond, lm_step, state)
        err1 = mean_err(cam, pts, s)
        return cam, pts, s, cost0, cost, err0, err1, it

    fn = shard_map(
        lm_program,
        mesh=mesh,
        in_specs=_sharded_in_specs(axis),
        out_specs=(rep, rep, rep, rep, rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(mm_f32(fn))
