"""Levenberg-Marquardt bundle adjustment, fully on-device.

One jitted program: each LM iteration builds the damped normal-equation blocks
from analytic Jacobians, solves the Schur-reduced camera system with
matrix-free CG, back-substitutes the points, and accepts/rejects the step with
adaptive damping — the TPU-native replacement for the reference's
``BundleAdjustment.sparse_bundle_adjustment`` (SFM.py:405-435: scipy trf,
2-point numerical Jacobian, host-side Python residual loop).

Termination matches the reference's spirit (ftol=1e-2 relative cost decrease,
SFM.py:427) but as a fixed-iteration loop with an accept mask, so the program
has static shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ba.problem import (
    BAProblem,
    jacobian_blocks,
    mean_reprojection_error,
    total_cost,
)
from sfmfromscratch_tpu.ba.schur import build_normal_blocks, solve_schur


class BAResult(NamedTuple):
    cam_params: jax.Array     # (C, 6) optimized [rvec | t]
    points: jax.Array         # (P, 3) optimized points
    initial_cost: jax.Array
    final_cost: jax.Array
    initial_mean_error: jax.Array
    final_mean_error: jax.Array
    iterations_used: jax.Array


@functools.partial(jax.jit, static_argnames=("max_iters", "cg_iters"))
def bundle_adjust(
    problem: BAProblem,
    max_iters: int = 30,
    cg_iters: int = 50,
    init_damping: float = 1e-3,
    damping_up: float = 4.0,
    damping_down: float = 0.5,
    ftol: float = 1e-2,
) -> BAResult:
    """Run LM to convergence (relative cost decrease < ftol) or ``max_iters``."""
    C = problem.num_cameras
    P = problem.num_points

    def lm_step(state):
        cam, pts, lam, cost, it, done = state
        Jc, Jp, r = jacobian_blocks(problem, cam, pts)
        op = build_normal_blocks(
            Jc, Jp, r, problem.obs_cam, problem.obs_pt, C, P, lam
        )
        dc, dp = solve_schur(op, cg_iters=cg_iters)
        dc = jnp.where(problem.cam_fixed[:, None], 0.0, dc)
        cam_new = cam - dc
        pts_new = pts - dp
        new_cost = total_cost(problem, cam_new, pts_new)
        finite = jnp.isfinite(new_cost)
        improved = (new_cost < cost) & finite

        cam = jnp.where(improved, cam_new, cam)
        pts = jnp.where(improved, pts_new, pts)
        lam = jnp.where(improved, lam * damping_down, lam * damping_up)
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        done = done | (improved & (rel_decrease < ftol))
        cost = jnp.where(improved, new_cost, cost)
        return cam, pts, lam, cost, it + 1, done

    def cond(state):
        *_, it, done = state
        return (it < max_iters) & jnp.logical_not(done)

    cost0 = total_cost(problem, problem.cam_params, problem.points)
    err0 = mean_reprojection_error(problem)
    state = (
        problem.cam_params,
        problem.points,
        jnp.asarray(init_damping, dtype=problem.points.dtype),
        cost0,
        jnp.asarray(0),
        jnp.asarray(False),
    )
    cam, pts, _, cost, it, _ = jax.lax.while_loop(cond, lm_step, state)
    err1 = mean_reprojection_error(problem, cam, pts)
    return BAResult(
        cam_params=cam,
        points=pts,
        initial_cost=cost0,
        final_cost=cost,
        initial_mean_error=err0,
        final_mean_error=err1,
        iterations_used=it,
    )
