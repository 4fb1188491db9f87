"""Levenberg-Marquardt bundle adjustment, fully on-device.

One jitted program: each LM iteration builds the damped normal-equation blocks
from analytic Jacobians, solves the Schur-reduced camera system (exact dense
Cholesky for small camera counts, matrix-free PCG otherwise), back-substitutes
the points, and accepts/rejects the step with adaptive damping — the
TPU-native replacement for the reference's
``BundleAdjustment.sparse_bundle_adjustment`` (SFM.py:405-435: scipy trf,
2-point numerical Jacobian, host-side Python residual loop).

Termination matches the reference's spirit (ftol=1e-2 relative cost decrease,
SFM.py:427) but as a fixed-iteration loop with an accept mask, so the program
has static shape.

The LM step itself lives in ba/lm_core.py — ONE implementation shared with
the selfcal and observation-sharded solvers; this module only chooses the
backend (dense gate + env overrides, resolved OUTSIDE jit so they always
take effect) and wraps the result.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax

from sfmfromscratch_tpu.utils.precision import mm_f32

from sfmfromscratch_tpu.ba.lm_core import (  # noqa: F401  (re-exported API)
    huber_weights,
    lm_run,
    robust_cost,
)
from sfmfromscratch_tpu.ba.problem import BAProblem
from sfmfromscratch_tpu.ba.schur import dense_gate


class BAResult(NamedTuple):
    cam_params: jax.Array     # (C, 6) optimized [rvec | t]
    points: jax.Array         # (P, 3) optimized points
    initial_cost: jax.Array
    final_cost: jax.Array
    initial_mean_error: jax.Array
    final_mean_error: jax.Array
    iterations_used: jax.Array


def resolve_dense(use_dense: Optional[bool], num_cameras: int,
                  num_points: int) -> bool:
    """Resolve the Schur backend: explicit override > env kill-switch >
    :func:`~sfmfromscratch_tpu.ba.schur.dense_gate`.  Called outside jit by
    every solver entry point (single-device, selfcal, sharded) so the env var
    participates in each cache key — toggling ``SFM_NO_DENSE_SCHUR`` after a
    first solve of a given shape now actually switches backends (r4 ADVICE)."""
    if use_dense is not None:
        return bool(use_dense)
    if os.environ.get("SFM_NO_DENSE_SCHUR"):
        return False
    return dense_gate(num_cameras, num_points)


def resolve_forcing() -> bool:
    """Eisenstat-Walker forcing unless ``SFM_NO_CG_FORCING`` is set (A/B
    numerics diagnostics: pins eta to 0 => full fixed-iteration CG)."""
    return not os.environ.get("SFM_NO_CG_FORCING")


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "cg_iters", "huber_delta", "use_dense",
                     "forcing"),
)
@mm_f32
def _bundle_adjust_impl(
    problem: BAProblem,
    max_iters: int,
    cg_iters: int,
    init_damping,
    damping_up,
    damping_down,
    ftol,
    huber_delta: float,
    use_dense: bool,
    forcing: bool,
) -> BAResult:
    out = lm_run(
        problem,
        selfcal=False,
        use_dense=use_dense,
        huber_delta=huber_delta,
        max_iters=max_iters,
        cg_iters=cg_iters,
        init_damping=init_damping,
        damping_up=damping_up,
        damping_down=damping_down,
        ftol=ftol,
        forcing=forcing,
    )
    return BAResult(
        cam_params=out.cam_params,
        points=out.points,
        initial_cost=out.initial_cost,
        final_cost=out.final_cost,
        initial_mean_error=out.initial_mean_error,
        final_mean_error=out.final_mean_error,
        iterations_used=out.iterations_used,
    )


def bundle_adjust(
    problem: BAProblem,
    max_iters: int = 30,
    cg_iters: int = 50,
    init_damping: float = 1e-3,
    damping_up: float = 4.0,
    damping_down: float = 0.5,
    ftol: float = 1e-2,
    huber_delta: float = 0.0,
    use_dense: Optional[bool] = None,
) -> BAResult:
    """Run LM to convergence (relative cost decrease < ftol) or ``max_iters``.

    ``huber_delta > 0`` switches to a Huber robust loss via IRLS: residuals
    beyond delta pixels are down-weighted each iteration, so gross outlier
    tracks cannot drag the solution (the reference's scipy trf is plain least
    squares, SFM.py:421-429).

    ``use_dense`` picks the Schur backend explicitly (None = auto: dense
    exact Cholesky when ``dense_gate`` passes and ``SFM_NO_DENSE_SCHUR`` is
    unset, matrix-free PCG otherwise).  Both backends solve the same normal
    equations; tests/test_ba.py pins their agreement.
    """
    return _bundle_adjust_impl(
        problem, max_iters, cg_iters, init_damping, damping_up, damping_down,
        ftol, huber_delta,
        resolve_dense(use_dense, problem.num_cameras, problem.num_points),
        resolve_forcing(),
    )
