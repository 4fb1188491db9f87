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

The LM loop and the bordered solve live in ba/lm_core.py (``selfcal=True``)
— ONE implementation shared with ba/lm.py and parallel/sharded_ba.py, so
damping/forcing/acceptance can never drift between solvers again (the
round-3 parity regression came from hand-mirrored copies).
"""

from __future__ import annotations

import functools

import jax

from sfmfromscratch_tpu.ba.lm import BAResult, resolve_forcing
from sfmfromscratch_tpu.ba.lm_core import lm_run
from sfmfromscratch_tpu.ba.problem import BAProblem
from sfmfromscratch_tpu.utils.precision import mm_f32


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "cg_iters", "huber_delta", "forcing"),
)
@mm_f32
def _selfcal_impl(
    problem: BAProblem,
    max_iters: int,
    cg_iters: int,
    init_damping,
    damping_up,
    damping_down,
    ftol,
    huber_delta: float,
    forcing: bool,
):
    out = lm_run(
        problem,
        selfcal=True,
        use_dense=False,
        huber_delta=huber_delta,
        max_iters=max_iters,
        cg_iters=cg_iters,
        init_damping=init_damping,
        damping_up=damping_up,
        damping_down=damping_down,
        ftol=ftol,
        forcing=forcing,
    )
    res = BAResult(
        cam_params=out.cam_params, points=out.points,
        initial_cost=out.initial_cost, final_cost=out.final_cost,
        initial_mean_error=out.initial_mean_error,
        final_mean_error=out.final_mean_error,
        iterations_used=out.iterations_used,
    )
    return res, out.s


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
    return _selfcal_impl(
        problem, max_iters, cg_iters, init_damping, damping_up, damping_down,
        ftol, huber_delta, resolve_forcing(),
    )
