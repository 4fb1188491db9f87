"""Distributed bundle adjustment: observations sharded over the ``data`` mesh
axis, reduced camera system combined with ``psum`` over ICI.

This is the long-sequence / large-map scaling story (SURVEY.md §5.7): each
device owns an observation shard, forms its local J^T J contributions
(cameras: 6x6 blocks, points: 3x3 blocks, cross terms per observation), and
the Schur-complement solve runs replicated with psum-reduced segment-sums —
the exact communication pattern of data-parallel gradient training, riding
ICI within a slice and DCN across hosts.

Numerically identical to the single-device LM in ba/lm.py BY CONSTRUCTION:
both instantiate the one LM driver in ba/lm_core.py — this module only
supplies ``reduce_fn=lambda x: lax.psum(x, axis)`` and the shard_map
plumbing.  Verified by tests/test_parallel.py on the 8-device virtual CPU
mesh and tests/test_multiprocess.py across real process groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sfmfromscratch_tpu.ba.lm import BAResult, resolve_dense, resolve_forcing
from sfmfromscratch_tpu.ba.lm_core import lm_run
from sfmfromscratch_tpu.ba.problem import BAProblem
from sfmfromscratch_tpu.utils.precision import mm_f32


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
    """LM + Schur with observation shards on ``axis``. Cameras and points
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

    # Backend resolution OUTSIDE the cached program (r4 ADVICE: the env vars
    # now participate in the lru/jit cache keys, so toggling them between
    # solves of the same shape actually switches programs).
    use_dense = (not selfcal) and resolve_dense(
        None, problem.num_cameras, Pn
    )
    fn = _sharded_lm_fn(
        mesh, axis, max_iters, cg_iters, init_damping, damping_up,
        damping_down, ftol, huber_delta, selfcal, use_dense,
        resolve_forcing(),
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
    ftol: float, huber_delta: float, selfcal: bool, use_dense: bool,
    forcing: bool,
):
    """Build (once per (mesh, config, backend)) the jitted shard_map LM
    program.

    Cached so repeated solves — the engine's ba_rounds, the streaming
    window sweep (pipeline/streaming.py) — reuse one compiled program per
    problem shape instead of re-tracing every call."""
    rep = P()

    def lm_program(cam0, pts0, K, obs_cam, obs_pt, obs_xy, obs_w, cam_fixed,
                   pt_fixed):
        """Runs per-shard under shard_map; obs_* are local shards."""
        base = BAProblem(
            cam_params=cam0, points=pts0, K=K,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_xy=obs_xy, obs_w=obs_w,
            cam_fixed=cam_fixed, pt_fixed=pt_fixed,
        )
        out = lm_run(
            base,
            selfcal=selfcal,
            use_dense=use_dense,
            huber_delta=huber_delta,
            max_iters=max_iters,
            cg_iters=cg_iters,
            init_damping=init_damping,
            damping_up=damping_up,
            damping_down=damping_down,
            ftol=ftol,
            forcing=forcing,
            reduce_fn=lambda x: jax.lax.psum(x, axis),
        )
        return tuple(out)

    fn = shard_map(
        lm_program,
        mesh=mesh,
        in_specs=_sharded_in_specs(axis),
        out_specs=(rep, rep, rep, rep, rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(mm_f32(fn))
