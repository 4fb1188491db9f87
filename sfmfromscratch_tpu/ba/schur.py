"""Matrix-free Schur-complement solver for the LM normal equations.

The damped normal system is

    [U  W] [dc]   [gc]
    [W' V] [dp] = [gp]

with U block-diagonal over cameras (6x6), V block-diagonal over points (3x3)
and W one 6x3 block per observation. Eliminating the points gives the reduced
camera system  S dc = b,  S = U - W V^-1 W',  b = gc - W V^-1 gp.

S is never formed: its matvec is four segment-gather/scatter passes over the
observations plus batched small matmuls — O(O) work, no C^2 memory, and every
op is a fixed-shape ``segment_sum``/einsum that XLA maps cleanly onto TPU.
The same matvec runs sharded over observation shards with a ``psum`` in
parallel/sharded_ba.py; this file is the single-device core.

This replaces the reference's generic scipy trf solve with numerical Jacobians
(SFM.py:421-429), which re-evaluates the Python residual loop once per
parameter column.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.smallsvd import inv3_spd



class SchurOperands(NamedTuple):
    U: jax.Array        # (C, 6, 6) damped camera blocks
    Vinv: jax.Array     # (P, 3, 3) inverted damped point blocks
    W: jax.Array        # (O, 6, 3) cross blocks
    gc: jax.Array       # (C, 6)
    gp: jax.Array       # (P, 3)
    obs_cam: jax.Array  # (O,)
    obs_pt: jax.Array   # (O,)


def _identity(x: jax.Array) -> jax.Array:
    return x


def build_normal_blocks(
    Jc: jax.Array, Jp: jax.Array, r: jax.Array,
    obs_cam: jax.Array, obs_pt: jax.Array,
    num_cameras: int, num_points: int,
    lam: jax.Array,
    reduce_fn=None,
) -> SchurOperands:
    """Assemble damped U, V^-1, W, gc, gp from per-observation blocks.

    Damping is LM-style multiplicative on the diagonal:
    diag += lam * diag + eps (keeps the system SPD even for unobserved slots).

    ``reduce_fn`` reduces cross-observation sums across shards (identity for
    single-device, ``lax.psum`` under shard_map): it is applied between the
    local segment-sum and the damping, so damping acts on the fully reduced
    diagonal — the ONE place the observation-sharded solver differs.
    """
    red = reduce_fn if reduce_fn is not None else _identity
    UtU = jnp.einsum("oki,okj->oij", Jc, Jc)          # (O, 6, 6)
    VtV = jnp.einsum("oki,okj->oij", Jp, Jp)          # (O, 3, 3)
    W = jnp.einsum("oki,okj->oij", Jc, Jp)            # (O, 6, 3)
    gc_o = jnp.einsum("oki,ok->oi", Jc, r)            # (O, 6)
    gp_o = jnp.einsum("oki,ok->oi", Jp, r)            # (O, 3)

    U = red(jax.ops.segment_sum(UtU, obs_cam, num_segments=num_cameras))
    V = red(jax.ops.segment_sum(VtV, obs_pt, num_segments=num_points))
    gc = red(jax.ops.segment_sum(gc_o, obs_cam, num_segments=num_cameras))
    gp = red(jax.ops.segment_sum(gp_o, obs_pt, num_segments=num_points))

    eps = 1e-8
    dU = jnp.diagonal(U, axis1=-2, axis2=-1)
    U = U + jnp.eye(6, dtype=U.dtype) * (lam * dU + eps)[..., None, :]
    dV = jnp.diagonal(V, axis1=-2, axis2=-1)
    V = V + jnp.eye(3, dtype=V.dtype) * (lam * dV + eps)[..., None, :]

    Vinv = inv3_spd(V)  # SPD Cholesky inverse: stable closed form, no LAPACK
    return SchurOperands(U=U, Vinv=Vinv, W=W, gc=gc, gp=gp,
                         obs_cam=obs_cam, obs_pt=obs_pt)


def schur_matvec(op: SchurOperands, x: jax.Array, reduce_fn=None) -> jax.Array:
    """S x = U x - W V^-1 W' x for x of shape (C, 6).

    With ``reduce_fn=psum`` this is the sharded matvec: W and the obs index
    arrays are local shards, U/Vinv replicated, two collectives per matvec —
    the exact communication pattern of data-parallel gradient training."""
    red = reduce_fn if reduce_fn is not None else _identity
    num_points = op.Vinv.shape[0]
    Ux = jnp.einsum("cij,cj->ci", op.U, x)
    a = jnp.einsum("oji,oj->oi", op.W, x[op.obs_cam])             # W' x  (O, 3)
    b = red(jax.ops.segment_sum(a, op.obs_pt, num_segments=num_points))
    c = jnp.einsum("pij,pj->pi", op.Vinv, b)                      # V^-1  (P, 3)
    d = jnp.einsum("oij,oj->oi", op.W, c[op.obs_pt])              # W     (O, 6)
    e = red(jax.ops.segment_sum(d, op.obs_cam, num_segments=op.U.shape[0]))
    return Ux - e


def schur_rhs(op: SchurOperands, reduce_fn=None) -> jax.Array:
    """b = gc - W V^-1 gp."""
    red = reduce_fn if reduce_fn is not None else _identity
    c = jnp.einsum("pij,pj->pi", op.Vinv, op.gp)
    d = jnp.einsum("oij,oj->oi", op.W, c[op.obs_pt])
    e = red(jax.ops.segment_sum(d, op.obs_cam, num_segments=op.U.shape[0]))
    return op.gc - e


def back_substitute_points(op: SchurOperands, dc: jax.Array, reduce_fn=None) -> jax.Array:
    """dp = V^-1 (gp - W' dc)."""
    red = reduce_fn if reduce_fn is not None else _identity
    num_points = op.Vinv.shape[0]
    a = jnp.einsum("oji,oj->oi", op.W, dc[op.obs_cam])
    b = red(jax.ops.segment_sum(a, op.obs_pt, num_segments=num_points))
    return jnp.einsum("pij,pj->pi", op.Vinv, op.gp - b)


def conjugate_gradient(
    matvec, b: jax.Array, num_iters: int, tol: float = 1e-8, precond=None,
    tol_rel=0.0,
) -> jax.Array:
    """Capped-iteration CG; pass ``precond`` (an approximate inverse, applied
    to the residual each step) for PCG. Without a preconditioner, CG needs
    O(sqrt(condition)) iterations — on a near-chain camera graph the Schur
    complement's condition grows like diameter^2, so the block-Jacobi
    preconditioner in :func:`solve_schur` is what keeps iteration counts
    bounded at hundreds of cameras.

    ``tol_rel`` (static or traced scalar) adds an inexact-Newton exit:
    ||r|| <= tol_rel * ||b||.  The absolute ``tol`` alone never fires at BA
    residual scales, so without it every solve burns the full ``num_iters``
    — an Eisenstat-Walker forcing sequence (loose early LM iterations,
    tight late) typically halves BA wall-clock at equal accuracy (VERDICT
    round-2 item 8)."""
    if precond is None:
        precond = lambda r: r

    bb = jnp.vdot(b, b)
    tol2 = jnp.maximum(
        jnp.asarray(tol, b.dtype),
        jnp.asarray(tol_rel, b.dtype) ** 2 * bb,
    )

    def body(state):
        x, rvec, z, p, rz, it = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        x = x + alpha * p
        rvec = rvec - alpha * Ap
        z = precond(rvec)
        rz_new = jnp.vdot(rvec, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return x, rvec, z, p, rz_new, it + 1

    def cond(state):
        _, rvec, _, _, _, it = state
        return (it < num_iters) & (jnp.vdot(rvec, rvec) > tol2)

    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    state = (x0, b, z0, z0, jnp.vdot(b, z0), jnp.asarray(0))
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x


def point_cam_blocks(
    W: jax.Array, obs_cam: jax.Array, obs_pt: jax.Array,
    num_cameras: int, num_points: int,
) -> jax.Array:
    """(P*C, 3, 6) per-(point, camera) sums of W^T — the observation-indexed
    ingredient of the dense Schur complement.  Separated out so the sharded
    solver can ``psum`` this local segment-sum before the quadratic form
    (S is quadratic in these blocks; summing after would be wrong)."""
    WT = jnp.swapaxes(W, -1, -2)                          # (O, 3, 6)
    idx = obs_pt * num_cameras + obs_cam
    return jax.ops.segment_sum(WT, idx, num_segments=num_points * num_cameras)


def dense_schur_from_blocks(
    U: jax.Array, Vinv: jax.Array, Bflat: jax.Array
) -> jax.Array:
    """Materialize S = U - W V^-1 W' as a dense (6C, 6C) matrix from the
    per-(point, camera) blocks of :func:`point_cam_blocks`."""
    C = U.shape[0]
    P = Vinv.shape[0]
    B = Bflat.reshape(P, C, 3, 6).swapaxes(1, 2).reshape(P, 3, 6 * C)
    VB = jnp.einsum("pij,pja->pia", Vinv, B)
    S = -jnp.einsum("pia,pib->ab", B, VB)
    S = (
        S.reshape(C, 6, C, 6)
        .at[jnp.arange(C), :, jnp.arange(C), :]
        .add(U)
        .reshape(6 * C, 6 * C)
    )
    return S


def solve_schur_dense(op: SchurOperands, reduce_fn=None) -> Tuple[jax.Array, jax.Array]:
    """Exact dense solve of the reduced camera system (small camera counts).

    CG's matvec chain is *sequential* — at the eta floor the solve is up to
    ``cg_iters`` dependent small ops, pure launch latency on TPU.  For C
    cameras the reduced system is only (6C, 6C); materializing it costs one
    segment-sum over observations plus two batched einsums (MXU-shaped), and
    one Cholesky solve replaces the whole chain.  Chosen by
    :func:`dense_gate`; with ``reduce_fn=psum`` the local (pt, cam) block
    sums are reduced BEFORE the quadratic form (S is quadratic in them;
    summing after would be wrong), then the Cholesky runs replicated."""
    red = reduce_fn if reduce_fn is not None else _identity
    C = op.U.shape[0]
    P = op.Vinv.shape[0]
    Bflat = red(point_cam_blocks(op.W, op.obs_cam, op.obs_pt, C, P))
    S = dense_schur_from_blocks(op.U, op.Vinv, Bflat)
    b = schur_rhs(op, reduce_fn=red).reshape(-1)
    cf = jax.scipy.linalg.cho_factor(S, lower=True)
    dc = jax.scipy.linalg.cho_solve(cf, b).reshape(C, 6)
    dp = back_substitute_points(op, dc, reduce_fn=red)
    return dc, dp


# Dense path only below this camera count: the (6C, 6C) factorization is
# cheap and beats the sequential CG chain on launch latency.
DENSE_SCHUR_MAX_CAMS = 32
# ...but only while the materialized per-(point, camera) blocks stay small:
# point_cam_blocks is (P*C, 3, 6) f32 (72 bytes per pair) and
# dense_schur_from_blocks peaks at another (P, 3, 6C).  Above this product
# the dense path multiplies HBM use ~C-fold vs matrix-free PCG, so fall back
# (ADVICE r4: a C<=32 scene with a huge padded point count must not OOM).
DENSE_SCHUR_MAX_CAMPOINTS = 2 ** 21   # ~150 MB of blocks at the cap


def dense_gate(num_cameras: int, num_points: int) -> bool:
    """True when the exact dense Schur path should be used.  THE single gate
    for every solver (ba/lm.py and parallel/sharded_ba.py both call this;
    there is no second copy to drift).  Static by construction: both counts
    are padded array dims, identical on every shard."""
    return (
        num_cameras <= DENSE_SCHUR_MAX_CAMS
        and num_cameras * num_points <= DENSE_SCHUR_MAX_CAMPOINTS
    )


def solve_schur(
    op: SchurOperands, cg_iters: int, tol_rel=0.0, reduce_fn=None
) -> Tuple[jax.Array, jax.Array]:
    """Solve the reduced camera system by block-Jacobi-preconditioned CG,
    back-substitute points. Returns (dc (C, 6), dp (P, 3)) — the LM *descent*
    direction (to subtract).

    The preconditioner is the damped camera block U^-1 (already formed, 6x6
    per camera): the standard Schur-Jacobi choice, which bounds PCG iteration
    growth on long weakly-coupled camera chains where plain CG stalls on the
    low-frequency modes (measured: 1000-camera orbit, reproj converges but
    the trajectory keeps a global bend with plain CG at any fixed count)."""
    red = reduce_fn if reduce_fn is not None else _identity
    b = schur_rhs(op, reduce_fn=red)
    flat_b = b.reshape(-1)
    Uinv = jnp.linalg.inv(op.U)

    def mv(xflat):
        return schur_matvec(op, xflat.reshape(b.shape), reduce_fn=red).reshape(-1)

    def pc(rflat):
        r = rflat.reshape(b.shape)
        return jnp.einsum("cij,cj->ci", Uinv, r).reshape(-1)

    dc = conjugate_gradient(
        mv, flat_b, num_iters=cg_iters, precond=pc, tol_rel=tol_rel
    ).reshape(b.shape)
    dp = back_substitute_points(op, dc, reduce_fn=red)
    return dc, dp
