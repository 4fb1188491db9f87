"""Bundle-adjustment problem container and residual/Jacobian machinery.

The reference packs cameras as Rodrigues 6-vectors plus 3-D points into one
flat scipy parameter vector and evaluates residuals in a Python loop with a
cv2.Rodrigues call per observation (SFM.py:405-464), differentiating by 2-point
finite differences. Here the problem is a pytree of fixed-shape arrays and the
per-observation 2x6 / 2x3 Jacobian blocks come from forward-mode AD through
``so3_exp`` — analytic, batched, on-device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfmfromscratch_tpu.ops.lie import so3_exp


class BAProblem(NamedTuple):
    """Fixed-shape sparse BA problem.

    cam_params: (C, 6) [rvec | t] world-to-camera (reference SFM.py:443-444)
    points:     (P, 3) world points
    K:          (C, 3, 3) per-camera intrinsics (reference K_list)
    obs_cam:    (O,) int32 camera index per observation
    obs_pt:     (O,) int32 point index per observation
    obs_xy:     (O, 2) observed pixels
    obs_w:      (O,) float32 observation weight (0 = padding/invalid)
    cam_fixed:  (C,) bool — cameras frozen during optimization (gauge fixing)
    pt_fixed:   (P,) bool or None — points frozen during optimization.  Used
                by the advancing-window streaming solver (pipeline/streaming.py)
                to hold boundary tracks whose observations are partly outside
                the resident window; their observations still constrain free
                cameras.  None == all points free (the common case; keeps the
                pytree identical to the pre-existing layout).
    """

    cam_params: jax.Array
    points: jax.Array
    K: jax.Array
    obs_cam: jax.Array
    obs_pt: jax.Array
    obs_xy: jax.Array
    obs_w: jax.Array
    cam_fixed: jax.Array
    pt_fixed: Optional[jax.Array] = None

    @property
    def num_cameras(self) -> int:
        return self.cam_params.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_obs(self) -> int:
        return self.obs_cam.shape[0]


def make_problem(
    camera_params: np.ndarray,
    points_3d: np.ndarray,
    camera_indices: np.ndarray,
    point_indices: np.ndarray,
    points_2d: np.ndarray,
    K_list: np.ndarray,
    obs_weights: Optional[np.ndarray] = None,
    cam_fixed: Optional[np.ndarray] = None,
    pt_fixed: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> BAProblem:
    """Build a BAProblem from reference-layout inputs (the tuple produced by
    ``prepare_for_ba``, Runner.py:387-401)."""
    O = len(camera_indices)
    if obs_weights is None:
        obs_weights = np.ones(O, dtype=np.float32)
    C = camera_params.shape[0]
    if cam_fixed is None:
        cam_fixed = np.zeros(C, dtype=bool)
    return BAProblem(
        cam_params=jnp.asarray(camera_params, dtype=dtype),
        points=jnp.asarray(points_3d, dtype=dtype),
        K=jnp.asarray(K_list, dtype=dtype),
        obs_cam=jnp.asarray(camera_indices, dtype=jnp.int32),
        obs_pt=jnp.asarray(point_indices, dtype=jnp.int32),
        obs_xy=jnp.asarray(points_2d, dtype=dtype),
        obs_w=jnp.asarray(obs_weights, dtype=dtype),
        cam_fixed=jnp.asarray(cam_fixed, dtype=bool),
        pt_fixed=(None if pt_fixed is None else jnp.asarray(pt_fixed, bool)),
    )


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_problem(
    problem: BAProblem,
    cam_bucket: int = 8,
    point_bucket: int = 1024,
    obs_bucket: int = 4096,
) -> BAProblem:
    """Pad cameras/points/observations up to bucketed capacities so repeated
    solves reuse one compiled program (XLA recompiles per shape; incremental
    SfM grows the problem every frame). Padded cameras are frozen and
    unobserved; padded observations carry zero weight — both contribute
    nothing (verified by tests/test_ba.py::test_ba_handles_padded_observations).
    """
    import numpy as np

    C, P, O = problem.num_cameras, problem.num_points, problem.num_obs
    Cp = _round_up(max(C, 1), cam_bucket)
    Pp = _round_up(max(P, 1), point_bucket)
    Op = _round_up(max(O, 1), obs_bucket)
    if (Cp, Pp, Op) == (C, P, O):
        return problem

    def pad(arr, n, fill=0.0):
        pad_width = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, pad_width, constant_values=fill)

    eyeK = jnp.broadcast_to(jnp.eye(3, dtype=problem.K.dtype), (Cp - C, 3, 3))
    return BAProblem(
        cam_params=pad(problem.cam_params, Cp),
        points=pad(problem.points, Pp),
        K=jnp.concatenate([problem.K, eyeK], axis=0),
        obs_cam=pad(problem.obs_cam, Op),
        obs_pt=pad(problem.obs_pt, Op),
        obs_xy=pad(problem.obs_xy, Op),
        obs_w=pad(problem.obs_w, Op),
        cam_fixed=jnp.concatenate(
            [problem.cam_fixed, jnp.ones(Cp - C, dtype=bool)]
        ),
        pt_fixed=(
            None if problem.pt_fixed is None
            else jnp.concatenate(
                [problem.pt_fixed, jnp.ones(Pp - P, dtype=bool)]
            )
        ),
    )


def _project_one(cam: jax.Array, X: jax.Array, K: jax.Array) -> jax.Array:
    """Project one point through one camera ([rvec | t] 6-vector).
    Mirrors the reference residual projection (SFM.py:437-440, 448-462)."""
    R = so3_exp(cam[:3])
    p = R @ X + cam[3:]
    h = K @ p
    z = jnp.where(jnp.abs(h[2]) < 1e-12, 1e-12, h[2])
    return h[:2] / z


def project_one_dist(
    cam: jax.Array, X: jax.Array, K: jax.Array, s, k1
) -> jax.Array:
    """Projection with a shared focal scale ``s`` and one radial distortion
    coefficient ``k1`` (normalized coordinates, COLMAP SIMPLE_RADIAL
    convention): x_d = x_n (1 + k1 r^2), pix = s*f*x_d + c. Zero-skew K
    assumed (every K construction path here builds one). With s=1, k1=0 this
    equals `_project_one` up to float reassociation — the self-calibrating
    solver (ba/selfcal.py) is its only consumer."""
    R = so3_exp(cam[:3])
    p = R @ X + cam[3:]
    z = jnp.where(jnp.abs(p[2]) < 1e-12, 1e-12, p[2])
    xn = p[:2] / z
    r2 = jnp.sum(xn * xn)
    xd = xn * (1.0 + k1 * r2)
    f = jnp.stack([K[0, 0], K[1, 1]]) * s
    c = K[:2, 2]
    return f * xd + c


def residuals(problem: BAProblem, cam_params: jax.Array, points: jax.Array) -> jax.Array:
    """(O, 2) weighted reprojection residuals (projected - observed),
    matching the reference's residual convention (SFM.py:460-462)."""
    cams = cam_params[problem.obs_cam]
    Xs = points[problem.obs_pt]
    Ks = problem.K[problem.obs_cam]
    proj = jax.vmap(_project_one)(cams, Xs, Ks)
    return (proj - problem.obs_xy) * problem.obs_w[:, None]


def total_cost(problem: BAProblem, cam_params: jax.Array, points: jax.Array) -> jax.Array:
    r = residuals(problem, cam_params, points)
    return jnp.sum(r * r)


def mean_reprojection_error(
    problem: BAProblem, cam_params: Optional[jax.Array] = None,
    points: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean per-observation pixel error — the metric the reference prints
    before/after BA (Runner.py:311-334)."""
    cam_params = problem.cam_params if cam_params is None else cam_params
    points = problem.points if points is None else points
    r = residuals(problem, cam_params, points)
    w = problem.obs_w
    err = jnp.linalg.norm(r, axis=-1) / jnp.maximum(w, 1e-12)
    err = jnp.where(w > 0, err, 0.0)
    return jnp.sum(err) / jnp.maximum(jnp.sum(w > 0), 1)


def jacobian_blocks(problem: BAProblem, cam_params: jax.Array, points: jax.Array):
    """Per-observation analytic Jacobian blocks.

    Returns (Jc (O, 2, 6), Jp (O, 2, 3), r (O, 2)). Fixed cameras get zero
    camera blocks (their parameters cannot move).

    One fused forward-mode sweep: the residual primal and all 9 Jacobian
    columns (6 camera + 3 point) come from a single vmapped ``jvp`` over the
    concatenated parameter vector — one primal evaluation instead of the
    three a jacfwd-per-block formulation pays (camera jacfwd, point jacfwd,
    separate residual pass).  Inside the LM while_loop this sweep runs every
    iteration, so the saved passes are a direct iters/s win.
    """
    cams = cam_params[problem.obs_cam]
    Xs = points[problem.obs_pt]
    Ks = problem.K[problem.obs_cam]

    def blocks(cam, X, K, xy, w):
        z = jnp.concatenate([cam, X])

        def f(zz):
            return (_project_one(zz[:6], zz[6:], K) - xy) * w

        r_one, cols = jax.vmap(
            lambda tangent: jax.jvp(f, (z,), (tangent,)),
            out_axes=(None, 1),
        )(jnp.eye(9, dtype=z.dtype))
        return cols[:, :6], cols[:, 6:], r_one

    Jc, Jp, r = jax.vmap(blocks)(cams, Xs, Ks, problem.obs_xy, problem.obs_w)
    fixed = problem.cam_fixed[problem.obs_cam]
    Jc = jnp.where(fixed[:, None, None], 0.0, Jc)
    if problem.pt_fixed is not None:
        # Frozen points: zero point blocks => gp = 0, W = 0 per observation,
        # so dp = V^-1 (gp - W' dc) is EXACTLY zero for them in every solver
        # (single-device, sharded, selfcal) without per-solver special cases.
        pfix = problem.pt_fixed[problem.obs_pt]
        Jp = jnp.where(pfix[:, None, None], 0.0, Jp)
    return Jc, Jp, r
