"""Post-chain pose refresh by motion averaging — de-bending the PnP chain.

The incremental chain (reference Runner.py:221-287 made batched) drifts on
low-parallax orbit trajectories: each PnP registers against structure built
from the previous (already slightly bent) poses, the bend accumulates as a
low-frequency mode, and the final global BA CONVERGES INSIDE the bent basin —
measured round 5 on a 47-view 0.8 deg/view orbit: 25.17% ATE that neither
windowed local BA (24.3-25.6% across window configs, reproj improves but the
frozen boundaries lock the bend in) nor 300 tight LM iterations (identical
25.17% / 0.741 px — a true local minimum) can remove.  Escaping the basin
needs RE-INITIALIZATION from measurements that never passed through the
chain: two-view epipolar geometry.

The expensive way is the global pipeline (per-edge essential RANSAC: the
accuracy path, ATE 0.12% on the same scene, but ~100x the chain's wall).
This module is the cheap way, exploiting a chain by-product: the map's TRACKS
are already outlier-filtered correspondences.  For every frame pair within a
track's span, the co-observed track observations form a clean correspondence
set, so relative poses come from direct batched 8-point + Sampson GN — no
hypothesis sampling — and the existing averaging stack does the rest:

1. collect per-edge correspondences from ``map.observations()`` (vectorized
   ``searchsorted`` join on (track, frame) keys — no per-track Python loop),
2. ONE jitted program: batched normalized 8-point F -> E -> decomposition,
   cheirality candidate selection, batched Sampson GN refinement,
3. chordal rotation init + robust IRLS rotation averaging
   (geometry/averaging.py) seeded by the chain rotations,
4. per-edge baseline scales from MEASURED two-view depth ratios along shared
   tracks (solve_edge_scales: a Huber-IRLS group-consistency CG in log-scale
   space) — NOT from the chain's centers, whose local baselines are
   scale-drifted garbage in this regime (measured p90/p10 of
   chain-baseline/GT-baseline = 388x on the orbit scene),
5. translation averaging seeded from a spanning WALK over the measured
   scaled edges (init-from-the-bent-chain leaves the low-frequency mode
   uncorrected even with ground-truth scales — measured),
6. re-triangulate all tracks under the refreshed poses; the engine's final
   global BA then polishes inside the CORRECT basin.

Chip-measured on the 47-view 0.8 deg/view orbit (docs/PERFORMANCE.md round-5
section): chain 24.75% ATE -> 0.67% after refresh -> 0.57% after final BA
(reproj 0.16 px), refresh cost ~0.4 s warm on top of the 1.5 s chain —
vs the global engine's 0.12% at ~100x the chain wall.  Enabled with
``SfmEngine(..., chain_refresh="averaging")``.

Scope (measured, not assumed): this is an ORBIT/loop-drift remedy, not a
universal default.  On a forward-dolly scene where the chain is already
near-optimal, the refresh re-initializes from noisier span-limited two-view
measurements and lands marginally WORSE (bench-style 10-view forward scene:
ATE 0.57% plain vs 1.54% refreshed, ~2x wall) — leave it off for
forward/exploratory trajectories, or use the global engine when trajectory
class is unknown.
"""

from __future__ import annotations

import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfmfromscratch_tpu.geometry.averaging import (
    chain_initial_centers,
    chordal_rotation_init,
    rotation_averaging,
    translation_averaging,
)
from sfmfromscratch_tpu.geometry.epipolar import (
    eight_point_fundamental,
    essential_from_fundamental,
)
from sfmfromscratch_tpu.geometry.triangulation import (
    triangulate_multiview,
    two_view_depths,
)
from sfmfromscratch_tpu.geometry.two_view import refine_relative_pose
from sfmfromscratch_tpu.ops.lie import so3_exp, so3_log
from sfmfromscratch_tpu.ops.smallsvd import decompose_essential
from sfmfromscratch_tpu.utils.precision import mm_f32


def _round_up(n: int, m: int) -> int:
    return ((max(n, 1) + m - 1) // m) * m


def collect_edge_correspondences(
    frames: np.ndarray, tracks: np.ndarray, xy: np.ndarray,
    num_cams: int, max_span: int, cap: int, min_corr: int,
):
    """(edge_i, edge_j, p1, p2, mask, tid): co-observed track coordinates (and
    their track ids, for the scale ratio graph) for every frame pair
    (f, f+s), s in [1, max_span], capped at ``cap`` points/edge.

    Vectorized join: observations keyed by track*C+frame are sorted once; for
    each span s, a ``searchsorted`` of key+s finds the partner observation of
    the same track s frames later."""
    key = tracks.astype(np.int64) * num_cams + frames.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    xy_s = xy[order]
    frames_s = frames[order]

    tracks_s = tracks[order]

    e_i, e_j, e_p1, e_p2, e_t = [], [], [], [], []
    for s in range(1, max_span + 1):
        want = key_s + s
        pos = np.searchsorted(key_s, want)
        pos_c = np.clip(pos, 0, len(key_s) - 1)
        # partner must be the same track s frames later (key arithmetic can
        # only cross a track boundary if frame+s >= C, which the key modulus
        # excludes by construction when frame+s < num_cams)
        hit = (key_s[pos_c] == want) & (frames_s + s < num_cams)
        if not hit.any():
            continue
        o1 = np.nonzero(hit)[0]
        o2 = pos_c[o1]
        e_i.append(frames_s[o1])
        e_j.append(frames_s[o1] + s)
        e_p1.append(xy_s[o1])
        e_p2.append(xy_s[o2])
        e_t.append(tracks_s[o1])

    if not e_i:
        z = np.zeros(0, np.int32)
        return z, z, np.zeros((0, cap, 2), np.float32), \
            np.zeros((0, cap, 2), np.float32), np.zeros((0, cap), bool), \
            np.full((0, cap), -1, np.int64)

    fi = np.concatenate(e_i)
    fj = np.concatenate(e_j)
    P1 = np.concatenate(e_p1)
    P2 = np.concatenate(e_p2)
    Tid = np.concatenate(e_t)

    eid = fi.astype(np.int64) * (max_span + 1) + (fj - fi)
    order = np.argsort(eid, kind="stable")
    eid_s = eid[order]
    uniq, starts, counts = np.unique(eid_s, return_index=True,
                                     return_counts=True)
    keep = counts >= min_corr
    uniq, starts, counts = uniq[keep], starts[keep], counts[keep]
    E = len(uniq)
    p1 = np.zeros((E, cap, 2), np.float32)
    p2 = np.zeros((E, cap, 2), np.float32)
    mask = np.zeros((E, cap), bool)
    tid = np.full((E, cap), -1, np.int64)
    for e in range(E):
        sl = order[starts[e]: starts[e] + min(counts[e], cap)]
        n = len(sl)
        p1[e, :n] = P1[sl]
        p2[e, :n] = P2[sl]
        tid[e, :n] = Tid[sl]
        mask[e, :n] = True
    edge_i = (uniq // (max_span + 1)).astype(np.int32)
    edge_j = (edge_i + (uniq % (max_span + 1))).astype(np.int32)
    return edge_i, edge_j, p1, p2, mask, tid


@functools.partial(jax.jit, static_argnames=("gn_iters",))
@mm_f32
def _edge_poses(p1, p2, mask, K1, K2, gn_iters: int = 8):
    """Batched two-view relative pose per edge from PRE-FILTERED (track)
    correspondences: 8-point F on all points -> E -> cheirality-selected
    candidate -> Sampson GN.  Returns (R_rel (E,3,3) with R_ij = R_j R_i^T,
    t_rel (E,3) unit, rms (E,), n (E,))."""
    m = mask
    F = eight_point_fundamental(p1, p2, m)
    E_ = essential_from_fundamental(F, K1, K2)
    R1, R2, t = decompose_essential(E_)
    Rc = jnp.stack([R1, R1, R2, R2], axis=1)           # (E, 4, 3, 3)
    tc = jnp.stack([t, -t, t, -t], axis=1)             # (E, 4, 3)

    z1, z2 = jax.vmap(two_view_depths)(Rc, tc, p1, p2, K1, K2)  # (E, 4, P)
    front = (z1 > 1e-6) & (z2 > 1e-6) & m[:, None, :]
    cnt = jnp.sum(front, axis=-1)                       # (E, 4)
    best = jnp.argmax(cnt, axis=-1)
    R0 = jnp.take_along_axis(
        Rc, best[:, None, None, None], axis=1
    )[:, 0]
    t0 = jnp.take_along_axis(tc, best[:, None, None], axis=1)[:, 0]
    R, tdir, rms = refine_relative_pose(R0, t0, p1, p2, K1, K2, m,
                                        num_iters=gn_iters)
    # Unit-baseline depths at the refined pose: the raw measurements the
    # scale ratio graph consumes (lam_e * z_e = true depth).
    z1r, z2r = jax.vmap(two_view_depths)(R, tdir, p1, p2, K1, K2)
    return R, tdir, rms, jnp.sum(m, axis=-1), z1r, z2r


def solve_edge_scales(
    edge_i: np.ndarray, edge_j: np.ndarray, tid: np.ndarray,
    mask: np.ndarray, z1: np.ndarray, z2: np.ndarray,
    lam_init: np.ndarray,
) -> np.ndarray:
    """Per-edge baseline scales from two-view depth ratios — WITHOUT touching
    the (possibly scale-drifted) chain structure.

    A track seen from camera m through edges e1, e2 at unit-baseline depths
    z^(e1), z^(e2) pins the ratio: lam_e1 z^(e1) = lam_e2 z^(e2).  In
    x = log lam this is a group-consistency least squares — every (camera,
    track) group wants x_e + log z equal across its member edges:

        min_x  sum_g sum_{f in g} ( x_{e(f)} + logz_f - mean_g(x + logz) )^2

    whose Hessian is a PSD graph Laplacian over edges (null space =
    constants). Solved by CG with segment-sums — information propagates
    globally in O(sqrt(cond)) iterations, unlike Jacobi/ALS smoothing which
    moves one graph hop per sweep and never absorbs low-frequency drift (the
    exact failure mode the bent-chain scales have; measured: chain-center
    scales leave the orbit at 22.7% ATE where ground-truth scales reach
    0.45% — this solver recovers the measured scales).  The gauge constant
    is set so mean(log lam) matches ``lam_init`` (any constant is
    ATE-equivalent; this keeps the map's scale near the chain's)."""
    E, cap = tid.shape
    # Flat membership list: side i uses z1, side j uses z2.
    eidx = np.tile(np.arange(E, dtype=np.int64)[:, None], (1, cap))
    gi = edge_i[:, None].astype(np.int64) * (tid.max() + 2) + tid
    gj = edge_j[:, None].astype(np.int64) * (tid.max() + 2) + tid
    z_ok1 = mask & (z1 > 1e-4) & np.isfinite(z1)
    z_ok2 = mask & (z2 > 1e-4) & np.isfinite(z2)
    eidx_f = np.concatenate([eidx[z_ok1], eidx[z_ok2]])
    g_f = np.concatenate([gi[z_ok1], gj[z_ok2]])
    logz_f = np.concatenate([np.log(z1[z_ok1]), np.log(z2[z_ok2])])
    # Factorize groups; only groups with >=2 members constrain anything.
    _, g_f = np.unique(g_f, return_inverse=True)
    G = int(g_f.max()) + 1 if len(g_f) else 0
    if G == 0:
        return lam_init
    lam = _solve_scales_cg(
        jnp.asarray(eidx_f, jnp.int32), jnp.asarray(g_f, jnp.int32),
        jnp.asarray(logz_f, jnp.float32), E, G,
    )
    x = np.asarray(jax.device_get(lam), np.float64)
    x = x - x.mean() + np.log(np.maximum(lam_init, 1e-9)).mean()
    out = np.exp(x).astype(np.float32)
    # An edge with NO usable depth measurement (every z failed the
    # positivity/finiteness filter — near-zero-parallax pair) sits in the
    # solve's null space and would land at the scene-MEAN scale, an
    # arbitrary constraint for exactly the short-baseline edges this
    # happens to.  Fall back to that edge's init scale instead.
    nconstr = np.bincount(eidx_f, minlength=E)
    out[nconstr == 0] = np.asarray(lam_init, np.float32)[nconstr == 0]
    return out


@functools.partial(jax.jit, static_argnames=("E", "G", "irls_rounds"))
@mm_f32
def _solve_scales_cg(eidx, gidx, logz, E: int, G: int, cg_iters: int = 400,
                     irls_rounds: int = 3):
    """Weighted group-consistency LS by CG, with Huber IRLS outer rounds:
    low-parallax depths are heavy-tailed (z ~ 1/sin(parallax) blows up on
    near-degenerate correspondences), and a handful of wild log-depths chained
    through shared tracks sends a plain L2 solve to infinity (observed:
    exp-overflow scales on the 0.8 deg orbit).  The weighted group mean keeps
    the cross-term cancellation, so the gradient stays a plain segment-sum."""

    def solve_weighted(wf, x0):
        sw_g = jnp.maximum(
            jax.ops.segment_sum(wf, gidx, num_segments=G), 1e-9
        )

        def op(x, z):
            s = x[eidx] + z
            mu = jax.ops.segment_sum(wf * s, gidx, num_segments=G) / sw_g
            r = s - mu[gidx]
            return jax.ops.segment_sum(wf * r, eidx, num_segments=E)

        b = -op(jnp.zeros(E, logz.dtype), logz)
        b = b - jnp.mean(b)

        def hvp(v):
            h = op(v, jnp.zeros_like(logz))
            return h - jnp.mean(h)      # keep CG out of the constant null space

        bb = jnp.vdot(b, b)

        def body(state):
            x, rv, p, rs, it = state
            Ap = hvp(p)
            denom = jnp.vdot(p, Ap)
            # A degenerate search direction (p drifting into the Laplacian's
            # null space once the range-space part has converged to f32
            # noise) must FREEZE the iterate, not divide by ~0 and explode.
            ok = denom > 1e-12 * jnp.maximum(jnp.vdot(p, p), 1e-20)
            alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0), 0.0)
            x = x + alpha * p
            rv = rv - alpha * Ap
            rs_new = jnp.vdot(rv, rv)
            beta = jnp.where(ok, rs_new / jnp.where(rs < 1e-20, 1e-20, rs), 0.0)
            return x, rv, rv + beta * p, rs_new, it + 1

        def cond(state):
            _, rv, _, _, it = state
            return (it < cg_iters) & (jnp.vdot(rv, rv) > 1e-10 * bb)

        r0 = b - hvp(x0)
        state = (x0, r0, r0, jnp.vdot(r0, r0), jnp.asarray(0))
        x, *_ = jax.lax.while_loop(cond, body, state)
        return x

    x = solve_weighted(jnp.ones_like(logz), jnp.zeros(E, logz.dtype))
    for _ in range(irls_rounds):
        s = x[eidx] + logz
        sw_g = jnp.maximum(
            jax.ops.segment_sum(jnp.ones_like(logz), gidx, num_segments=G),
            1.0,
        )
        mu = jax.ops.segment_sum(s, gidx, num_segments=G) / sw_g
        r = jnp.abs(s - mu[gidx])
        mad = jnp.median(r)
        delta = jnp.maximum(2.0 * 1.4826 * mad, 0.05)
        wf = jnp.minimum(1.0, delta / jnp.maximum(r, 1e-9))
        x = solve_weighted(wf, x)
    return x


def _average_poses(R_rel, edge_i, edge_j, w, R_init, lam, t_rel,
                   num_cameras: int):
    """Rotation + translation averaging given per-edge measurements; returns
    (rvecs (C,3), ts (C,3)) in the engine's world-to-camera convention.

    The translation init is a spanning WALK over the measured scaled edges
    (chain_initial_centers), NOT the chain's own centers: the bent chain
    needs a low-frequency correction the 12x64-CG IRLS cannot deliver from
    that basin (measured at C=46: init-from-chain leaves ATE at 25.7% even
    with ground-truth scales; init-from-walk converges) — the same reason
    the global engine seeds from a walk (pipeline/global_sfm.py)."""
    C = num_cameras
    R0 = chordal_rotation_init(
        R_rel, edge_i, edge_j, R_init, edge_w=w,
        num_cameras=C, cg_iters=min(max(128, 2 * C), 4096),
    )
    R = rotation_averaging(
        R_rel, edge_i, edge_j, R0, edge_w=w, num_cameras=C, eps_final=0.02,
    )
    Rj = R[edge_j]
    u = jnp.einsum("eji,ej->ei", Rj, t_rel)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-9)
    su = u * lam[:, None]
    nz = np.asarray(jax.device_get(w)) > 1e-3
    c0 = chain_initial_centers(
        jnp.asarray(np.asarray(jax.device_get(su))[nz], jnp.float32),
        jnp.asarray(np.asarray(jax.device_get(edge_i))[nz]),
        jnp.asarray(np.asarray(jax.device_get(edge_j))[nz]), C,
    )
    c = translation_averaging(
        u, edge_i, edge_j, c0, edge_w=w, num_cameras=C, edge_s=lam,
    )
    rvecs = jax.vmap(so3_log)(R)
    ts = -jnp.einsum("cij,cj->ci", R, c)
    return rvecs, ts, R, c


def averaging_refresh(
    eng, max_span: int = 6, cap: int = 192, min_corr: int = 24,
) -> None:
    """Refresh ``eng``'s chain poses by motion averaging over the map's own
    track correspondences, then re-triangulate.  Mutates ``eng.global_poses``
    and the map's points; the caller runs the final global BA afterwards."""
    t0 = time.time()
    frames, tracks, xy = eng.map.observations()
    C = len(eng.global_poses)
    if C < 3 or len(frames) == 0:
        return
    edge_i, edge_j, p1, p2, mask, tid = collect_edge_correspondences(
        np.asarray(frames), np.asarray(tracks), np.asarray(xy, np.float64),
        C, max_span, cap, min_corr,
    )
    E = len(edge_i)
    if E < C - 1:
        eng.warnings.append(
            f"chain_refresh: only {E} usable edges for {C} cameras; skipped"
        )
        return
    # Connectivity guard: E >= C-1 does NOT imply connected (a blurred frame
    # boundary can leave dense edges on both sides and none across).  A cut
    # component would get a free gauge from the averaging Laplacian and the
    # refresh would overwrite a valid chain with two inconsistent fragments —
    # keep the chain instead.
    parent = np.arange(C)

    def _find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edge_i, edge_j):
        parent[_find(a)] = _find(b)
    if len({_find(c) for c in range(C)}) > 1:
        eng.warnings.append(
            "chain_refresh: track-derived edge graph is disconnected; "
            "keeping the chain solution"
        )
        return

    Ks = np.stack([np.asarray(K, np.float64) for K in eng.global_K])
    K1 = jnp.asarray(Ks[edge_i], jnp.float32)
    K2 = jnp.asarray(Ks[edge_j], jnp.float32)
    R_rel, t_rel, rms, n, z1, z2 = _edge_poses(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(mask), K1, K2
    )

    # Edge weights: support-weighted, Sampson-rms damped.
    n_np, rms_np = jax.device_get((n, rms))
    w = np.sqrt(np.maximum(n_np.astype(np.float64), 1.0) / cap)
    w = w / (1.0 + np.asarray(rms_np, np.float64))
    w = (w / max(w.max(), 1e-9)).astype(np.float32)

    # Chain state as the averaging init / gauge anchor.
    rv = jnp.asarray(np.stack([r for r, _ in eng.global_poses]), jnp.float32)
    tv = np.stack([t for _, t in eng.global_poses])
    R_chain = jax.vmap(so3_exp)(rv)
    c_chain = -np.einsum(
        "cij,ci->cj", np.asarray(jax.device_get(R_chain), np.float64), tv
    )
    lam_chain = np.maximum(
        np.linalg.norm(c_chain[edge_i] - c_chain[edge_j], axis=1), 1e-6
    )
    # Per-edge baseline scales from MEASURED two-view depth ratios, not the
    # chain's centers: the chain's scale drift is exactly what must not leak
    # back in (measured on the 47-view 0.8 deg orbit: chain-center scales
    # leave ATE at 22.7%, ratio-graph scales reach <1%).
    z1_np, z2_np = jax.device_get((z1, z2))
    lam = solve_edge_scales(
        edge_i, edge_j, tid, mask, np.asarray(z1_np), np.asarray(z2_np),
        lam_chain,
    )

    rvecs, ts, R, c = _average_poses(
        R_rel, jnp.asarray(edge_i), jnp.asarray(edge_j), jnp.asarray(w),
        R_chain, jnp.asarray(lam), t_rel, num_cameras=C,
    )
    rvecs_np, ts_np, R_np = jax.device_get((rvecs, ts, R))
    eng.global_poses = [
        (np.asarray(rvecs_np[i], np.float64), np.asarray(ts_np[i], np.float64))
        for i in range(C)
    ]

    # Re-triangulate every track under the refreshed poses (bucketed padding
    # like the global engine => repeated solves share a compiled program).
    T = eng.map.num_tracks
    P_all = np.einsum(
        "cij,cjk->cik", Ks,
        np.concatenate([np.asarray(R_np, np.float64),
                        np.stack([t for _, t in eng.global_poses])[:, :, None]],
                       axis=2),
    )
    O = len(frames)
    Ob = _round_up(O, 4096)
    Tb = _round_up(T, 1024)
    obs_cam = np.zeros(Ob, np.int32); obs_cam[:O] = frames
    obs_pt = np.full(Ob, Tb - 1, np.int32); obs_pt[:O] = tracks
    obs_xy = np.zeros((Ob, 2), np.float32); obs_xy[:O] = xy
    ww = np.zeros(Ob, np.float32); ww[:O] = 1.0
    X, _nobs = _triangulate_jit(
        jnp.asarray(P_all, jnp.float32), jnp.asarray(obs_cam),
        jnp.asarray(obs_pt), jnp.asarray(obs_xy), num_points=Tb,
        obs_w=jnp.asarray(ww), gn_iters=8,
    )
    eng.map.update_points(np.asarray(jax.device_get(X), np.float64)[:T])
    eng.warnings.append(
        f"chain_refresh: averaged {E} track-derived edges over {C} cameras"
    )
    eng.stage_times["chain_refresh"] = time.time() - t0


_triangulate_jit = jax.jit(
    mm_f32(triangulate_multiview), static_argnames=("num_points", "gn_iters")
)
