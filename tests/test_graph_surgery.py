"""Integration tests for the global-SfM view-graph surgery (round-3 additions
that previously had only unit-level coverage):

* planar-degenerate edge replacement (`_fix_planar_degenerate_edges` +
  geometry/homography.py) driven END-TO-END by a rendered one-plane scene,
* the cycle-filter quarantine -> redemption -> residual-ban loop driven by a
  constructed doppelganger view graph that deterministically reproduces the
  observed pathology (good edge convicted, wrong high-weight edge surviving
  as a damped bridge).

Reference contrast: SFM.py:38-103 has neither degeneracy detection nor any
view-graph consistency reasoning — both scenes silently produce wrong poses.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.pipeline.global_sfm import GlobalSfmEngine
from sfmfromscratch_tpu.types import PairGeometry


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra @ Rb.T) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


def _edge_rot_errors(eng, poses):
    """Per-live-edge rotation error (deg) of eng._edge_R vs ground truth."""
    errs = {}
    for e, (i, j) in enumerate(eng._edges):
        if eng._edge_w[e] <= 0:
            continue
        Ri, Rj = poses[i - 1][0], poses[j - 1][0]
        errs[(i, j)] = _rot_err_deg(np.asarray(eng._edge_R[e]), Rj @ Ri.T)
    return errs


# --------------------------------------------------------------------------
# (a) planar-dominant scene end-to-end
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_planar_degenerate_scene_end_to_end(rng, tmp_path, monkeypatch):
    """A scene that is ONE plane: every pair's matches are H-degenerate and
    the 8-point essential pipeline can return a confidently-wrong rotation.
    The engine must detect it and recover the pose from the homography; with
    the fix disabled (monkeypatched away) the same scene must measurably
    degrade — proving the integration layer is load-bearing, not decorative."""
    from tests.render import render_planes, write_sequence
    from tests.test_pipeline import _small_config

    images, K, poses, _ = render_planes(
        rng, num_views=6, orbit_step_deg=4.0, layout="wall")
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)

    eng = GlobalSfmEngine(str(d), 6, config=_small_config(), single_K=K,
                          pair_window=2)
    assert any("planar-degenerate" in w for w in eng.warnings), eng.warnings
    errs = _edge_rot_errors(eng, poses)
    assert errs, "no live edges"
    assert max(errs.values()) < 2.0, errs
    b, a = eng.errors_before_after_ba
    assert a < 2.0

    # contrast run: fix disabled -> H-degenerate E-RANSAC poses leak through
    monkeypatch.setattr(GlobalSfmEngine, "_fix_planar_degenerate_edges",
                        lambda self, *a, **k: None)
    eng0 = GlobalSfmEngine(str(d), 6, config=_small_config(), single_K=K,
                           pair_window=2)
    errs0 = _edge_rot_errors(eng0, poses)
    assert max(errs0.values()) > 2.0 * max(errs.values()), (errs0, errs)


# --------------------------------------------------------------------------
# (b) doppelganger quarantine -> redemption -> ban, deterministically
# --------------------------------------------------------------------------


def _bare_engine(C):
    eng = object.__new__(GlobalSfmEngine)
    eng.max_img = C
    eng.warnings = []
    eng.stage_times = {}
    eng.rot_avg_iters = 64
    eng.trans_avg_iters = 12
    eng._edge_alt = {}
    return eng


def _look_at_pose(c, target):
    z = target - c
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    return R, -R @ c


def _doppel_graph(rng, C, span, doppel, drop_edges=(), w_wrong=200.0,
                  deg=40.0):
    """A window-``span`` view graph over an orbit with ONE doppelganger edge:
    its correspondences (and relative pose) are consistent with the far
    camera rotated ``deg`` about the scene's vertical axis — the repeated
    -facade interpretation — carrying ``w_wrong`` confident inliers vs ~40
    for every honest edge. Good-edge weights are perturbed by +0.1*e so the
    greedy eviction order is deterministic (no score ties)."""
    from scipy.spatial.transform import Rotation

    center = np.array([0.0, 0.0, 7.0])
    poses = []
    for v in range(C):
        a = np.radians(8.0) * v
        c = center + 7.0 * np.array([np.sin(a), 0.0, -np.cos(a)])
        poses.append(_look_at_pose(c, center))

    M = 80
    X = np.stack([
        rng.uniform(-1.6, 1.6, M),
        rng.uniform(-1.2, 1.2, M),
        rng.uniform(5.5, 8.5, M),
    ], axis=1)
    K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1.0]])

    def project(Rt, Xs):
        R, t = Rt
        cam = Xs @ R.T + t
        pix = cam @ K.T
        return pix[:, :2] / pix[:, 2:3]

    eng = _bare_engine(C)
    edges = sorted(
        set((i, i + s) for s in range(1, span + 1) for i in range(1, C + 1 - s))
        - set(drop_edges)
    )
    E = len(edges)
    eng._edges = edges
    eng._edge_R = np.zeros((E, 3, 3))
    eng._edge_t = np.zeros((E, 3))
    w = np.zeros(E)
    eng._edge_inl = {}
    eng.pair_geometry = {}
    R_spin = Rotation.from_rotvec([0.0, np.radians(deg), 0.0]).as_matrix()

    for e, (i, j) in enumerate(edges):
        Ri, ti = poses[i - 1]
        Rj, tj = poses[j - 1]
        if (i, j) == doppel:
            cj = -Rj.T @ tj
            cj_fake = center + R_spin @ (cj - center)
            Rj_fake = Rj @ R_spin.T
            fake = (Rj_fake, -Rj_fake @ cj_fake)
            R_rel = Rj_fake @ Ri.T
            t_rel = fake[1] - R_rel @ ti
            p2 = project(fake, X) + 0.2 * rng.standard_normal((M, 2))
            w[e] = w_wrong
        else:
            R_rel = Rj @ Ri.T
            t_rel = tj - R_rel @ ti
            p2 = project((Rj, tj), X) + 0.2 * rng.standard_normal((M, 2))
            w[e] = 40.0 + 0.1 * e
        t_rel = t_rel / max(np.linalg.norm(t_rel), 1e-12)
        p1 = project((Ri, ti), X) + 0.2 * rng.standard_normal((M, 2))
        eng._edge_R[e] = R_rel
        eng._edge_t[e] = t_rel
        idx = np.arange(M, dtype=np.int32)
        eng.pair_geometry[(i, j)] = PairGeometry(
            p1=jnp.asarray(p1, jnp.float32), p2=jnp.asarray(p2, jnp.float32),
            idx1=jnp.asarray(idx), idx2=jnp.asarray(idx),
            mask=jnp.ones(M, bool), K1=jnp.asarray(K, jnp.float32),
            K2=jnp.asarray(K, jnp.float32),
        )
        eng._edge_inl[(i, j)] = np.ones(M, bool)
    eng._edge_w = w
    return eng, edges, poses


def _assert_clean(eng, edges, poses, doppel):
    ew = {k: eng._edge_w[e] for e, k in enumerate(edges)}
    warns = " | ".join(eng.warnings)
    assert ew[doppel] == 0.0, (warns, ew)
    good = [k for k in edges if k != doppel]
    assert all(ew[k] > 0 for k in good), (warns, ew)
    for v in range(eng.max_img):
        err = _rot_err_deg(
            np.asarray(eng.R_cams[v]) @ np.asarray(eng.R_cams[0]).T,
            poses[v][0] @ poses[0][0].T,
        )
        assert err < 2.0, (v, err, warns)
    return warns


def test_doppelganger_bridge_flip(rng):
    """The heavy-wrong-edge pathology: a 200-inlier 40-deg edge outscores its
    good neighbors in the support-normalized greedy eviction, shreds all five
    good edges it shares triangles with, and survives as the sole damped
    bridge — at which point the rotation average would follow it (measured
    40 deg wrong on every downstream camera before the fix). The
    bridge-vs-casualties hypothesis test must flip: casualties certify each
    other with clean triangles, the bridge certifies nothing, so the
    casualties are restored and the wrong edge dropped."""
    eng, edges, poses = _doppel_graph(rng, C=10, span=3, doppel=(5, 6),
                                      w_wrong=200.0)
    eng._motion_averaging()
    warns = _assert_clean(eng, edges, poses, (5, 6))
    assert "bridge-vs-casualties flip" in warns, warns


def test_doppelganger_redemption_and_ban(rng):
    """The quarantine->redemption loop: edge (5,8)'s ONLY triangle runs
    through the wrong edge (graph thinned by drop_edges), so its median
    residual is maximal and the greedy filter convicts it FIRST; the wrong
    edge falls next. The averaging loop's redemption pass must then restore
    the good casualty — its relative rotation agrees with the average built
    from the verified majority — while the wrong edge stays dead."""
    eng, edges, poses = _doppel_graph(rng, C=10, span=3, doppel=(5, 6),
                                      drop_edges=[(5, 7)], w_wrong=100.0)
    eng._motion_averaging()
    warns = _assert_clean(eng, edges, poses, (5, 6))
    assert "restored" in warns and "casualt" in warns, warns
    assert "(5, 8)" in warns, warns
