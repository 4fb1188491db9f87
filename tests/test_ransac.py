import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.geometry.ransac import (
    ransac_fundamental,
    ransac_essential_pose,
    sample_minimal_indices,
)
from tests.conftest import synthetic_scene


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def _outlier_scene(rng, n_out=30, noise=0.3):
    sc = synthetic_scene(rng, num_points=90, noise=noise)
    p1 = sc["p1"].copy()
    p2 = sc["p2"].copy()
    # Corrupt the last n_out correspondences.
    p2[-n_out:] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    sc["p1o"], sc["p2o"] = p1, p2
    sc["inlier_gt"] = np.arange(90) < (90 - n_out)
    return sc


def test_sample_indices_distinct_and_valid(rng):
    mask = np.ones(50, bool)
    mask[10:20] = False
    idx = np.asarray(
        sample_minimal_indices(jax.random.key(0), 50, jnp.asarray(mask), 200, 8)
    )
    assert idx.shape == (200, 8)
    for row in idx:
        assert len(set(row.tolist())) == 8
        assert mask[row].all()


def test_ransac_fundamental_rejects_outliers(rng):
    sc = _outlier_scene(rng)
    res = ransac_fundamental(
        jax.random.key(1), _f32(sc["p1o"]), _f32(sc["p2o"]),
        num_hypotheses=500, threshold=2.0,
    )
    inl = np.asarray(res.inliers)
    # Most ground-truth inliers kept, most outliers rejected.
    assert inl[sc["inlier_gt"]].mean() > 0.8
    assert inl[~sc["inlier_gt"]].mean() < 0.2


def test_ransac_pose_recovers_motion(rng):
    sc = _outlier_scene(rng, n_out=20, noise=0.2)
    res = ransac_essential_pose(
        jax.random.key(2), _f32(sc["p1o"]), _f32(sc["p2o"]),
        _f32(sc["K"]), _f32(sc["K"]),
        num_hypotheses=800, threshold=1.5, min_cheirality_frac=0.9,
    )
    R = np.asarray(res.R)
    t = np.asarray(res.t)
    # Rotation within a few degrees.
    dR = R @ sc["R2"].T
    angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert angle < 3.0
    # Translation direction within a few degrees (scale unobservable).
    t_gt = sc["t2"] / np.linalg.norm(sc["t2"])
    cos = abs(t @ t_gt / np.linalg.norm(t))
    assert cos > 0.99
    assert int(res.num_inliers) > 50


def test_ransac_pose_masked(rng):
    sc = synthetic_scene(rng, num_points=64, noise=0.1)
    # Pad with garbage rows, masked out.
    pad = 32
    p1 = np.concatenate([sc["p1"], np.zeros((pad, 2))])
    p2 = np.concatenate([sc["p2"], np.zeros((pad, 2))])
    mask = np.arange(96) < 64
    res = ransac_essential_pose(
        jax.random.key(3), _f32(p1), _f32(p2), _f32(sc["K"]), _f32(sc["K"]),
        mask=jnp.asarray(mask), num_hypotheses=400, threshold=1.5,
        min_cheirality_frac=0.9,
    )
    inl = np.asarray(res.inliers)
    assert not inl[64:].any()
    dR = np.asarray(res.R) @ sc["R2"].T
    angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert angle < 3.0


def test_ransac_deterministic(rng):
    sc = _outlier_scene(rng)
    a = ransac_fundamental(jax.random.key(7), _f32(sc["p1o"]), _f32(sc["p2o"]),
                           num_hypotheses=300)
    b = ransac_fundamental(jax.random.key(7), _f32(sc["p1o"]), _f32(sc["p2o"]),
                           num_hypotheses=300)
    np.testing.assert_array_equal(np.asarray(a.inliers), np.asarray(b.inliers))


def test_ransac_fundamental_adaptive_matches_fixed(rng):
    from sfmfromscratch_tpu.geometry.ransac import ransac_fundamental_adaptive

    sc = _outlier_scene(rng)
    res = ransac_fundamental_adaptive(
        jax.random.key(11), _f32(sc["p1o"]), _f32(sc["p2o"]),
        max_hypotheses=4096, stage_size=256, threshold=2.0,
    )
    inl = np.asarray(res.inliers)
    assert inl[sc["inlier_gt"]].mean() > 0.8
    assert inl[~sc["inlier_gt"]].mean() < 0.2
    # With 2/3 inliers the stopping rule should fire well before the cap.
    assert int(res.hyps_used) < 4096


def test_ransac_pose_adaptive_recovers_motion(rng):
    from sfmfromscratch_tpu.geometry.ransac import ransac_essential_pose_adaptive

    sc = _outlier_scene(rng, n_out=20, noise=0.2)
    res = ransac_essential_pose_adaptive(
        jax.random.key(12), _f32(sc["p1o"]), _f32(sc["p2o"]),
        _f32(sc["K"]), _f32(sc["K"]),
        max_hypotheses=4096, stage_size=256, threshold=1.5,
        min_cheirality_frac=0.9,
    )
    R = np.asarray(res.R)
    t = np.asarray(res.t)
    dR = R @ sc["R2"].T
    angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert angle < 3.0
    t_gt = sc["t2"] / np.linalg.norm(sc["t2"])
    cos = abs(t @ t_gt / np.linalg.norm(t))
    assert cos > 0.99
    assert int(res.num_inliers) > 50


def test_ransac_pose_adaptive_batch(rng):
    from sfmfromscratch_tpu.geometry.ransac import (
        ransac_essential_pose_adaptive_batch,
    )

    scs = [_outlier_scene(np.random.default_rng(s), n_out=20, noise=0.2)
           for s in (1, 2, 3)]
    p1 = _f32(np.stack([s["p1o"] for s in scs]))
    p2 = _f32(np.stack([s["p2o"] for s in scs]))
    K = _f32(np.stack([s["K"] for s in scs]))
    mask = jnp.ones((3, 90), bool)
    keys = jax.random.split(jax.random.key(13), 3)
    res = ransac_essential_pose_adaptive_batch(
        keys, p1, p2, K, K, mask,
        max_hypotheses=4096, stage_size=256, threshold=1.5,
        min_cheirality_frac=0.9,
    )
    for i, sc in enumerate(scs):
        dR = np.asarray(res.R[i]) @ sc["R2"].T
        angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert angle < 3.0


def test_ransac_adaptive_futility_stop(rng):
    """A pair with no epipolar structure must not burn the full hypothesis
    budget: junk lanes stop after two stages (they would otherwise stall
    every vmapped chunk they share)."""
    from sfmfromscratch_tpu.geometry.ransac import ransac_fundamental_adaptive

    p1 = _f32(rng.uniform(0, 640, (90, 2)))
    p2 = _f32(rng.uniform(0, 480, (90, 2)))   # unrelated points
    res = ransac_fundamental_adaptive(
        jax.random.key(3), p1, p2,
        max_hypotheses=6144, stage_size=512, threshold=1.0,
    )
    assert int(res.hyps_used) <= 1024
