import numpy as np
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.geometry.epipolar import (
    hartley_normalize,
    eight_point_fundamental,
    epipolar_distances,
    essential_from_fundamental,
)
from sfmfromscratch_tpu.ops.smallsvd import decompose_essential
from tests.conftest import synthetic_scene


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def test_hartley_normalize_properties(rng):
    pts = rng.uniform(0, 500, (100, 2))
    pn, T = hartley_normalize(_f32(pts))
    pn = np.asarray(pn)
    assert pn.shape == (100, 3)
    # float32 with coords up to 500 => ~1e-2 absolute slack
    np.testing.assert_allclose(pn[:, :2].mean(axis=0), 0.0, atol=1e-2)
    mean_radius = np.linalg.norm(pn[:, :2], axis=1).mean()
    np.testing.assert_allclose(mean_radius, np.sqrt(2.0), atol=1e-3)
    # T actually maps the homogeneous points.
    ph = np.hstack([pts, np.ones((100, 1))])
    np.testing.assert_allclose(ph @ np.asarray(T).T, pn, atol=1e-2)


def test_eight_point_epipolar_constraint(scene):
    F = eight_point_fundamental(_f32(scene["p1"][:8]), _f32(scene["p2"][:8]))
    F = np.asarray(F, dtype=np.float64)
    # Epipolar distance (pixels) ~0 on the sample points themselves...
    d8 = np.asarray(epipolar_distances(_f32(F), _f32(scene["p1"][:8]), _f32(scene["p2"][:8])))
    assert d8.max() < 0.5  # float32 eigh(A^T A) residual
    # ...and small on held-out noise-free points.
    d = np.asarray(epipolar_distances(_f32(F), _f32(scene["p1"]), _f32(scene["p2"])))
    assert np.median(d) < 0.5


def test_eight_point_batched(scene):
    p1 = _f32(np.stack([scene["p1"][:8], scene["p1"][8:16]]))
    p2 = _f32(np.stack([scene["p2"][:8], scene["p2"][8:16]]))
    F = eight_point_fundamental(p1, p2)
    assert F.shape == (2, 3, 3)
    d0 = np.asarray(epipolar_distances(F[0], _f32(scene["p1"]), _f32(scene["p2"])))
    assert np.median(d0) < 1.0


def test_eight_point_masked_equals_subset(scene):
    """A masked 16-point call with 8 valid points must equal the plain 8-point call."""
    p1_full = np.concatenate([scene["p1"][:8], np.full((8, 2), 1e6)])
    p2_full = np.concatenate([scene["p2"][:8], np.full((8, 2), 1e6)])
    mask = np.array([True] * 8 + [False] * 8)
    F_masked = np.asarray(
        eight_point_fundamental(_f32(p1_full), _f32(p2_full), jnp.asarray(mask))
    )
    F_plain = np.asarray(eight_point_fundamental(_f32(scene["p1"][:8]), _f32(scene["p2"][:8])))
    # F defined up to scale/sign: compare normalized.
    a = F_masked / np.linalg.norm(F_masked)
    b = F_plain / np.linalg.norm(F_plain)
    err = min(np.abs(a - b).max(), np.abs(a + b).max())
    assert err < 1e-3


def test_essential_decomposition_recovers_pose(scene):
    # Ground-truth E from known pose: E = [t]x R
    R, t = scene["R2"], scene["t2"]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    R1c, R2c, tc = decompose_essential(_f32(E))
    R1c, R2c, tc = np.asarray(R1c), np.asarray(R2c), np.asarray(tc)
    t_unit = t / np.linalg.norm(t)
    assert (
        np.allclose(R1c, R, atol=1e-4)
        or np.allclose(R2c, R, atol=1e-4)
    )
    assert np.allclose(np.abs(tc @ t_unit), 1.0, atol=1e-4)


def test_rank2(scene):
    F = np.asarray(
        eight_point_fundamental(_f32(scene["p1"][:12]), _f32(scene["p2"][:12])),
        dtype=np.float64,
    )
    s = np.linalg.svd(F, compute_uv=False)
    assert s[2] < 1e-5 * s[0]


def test_matches_reference_eight_point(scene):
    """Golden parity: the same 8 correspondences through the reference's
    _compute_fundamental_matrix (SFM.py:190-236) give the same F up to scale."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from SFM import CameraPose
    except Exception:
        pytest.skip("reference unavailable")
    finally:
        sys.path.remove("/root/reference")

    p1, p2 = scene["p1"][:8], scene["p2"][:8]
    F_ref = CameraPose._compute_fundamental_matrix(p1, p2)
    F_ours = np.asarray(
        eight_point_fundamental(jnp.asarray(p1, dtype=jnp.float64),
                                jnp.asarray(p2, dtype=jnp.float64))
        if False
        else eight_point_fundamental(_f32(p1), _f32(p2)),
        dtype=np.float64,
    )
    a = F_ref / np.linalg.norm(F_ref)
    b = F_ours / np.linalg.norm(F_ours)
    err = min(np.abs(a - b).max(), np.abs(a + b).max())
    assert err < 5e-3
