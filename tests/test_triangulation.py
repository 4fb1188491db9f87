import numpy as np
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.geometry.camera import projection_matrix, two_view_reprojection_error
from sfmfromscratch_tpu.geometry.triangulation import (
    triangulate_dlt,
    triangulate_normalized,
    refine_points_gn,
    two_view_depths,
)


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def _projs(scene):
    P1 = projection_matrix(_f32(scene["R1"]), _f32(scene["t1"]), _f32(scene["K"]))
    P2 = projection_matrix(_f32(scene["R2"]), _f32(scene["t2"]), _f32(scene["K"]))
    return P1, P2


def test_dlt_exact(scene):
    P1, P2 = _projs(scene)
    X = np.asarray(triangulate_dlt(_f32(scene["p1"]), _f32(scene["p2"]), P1, P2))
    np.testing.assert_allclose(X, scene["X"], atol=2e-2)


def test_normalized_dlt(scene):
    P1, P2 = _projs(scene)
    X = np.asarray(triangulate_normalized(_f32(scene["p1"]), _f32(scene["p2"]), P1, P2))
    np.testing.assert_allclose(X, scene["X"], atol=5e-2)


def test_gn_refinement_reduces_error(rng):
    from tests.conftest import synthetic_scene

    noisy = synthetic_scene(rng, num_points=48, noise=0.5)
    P1 = projection_matrix(_f32(noisy["R1"]), _f32(noisy["t1"]), _f32(noisy["K"]))
    P2 = projection_matrix(_f32(noisy["R2"]), _f32(noisy["t2"]), _f32(noisy["K"]))
    p1, p2 = _f32(noisy["p1"]), _f32(noisy["p2"])
    X0 = triangulate_dlt(p1, p2, P1, P2)
    err0 = float(two_view_reprojection_error(X0, p1, p2, P1, P2))
    X1 = refine_points_gn(X0, p1, p2, P1, P2, num_iters=5)
    err1 = float(two_view_reprojection_error(X1, p1, p2, P1, P2))
    assert err1 <= err0 + 1e-5


def test_two_view_depths_positive(scene):
    z1, z2 = two_view_depths(
        _f32(scene["R2"]), _f32(scene["t2"]), _f32(scene["p1"]), _f32(scene["p2"]),
        _f32(scene["K"]), _f32(scene["K"]),
    )
    z1, z2 = np.asarray(z1), np.asarray(z2)
    assert (z1 > 0).all() and (z2 > 0).all()
    np.testing.assert_allclose(z1, scene["X"][:, 2], rtol=2e-2)


def test_two_view_depths_negative_behind():
    """Points behind the camera must yield negative depth."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([-1.0, 0.0, 0.0], dtype=np.float32)
    X = np.array([[0.5, 0.2, -5.0]])  # behind both cameras
    c1 = X
    c2 = X @ R.T + t
    p1 = (c1 @ K.T)[:, :2] / (c1 @ K.T)[:, 2:3]
    p2 = (c2 @ K.T)[:, :2] / (c2 @ K.T)[:, 2:3]
    z1, z2 = two_view_depths(_f32(R), _f32(t), _f32(p1), _f32(p2), _f32(K), _f32(K))
    assert float(z1[0]) < 0


def test_matches_reference_triangulate(scene):
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from SFM import CameraPose
    except Exception:
        pytest.skip("reference unavailable")
    finally:
        sys.path.remove("/root/reference")

    P1, P2 = _projs(scene)
    P1n, P2n = np.asarray(P1, dtype=np.float64), np.asarray(P2, dtype=np.float64)
    X_ref = np.array(
        [
            CameraPose.triangulate_point(np.append(scene["p1"][i], 1.0),
                                         np.append(scene["p2"][i], 1.0), P1n, P2n)
            for i in range(16)
        ]
    )
    X_ours = np.asarray(triangulate_dlt(_f32(scene["p1"][:16]), _f32(scene["p2"][:16]), P1, P2))
    np.testing.assert_allclose(X_ours, X_ref, atol=5e-2)
