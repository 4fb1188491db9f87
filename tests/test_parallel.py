"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8 — the standard JAX stand-in for a
real TPU slice; same code paths run on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfmfromscratch_tpu.parallel.mesh import make_mesh
from sfmfromscratch_tpu.parallel.sharded_match import tp_match_ratio_test
from sfmfromscratch_tpu.parallel.sharded_ba import bundle_adjust_sharded
from sfmfromscratch_tpu.ops.matcher import match_ratio_test
from sfmfromscratch_tpu.ba.lm import bundle_adjust
from tests.test_ba import _multi_view_problem


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.shape == {"data": 4, "model": 2}
    m1 = make_mesh(2)
    assert m1.shape == {"data": 2, "model": 1}


def test_tp_match_equals_single_device(rng):
    d1 = jnp.asarray(rng.uniform(0, 1, (96, 128)), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0, 1, (128, 128)), jnp.float32)
    mask1 = jnp.asarray(rng.uniform(size=96) > 0.1)
    mask2 = jnp.asarray(rng.uniform(size=128) > 0.1)

    ref = match_ratio_test(d1, d2, mask1, mask2, ratio_threshold=0.85, max_matches=96)
    mesh = make_mesh(8, model_parallel=8, axis_names=("model", "unused"))
    # single-axis mesh: all 8 devices on 'model'
    from jax.sharding import Mesh
    import numpy as _np

    mesh = Mesh(_np.array(jax.devices()).reshape(8), ("model",))
    got = tp_match_ratio_test(mesh, d1, d2, mask1, mask2, ratio_threshold=0.85)

    n_ref = int(np.asarray(ref.mask).sum())
    n_got = int(np.asarray(got.mask).sum())
    assert n_ref == n_got
    ref_set = {tuple(r) for r in np.asarray(ref.indices)[:n_ref]}
    got_set = {tuple(r) for r in np.asarray(got.indices)[:n_got]}
    assert ref_set == got_set
    np.testing.assert_allclose(
        np.sort(np.asarray(ref.confidence)[:n_ref]),
        np.sort(np.asarray(got.confidence)[:n_got]),
        atol=1e-5,
    )


def test_sharded_ba_equals_single_device(rng):
    problem, _, _ = _multi_view_problem(rng, num_cams=5, num_pts=80, perturb=0.02, noise=0.3)
    mesh = make_mesh(8, model_parallel=1)  # data=8
    res_s = bundle_adjust_sharded(problem, mesh, max_iters=12, cg_iters=40, ftol=1e-8)
    res_d = bundle_adjust(problem, max_iters=12, cg_iters=40, ftol=1e-8)
    # Same optimization quality (bitwise equality is not expected: segment-sum
    # order differs across shards in float32).
    assert abs(float(res_s.final_mean_error) - float(res_d.final_mean_error)) < 0.05
    assert float(res_s.final_mean_error) < 1.0
    np.testing.assert_allclose(
        np.asarray(res_s.points), np.asarray(res_d.points), rtol=0.05, atol=0.02
    )


def test_sharded_ba_respects_padding(rng):
    """Observation counts not divisible by the shard count must work."""
    problem, _, _ = _multi_view_problem(rng, num_cams=3, num_pts=41, perturb=0.02)
    assert problem.num_obs % 8 != 0
    mesh = make_mesh(8, model_parallel=1)
    res = bundle_adjust_sharded(problem, mesh, max_iters=6, cg_iters=30)
    assert float(res.final_mean_error) <= float(res.initial_mean_error) + 1e-6


def test_dp_feature_extraction_sharded(rng):
    """Batched frontend under jit with a sharded batch axis: the DP story for
    the match graph's feature stage."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from sfmfromscratch_tpu.ops.harris import detect_harris_keypoints
    import numpy as _np

    mesh = Mesh(_np.array(jax.devices()).reshape(8), ("data",))
    imgs = jnp.asarray(rng.uniform(0, 1, (8, 64, 96)), jnp.float32)
    imgs = jax.device_put(imgs, NamedSharding(mesh, P("data", None, None)))

    @jax.jit
    def batched_detect(images):
        return jax.vmap(
            lambda im: detect_harris_keypoints(
                im, k=64, feature_width=16, nms_ksize=3, gaussian_size=7,
                sigma=3.0, alpha=0.05,
            )
        )(images)

    kps = batched_detect(imgs)
    assert kps.x.shape == (8, 64)
    # Output stays sharded over the batch axis.
    assert not kps.x.is_fully_replicated


@pytest.mark.slow
def test_engine_with_mesh(rng, tmp_path):
    """Full engine on the 8-device CPU mesh: DP feature extraction + sharded BA."""
    from tests.render import render_sequence, write_sequence
    from tests.test_pipeline import _small_config
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    images, K, poses, X = render_sequence(rng, num_views=4, num_points=110)
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)
    mesh = make_mesh(8, model_parallel=1)
    eng = SfmEngine(str(d), 4, config=_small_config(), single_K=K, mesh=mesh)
    assert len(eng.global_poses) == 3
    b, a = eng.errors_before_after_ba
    assert a <= b + 1e-6 and a < 3.0


def test_sharded_selfcal_matches_single_device(rng):
    """Sharded self-calibrating BA (bordered Schur over psum-reduced shards,
    VERDICT round-1 item 7) recovers the same focal scale and quality as the
    single-device ba/selfcal.py solver on the 8-device mesh."""
    from sfmfromscratch_tpu.ba.selfcal import bundle_adjust_selfcal
    from tests.test_ba import _focal_observable_problem

    problem = _focal_observable_problem(rng)
    mesh = make_mesh(8, model_parallel=1)
    res_s, s_sharded = bundle_adjust_sharded(
        problem, mesh, max_iters=30, cg_iters=60, ftol=1e-12, selfcal=True)
    res_1, s_single = bundle_adjust_selfcal(
        problem, max_iters=30, cg_iters=60, ftol=1e-12)
    assert abs(float(s_sharded) - 1 / 1.06) < 0.01
    assert abs(float(s_sharded) - float(s_single)) < 5e-3
    assert abs(float(res_s.final_mean_error) - float(res_1.final_mean_error)) < 0.05
    assert float(res_s.final_mean_error) < 0.35  # the 0.3 px noise floor


@pytest.mark.slow
def test_engine_selfcal_on_mesh(rng, tmp_path):
    """refine_focal no longer warns-and-skips on a mesh: the engine routes it
    through the sharded bordered-Schur solver."""
    from tests.render import render_sequence, write_sequence
    from tests.test_pipeline import _small_config
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    images, K, poses, X = render_sequence(rng, num_views=4, num_points=110)
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)
    mesh = make_mesh(8, model_parallel=1)
    eng = SfmEngine(str(d), 4, config=_small_config(), single_K=K, mesh=mesh,
                    refine_focal=True)
    assert not any("ignored on the mesh" in w for w in eng.warnings)
    assert any("focal self-calibration" in w for w in eng.warnings)
    b, a = eng.errors_before_after_ba
    assert a <= b + 1e-6 and a < 3.0
    # K was fed the true focal; the jointly-estimated scale must stay near 1.
    assert abs(eng.focal_scale - 1.0) < 0.05


def test_sharded_ba_huber_matches_single_device(rng):
    """Robust (Huber IRLS) sharded BA == the single-device robust solver —
    the mesh path must not silently lose the robust loss."""
    problem, _, _ = _multi_view_problem(rng, num_cams=5, num_pts=80,
                                        perturb=0.02, noise=0.3)
    # contaminate a few observations so the robust loss matters
    import numpy as _np
    xy = _np.asarray(problem.obs_xy).copy()
    xy[::37] += 60.0
    problem = problem._replace(obs_xy=jnp.asarray(xy))
    mesh = make_mesh(8, model_parallel=1)
    res_s = bundle_adjust_sharded(problem, mesh, max_iters=12, cg_iters=40,
                                  ftol=1e-8, huber_delta=3.0)
    res_1 = bundle_adjust(problem, max_iters=12, cg_iters=40, ftol=1e-8,
                          huber_delta=3.0)
    assert abs(float(res_s.final_mean_error) - float(res_1.final_mean_error)) < 0.05
    _np.testing.assert_allclose(_np.asarray(res_s.cam_params),
                                _np.asarray(res_1.cam_params), atol=5e-3)
