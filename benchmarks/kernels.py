"""Kernel-level micro-benchmarks: regenerates docs/PERFORMANCE.md's table.

Usage:
    PYTHONPATH=/root/.axon_site:. python benchmarks/kernels.py          # TPU
    JAX_PLATFORMS=cpu python benchmarks/kernels.py                     # CPU

Prints one line per kernel: XLA path vs Pallas/optimized path (median of
``reps`` timed runs after a warm-up call; block_until_ready fenced). BA
additionally reports LM iters/s — the BASELINE.json "BA iters/s per chip"
metric.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# A sitecustomize may pin jax_platforms at the config level (the env var alone
# does not override it); honor an explicit JAX_PLATFORMS=cpu request.
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def timeit(fn, reps=20):
    fn()  # warm-up/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.tree.flatten(r)[0][0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from sfmfromscratch_tpu.ops.harris import harris_response
    from sfmfromscratch_tpu.ops.pallas.harris_kernel import harris_response_pallas
    from sfmfromscratch_tpu.ops.matcher import match_ratio_test
    from sfmfromscratch_tpu.ops.sift import sift_descriptors
    from sfmfromscratch_tpu.ops.pallas.support import pallas_tpu_available
    from sfmfromscratch_tpu.geometry.ransac import ransac_essential_pose
    from sfmfromscratch_tpu.ba.lm import bundle_adjust

    on_tpu = pallas_tpu_available()
    interp = not on_tpu
    # Pallas interpret mode is orders of magnitude slower than Mosaic: on
    # non-TPU backends this is a smoke test, so shrink the workloads.
    N = 2499 if on_tpu else 256
    KP = 2500 if on_tpu else 256
    HYP = 5967 if on_tpu else 512
    reps = 20 if on_tpu else 3
    print(f"backend={jax.default_backend()} pallas_native={on_tpu} "
          f"sizes: match={N} kp={KP} hyp={HYP}", flush=True)
    rng = np.random.default_rng(0)

    # Harris response 360x480
    img = jnp.asarray(rng.uniform(0, 1, (360, 480)), jnp.float32)
    t_xla = timeit(lambda: harris_response(img, 7, 3.0, 0.05), reps)
    t_pal = timeit(lambda: harris_response_pallas(img, 7, 3.0, 0.05, interpret=interp), reps)
    print(f"harris 360x480: xla {t_xla*1e3:.2f} ms | pallas {t_pal*1e3:.2f} ms", flush=True)

    # Top-2 matcher 2499x2499x128
    d1 = jnp.asarray(rng.uniform(0, 1, (N, 128)), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0, 1, (N, 128)), jnp.float32)
    m = jnp.ones(N, bool)
    t_xla = timeit(lambda: match_ratio_test(d1, d2, m, m, ratio_threshold=0.85,
                                            max_matches=N, use_pallas=False), reps)
    t_pal = timeit(lambda: match_ratio_test(d1, d2, m, m, ratio_threshold=0.85,
                                            max_matches=N, use_pallas=on_tpu), reps)
    print(f"matcher {N}^2x128: xla {t_xla*1e3:.2f} ms | pallas {t_pal*1e3:.2f} ms", flush=True)

    # SIFT descriptors: 2500 keypoints on 360x480
    x = jnp.asarray(rng.integers(20, 460, KP), jnp.int32)
    y = jnp.asarray(rng.integers(20, 340, KP), jnp.int32)
    mask = jnp.ones(KP, bool)
    t_xla = timeit(lambda: sift_descriptors(img, x, y, mask, feature_width=16,
                                            rotation_invariant=True), reps)
    t_pal = timeit(lambda: sift_descriptors(img, x, y, mask, feature_width=16,
                                            rotation_invariant=True,
                                            use_pallas=True, interpret=interp), reps)
    print(f"sift {KP} kp: xla {t_xla*1e3:.2f} ms | pallas {t_pal*1e3:.2f} ms", flush=True)

    # Essential RANSAC 5967 hypotheses x 2499 correspondences
    p1 = jnp.asarray(rng.uniform(0, 480, (N, 2)), jnp.float32)
    p2 = p1 + jnp.asarray(rng.normal(0, 2, (N, 2)), jnp.float32)
    Kmat = jnp.asarray([[520.0, 0, 240], [0, 520.0, 180], [0, 0, 1]], jnp.float32)
    key = jax.random.key(0)
    t = timeit(lambda: ransac_essential_pose(
        key, p1, p2, Kmat, Kmat, jnp.ones(N, bool),
        num_hypotheses=HYP, threshold=1.0, min_cheirality_frac=0.75), reps=min(5, reps))
    print(f"essential ransac {HYP}x{N}: {t*1e3:.1f} ms", flush=True)

    # BA 8 cams x 400 pts x 3200 obs: wall + LM iters/s
    from tests.test_ba import _multi_view_problem
    problem, _, _ = _multi_view_problem(
        np.random.default_rng(1), num_cams=8, num_pts=400, perturb=0.05, noise=0.5
    )
    def run_ba():
        return bundle_adjust(problem, max_iters=25, cg_iters=50, ftol=1e-12)
    res = run_ba()
    t = timeit(run_ba, reps=min(5, reps))
    iters = int(res.iterations_used)
    print(f"ba 8cx400p: {t*1e3:.1f} ms, {iters} LM iters -> "
          f"{iters/t:.1f} iters/s "
          f"({float(res.initial_mean_error):.2f}->{float(res.final_mean_error):.2f} px)",
          flush=True)


if __name__ == "__main__":
    main()
