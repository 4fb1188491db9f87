"""Scaling-structure benchmark: sharded BA over 1/2/4/8 virtual devices
(VERDICT round-1 item 8: record a scaling-efficiency curve on the virtual
mesh).

On this box the virtual mesh shares 2 physical cores, so wall-clock speedup
is bounded by the core count regardless of shard count; what the curve
certifies is the COMMUNICATION STRUCTURE: as the observation shards multiply,
the psum-per-matvec Schur pattern must not add superlinear overhead — wall at
N shards should stay flat-to-down on fixed hardware, never up. On a real pod
slice the same programs ride ICI and the per-device work drops N-fold.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    from jax.sharding import Mesh

    from sfmfromscratch_tpu.parallel.sharded_ba import bundle_adjust_sharded
    from tests.test_ba import _multi_view_problem

    rng = np.random.default_rng(3)
    problem, _, _ = _multi_view_problem(
        rng, num_cams=12, num_pts=1500, perturb=0.03, noise=0.4
    )
    print(f"problem: {problem.num_cameras} cams, {problem.num_points} pts, "
          f"{problem.num_obs} obs; devices={len(jax.devices())}", flush=True)

    walls = {}
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        mesh = Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))

        def run():
            return bundle_adjust_sharded(
                problem, mesh, max_iters=10, cg_iters=40, ftol=1e-12
            )

        res = run()  # compile + warm
        t0 = time.perf_counter()
        res = run()
        jax.block_until_ready(res.cam_params)
        np.asarray(res.cam_params)
        walls[n] = time.perf_counter() - t0
        print(f"shards={n}: {walls[n]*1e3:8.1f} ms  "
              f"(err {float(res.initial_mean_error):.2f} -> "
              f"{float(res.final_mean_error):.2f} px, "
              f"{int(res.iterations_used)} LM iters)  "
              f"overhead vs 1-shard: {walls[n]/walls[1]:.2f}x", flush=True)

    t1 = walls[1]
    worst = max(w / t1 for w in walls.values())
    print(f"communication-structure verdict: worst wall ratio vs single shard "
          f"= {worst:.2f}x across {len(walls)} mesh sizes "
          f"({'OK: no superlinear collective overhead' if worst < 1.5 else 'REGRESSION'})",
          flush=True)


if __name__ == "__main__":
    main()
