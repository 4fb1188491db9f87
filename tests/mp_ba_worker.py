"""Worker for the REAL multi-process distributed-BA test (one OS process per
"host"). Spawned by tests/test_multiprocess.py — not collected by pytest.

Each process brings up jax.distributed over a TCP coordinator, exposes 4
virtual CPU devices (8 global across 2 processes), builds the SAME synthetic
BA problem redundantly (SPMD contract), and runs bundle_adjust_sharded over
the global mesh — the collectives cross the process boundary through Gloo,
the CPU stand-in for the ICI/DCN path a TPU pod slice uses (SURVEY.md §5.8).
Rank 0 writes a JSON verdict comparing against the single-device LM solver.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outfile = sys.argv[4]
devs_per_proc = int(sys.argv[5]) if len(sys.argv) > 5 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={devs_per_proc}"
)

import jax

jax.config.update("jax_platforms", "cpu")

from sfmfromscratch_tpu.parallel.mesh import init_distributed

init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import numpy as np
from jax.sharding import Mesh

from sfmfromscratch_tpu.ba.lm import bundle_adjust
from sfmfromscratch_tpu.parallel.sharded_ba import bundle_adjust_sharded
from tests.test_ba import _multi_view_problem

assert jax.process_count() == nproc
assert len(jax.devices()) == devs_per_proc * nproc, jax.devices()

rng = np.random.default_rng(0)
problem, _, _ = _multi_view_problem(
    rng, num_cams=5, num_pts=80, perturb=0.02, noise=0.3
)

mesh = Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("data",))
res = bundle_adjust_sharded(problem, mesh, max_iters=12, cg_iters=40, ftol=1e-8)

# Single-device reference, computed per process on its own local devices.
ref = bundle_adjust(problem, max_iters=12, cg_iters=40, ftol=1e-8)

# Tensor-parallel matching across the process boundary: the descriptor
# database shards over all 8 global devices (4 per process); the top-2 merge's
# all_gather crosses processes.
import jax.numpy as jnp

from sfmfromscratch_tpu.ops.matcher import match_ratio_test
from sfmfromscratch_tpu.parallel.sharded_match import tp_match_ratio_test

rng2 = np.random.default_rng(1)
d1 = jnp.asarray(rng2.uniform(0, 1, (96, 128)), jnp.float32)
d2 = jnp.asarray(rng2.uniform(0, 1, (128, 128)), jnp.float32)
m1 = jnp.asarray(rng2.uniform(size=96) > 0.1)
m2 = jnp.asarray(rng2.uniform(size=128) > 0.1)
mesh_m = Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("model",))
got = tp_match_ratio_test(mesh_m, d1, d2, m1, m2, ratio_threshold=0.85)
refm = match_ratio_test(d1, d2, m1, m2, ratio_threshold=0.85, max_matches=96)
n_got = int(np.asarray(got.mask).sum())
n_ref = int(np.asarray(refm.mask).sum())
match_sets_equal = {tuple(r) for r in np.asarray(got.indices)[:n_got]} == {
    tuple(r) for r in np.asarray(refm.indices)[:n_ref]
}

# Advancing-window map streaming across the process boundary (SURVEY §5.7):
# each "host" holds its own (here: identical, SPMD-built) block store on
# local disk; every window's solve is the SAME psum-reduced sharded BA whose
# collectives just crossed processes above. On a pod this is exactly the
# deployment shape — blocks host-local, solves mesh-global.
import shutil
import tempfile

from sfmfromscratch_tpu.pipeline.streaming import (
    MapBlockStore, stream_bundle_adjust,
)
from tests.test_streaming import _synthetic_map

rng3 = np.random.default_rng(5)
smap, _ = _synthetic_map(rng3, C=48, track_len=10, perturb=0.008)
sroot = tempfile.mkdtemp(prefix=f"mp_stream_{pid}_")
try:
    store = MapBlockStore.build_from_arrays(
        sroot, smap["cam_params"], smap["K"], smap["points"],
        smap["obs_cam"], smap["obs_pt"], smap["obs_xy"], block_cams=8,
    )
    sstats = stream_bundle_adjust(store, window_blocks=3, mesh=mesh,
                                  sweeps=2, max_iters=10, cg_iters=30,
                                  ftol=1e-6)
finally:
    shutil.rmtree(sroot, ignore_errors=True)

verdict = {
    "processes": jax.process_count(),
    "global_devices": len(jax.devices()),
    "tp_match_equal": bool(match_sets_equal and n_got == n_ref),
    "err0_sharded": float(res.initial_mean_error),
    "err1_sharded": float(res.final_mean_error),
    "err1_single": float(ref.final_mean_error),
    "cam_maxdiff": float(
        np.abs(np.asarray(res.cam_params) - np.asarray(ref.cam_params)).max()
    ),
    "stream_err0": sstats.initial_error,
    "stream_err1": sstats.final_error,
    "stream_windows": sstats.windows_run,
    "stream_resident_frac": sstats.peak_resident_obs / max(sstats.total_obs, 1),
}
if pid == 0:
    with open(outfile, "w") as f:
        json.dump(verdict, f)
print(f"proc {pid}: {verdict}", flush=True)
