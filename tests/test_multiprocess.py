"""REAL multi-process distributed execution (one OS process per "host").

The rest of the suite exercises multi-device code paths on a single-process
virtual 8-device mesh; this test additionally proves the multi-HOST path:
``jax.distributed.initialize`` over a TCP coordinator, a global mesh spanning
two processes, and cross-process collectives (Gloo on CPU — the stand-in for
ICI/DCN on a TPU pod slice, SURVEY.md §5.8). The reference has no distributed
anything (SURVEY.md §2.3); this is the 1→N-host scaling contract of
BASELINE.json config 5.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("nproc,devs_per_proc", [(2, 4), (4, 2)])
def test_multi_process_distributed_ba(tmp_path, nproc, devs_per_proc):
    """2 processes x 4 devices and 4 processes x 2 devices (VERDICT round-1
    item 8: widen beyond N=2) — 8 global devices either way, so the same
    sharded programs run with collectives crossing 1 or 3 process
    boundaries."""
    out = tmp_path / "verdict.json"
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out of workers
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    worker = os.path.join(REPO, "tests", "mp_ba_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port), str(out),
             str(devs_per_proc)],
            env=env, cwd=REPO,
        )
        for i in range(nproc)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    assert codes == [0] * nproc

    v = json.loads(out.read_text())
    assert v["processes"] == nproc
    assert v["global_devices"] == nproc * devs_per_proc
    # TP matching across the process boundary equals the single-device matcher.
    assert v["tp_match_equal"]
    # Sharded solve converges and agrees with the single-device LM.
    assert v["err1_sharded"] < 0.5
    assert abs(v["err1_sharded"] - v["err1_single"]) < 0.05
    assert v["cam_maxdiff"] < 5e-3
    # Advancing-window streaming BA across the process boundary (SURVEY §5.7):
    # converges to the noise floor with a bounded resident window.
    assert v["stream_err1"] < min(0.6, v["stream_err0"])
    assert v["stream_windows"] >= 2
    assert v["stream_resident_frac"] < 0.85


@pytest.mark.slow
def test_host_sharded_match_graph(tmp_path):
    """Two processes each compute HALF the match graph into a shared pair
    cache (no coordinator — one atomic file per pair); a subsequent engine run
    resumes with the complete graph and reconstructs without re-matching."""
    import numpy as np

    from tests.render import render_sequence, write_sequence
    from tests.test_pipeline import _small_config
    from sfmfromscratch_tpu.pipeline.incremental import SfmEngine

    rng = np.random.default_rng(42)
    images, K, poses, X = render_sequence(rng, num_views=4, num_points=110)
    d = tmp_path / "seq"
    d.mkdir()
    write_sequence(str(d), images)
    np.save(str(d / "K.npy"), K)
    cache = str(tmp_path / "paircache")

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "mp_match_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(d), cache, "4"],
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    assert [p.wait(timeout=600) for p in procs] == [0, 0]

    n_pairs = 3 + 2  # window=2 over 4 images: (1,2)(2,3)(3,4)(1,3)(2,4)
    assert len(os.listdir(cache)) == n_pairs

    eng = SfmEngine(str(d), 4, config=_small_config(), single_K=K,
                    output_dir=str(tmp_path / "out"), pair_cache_dir=cache,
                    pair_window=2)
    assert any(f"resumed {n_pairs}/{n_pairs}" in w for w in eng.warnings)
    assert eng.errors_before_after_ba[1] < 3.0
