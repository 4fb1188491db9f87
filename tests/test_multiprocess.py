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


def test_two_process_distributed_ba(tmp_path):
    out = tmp_path / "verdict.json"
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out of workers
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    worker = os.path.join(REPO, "tests", "mp_ba_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(out)],
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    assert codes == [0, 0]

    v = json.loads(out.read_text())
    assert v["processes"] == 2
    assert v["global_devices"] == 8
    # TP matching across the process boundary equals the single-device matcher.
    assert v["tp_match_equal"]
    # Sharded solve converges and agrees with the single-device LM.
    assert v["err1_sharded"] < 0.5
    assert abs(v["err1_sharded"] - v["err1_single"]) < 0.05
    assert v["cam_maxdiff"] < 5e-3
