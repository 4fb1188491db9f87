"""Driver entry-point contracts (__graft_entry__.py).

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(n)`` to validate the sharded programs on n virtual CPU
devices. These tests pin the round-5 fix that made ``dryrun_multichip``
self-sufficient about its device pool: under the tunnel, the axon
sitecustomize pins ``jax_platforms='axon,cpu'`` through the CONFIG (which
outranks the ``JAX_PLATFORMS`` env var), so the dryrun must force the CPU
platform itself exactly as tests/conftest.py does.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_cpu_mesh():
    """dryrun_multichip(8) must succeed in a subprocess with NO JAX env
    overrides — even when the inherited environment pins jax to the single
    tunneled TPU (regression: round-5 found it raising 'cannot reshape array
    of size 1 into shape (4,2)' from make_mesh under the tunnel env)."""
    env = dict(os.environ)
    # Simulate a driver that sets nothing: drop the conftest's own forcing.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN-OK')",
        ],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DRYRUN-OK" in r.stdout
