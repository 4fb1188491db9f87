"""Device-mesh construction helpers.

The engine scales with a 2-D ``jax.sharding.Mesh``:

* ``data`` — pair/observation parallelism: image pairs of the match graph and
  BA observation blocks shard here (the DP equivalent of the reference's
  ThreadPoolExecutor fan-out, Runner.py:186-191).
* ``model`` — intra-kernel parallelism: the matcher's descriptor database
  shards here (TP-equivalent, SURVEY.md §2.3).

XLA routes the resulting collectives (psum/all_gather) over ICI within a slice
and DCN across hosts; multi-host process groups come up via
``jax.distributed.initialize`` (see ``init_distributed``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    model_parallel: Optional[int] = None,
) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    ``model_parallel`` defaults to 2 when the device count allows, else 1 —
    matching workloads where matching shards the descriptor database across a
    small model group while pairs fan out over the rest.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n >= 4 else 1
    assert n % model_parallel == 0
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def put_global(arr, mesh: Mesh, spec) -> jax.Array:
    """Place a host array as a global ``jax.Array`` sharded by ``spec`` over
    ``mesh`` — including meshes that span multiple processes.

    Single-process this is a plain ``device_put``. Multi-process, every
    process must hold the identical full host array (the engine computes its
    host-side state redundantly per process, SPMD-style); each process then
    contributes exactly the shards it addresses, which is the contract
    ``jax.make_array_from_callback`` implements.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    host = np.asarray(arr)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host process group (jax.distributed). No-op when
    running single-process. This replaces 'nothing' in the reference — its only
    concurrency is a thread pool + lock (SURVEY.md §2.3, §5.8)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
