"""Packed device->host fetch.

Over the tunneled TPU every fetched *array* costs a full host<->device round
trip (~25 ms) regardless of its size, so a ``jax.device_get`` of a 17-leaf
tuple pays 17 round trips — round 2's headline bottleneck (front.fetch was
0.86 s of a 1.44 s wall; VERDICT round-2 item 1).  ``device_get_packed``
concatenates all float leaves into ONE flat f32 device buffer and all
integer/bool leaves into ONE flat i32 buffer, fetches those two arrays, and
re-slices on the host — at most two round trips for any number of leaves,
with bandwidth (a few MB) instead of latency as the cost.

Exactness contract: f32/bf16/f16 floats and <=32-bit ints/bools round-trip
losslessly (bf16/f16 -> f32 is exact; ints pass through i32 verbatim).
64-bit dtypes are rejected — under JAX's default x64-disabled config no
device array carries them.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sync_device(x) -> None:
    """Force completion of ``x``'s producing computation (diagnostics).

    ``block_until_ready`` is unreliable over the axon tunnel (it can return
    before execution finishes); fetching one element is the portable barrier.
    Costs one ~26 ms round trip."""
    jax.device_get(jnp.ravel(jnp.asarray(x))[:1])


@jax.jit
def _pack_f32(parts):
    return jnp.concatenate([p.astype(jnp.float32).reshape(-1) for p in parts])


@jax.jit
def _pack_i32(parts):
    return jnp.concatenate([p.astype(jnp.int32).reshape(-1) for p in parts])


def device_get_packed(*arrays) -> List[np.ndarray]:
    """Fetch ``arrays`` (device or host) in at most two transfers; returns
    host numpy arrays with the original shapes and dtypes, in order."""
    jarrs = [jnp.asarray(a) for a in arrays]
    plan: List[Tuple[str, tuple, np.dtype]] = []
    f_parts, i_parts = [], []
    for a in jarrs:
        dt = np.dtype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating):
            if dt.itemsize > 4:
                raise TypeError(f"device_get_packed: {dt} would be lossy")
            plan.append(("f", a.shape, dt))
            f_parts.append(a)
        elif jnp.issubdtype(a.dtype, jnp.integer) or a.dtype == jnp.bool_:
            if dt.itemsize > 4:
                raise TypeError(f"device_get_packed: {dt} would be lossy")
            plan.append(("i", a.shape, dt))
            i_parts.append(a)
        else:
            raise TypeError(f"device_get_packed: unsupported dtype {dt}")

    # Dispatch both packs before fetching either (compute/transfer overlap).
    fbuf = _pack_f32(tuple(f_parts)) if f_parts else None
    ibuf = _pack_i32(tuple(i_parts)) if i_parts else None
    fetch = [b for b in (fbuf, ibuf) if b is not None]
    got = jax.device_get(tuple(fetch))
    gi = 0
    if fbuf is not None:
        fhost = np.asarray(got[gi]); gi += 1
    if ibuf is not None:
        ihost = np.asarray(got[gi]); gi += 1

    outs: List[np.ndarray] = []
    foff = ioff = 0
    for kind, shape, dt in plan:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if kind == "f":
            seg = fhost[foff : foff + n]
            foff += n
            out = seg if dt == np.float32 else seg.astype(dt)
        else:
            seg = ihost[ioff : ioff + n]
            ioff += n
            out = seg.astype(dt) if dt != np.int32 else seg
        outs.append(out.reshape(shape))
    return outs
