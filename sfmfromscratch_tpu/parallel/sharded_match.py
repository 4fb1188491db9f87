"""Tensor-parallel NN-ratio matching: descriptor database sharded over the
``model`` mesh axis.

When one image's descriptor set outgrows a chip (or to cut matcher latency),
the (n2, D) database shards across devices; each device computes a partial
top-2 against its shard, and the global top-2 merges with one ``all_gather``
of 2 candidates per shard — the TP-equivalent design from SURVEY.md §2.3.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sfmfromscratch_tpu.ops.matcher import pairwise_sq_dists
from sfmfromscratch_tpu.types import MatchResult

_BIG = 1e12


def tp_match_ratio_test(
    mesh: Mesh,
    d1: jax.Array,
    d2: jax.Array,
    mask1: Optional[jax.Array] = None,
    mask2: Optional[jax.Array] = None,
    ratio_threshold: float = 0.8,
    axis: str = "model",
) -> MatchResult:
    """Distributed Lowe's-ratio matching, numerically identical to the
    single-device ``match_ratio_test``. d2/mask2 shard along ``axis``;
    d1 is replicated."""
    n1 = d1.shape[0]
    n2 = d2.shape[0]
    if mask1 is None:
        mask1 = jnp.ones((n1,), dtype=bool)
    if mask2 is None:
        mask2 = jnp.ones((n2,), dtype=bool)

    def shard_fn(d1_r, m1_r, d2_s, m2_s):
        sq = pairwise_sq_dists(d1_r, d2_s)                     # (n1, n2/m)
        sq = jnp.where(m2_s[None, :], sq, _BIG)
        neg_v, idx = jax.lax.top_k(-sq, 2)                     # local top-2
        shard_size = d2_s.shape[0]
        offset = jax.lax.axis_index(axis) * shard_size
        gidx = idx + offset
        # Gather the 2 candidates from every shard and merge.
        all_v = jax.lax.all_gather(neg_v, axis)                # (m, n1, 2)
        all_i = jax.lax.all_gather(gidx, axis)
        m = all_v.shape[0]
        cand_v = jnp.transpose(all_v, (1, 0, 2)).reshape(n1, 2 * m)
        cand_i = jnp.transpose(all_i, (1, 0, 2)).reshape(n1, 2 * m)
        top_v, top_slot = jax.lax.top_k(cand_v, 2)             # global top-2
        nearest = jnp.take_along_axis(cand_i, top_slot, axis=1)[:, 0]
        d_first = jnp.sqrt(jnp.maximum(-top_v[:, 0], 0.0))
        d_second = jnp.sqrt(jnp.maximum(-top_v[:, 1], 0.0))
        ratio = d_first / jnp.maximum(d_second, 1e-12)
        ok = (d_second > 0) & (ratio <= ratio_threshold) & (d_second < jnp.sqrt(_BIG) - 1)
        ok = ok & m1_r
        sort_key = jnp.where(ok, ratio, jnp.inf)
        order_key, order = jax.lax.top_k(-sort_key, n1)
        rows = order.astype(jnp.int32)
        out_mask = jnp.isfinite(-order_key)
        indices = jnp.stack([rows, nearest[rows].astype(jnp.int32)], axis=-1)
        confidence = jnp.where(out_mask, ratio[rows], 0.0)
        indices = jnp.where(out_mask[:, None], indices, 0)
        return indices, confidence, out_mask

    in_specs = (P(), P(), P(axis, None), P(axis))
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    args = (d1, mask1, d2, mask2)
    if jax.process_count() > 1:
        # Multi-host: lift to global arrays (each process holds the full
        # inputs and contributes its addressable shards).
        from sfmfromscratch_tpu.parallel.mesh import put_global

        args = tuple(put_global(a, mesh, s) for a, s in zip(args, in_specs))
    indices, confidence, mask = jax.jit(fn)(*args)
    return MatchResult(indices=indices, confidence=confidence, mask=mask)
