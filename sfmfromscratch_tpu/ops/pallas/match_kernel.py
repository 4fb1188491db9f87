"""Fused blocked top-2 descriptor-matching Pallas kernel.

Computes, for every query descriptor, the two nearest database descriptors
(squared Euclidean) WITHOUT materializing the (n1, n2) distance matrix in HBM:
each grid step holds a (TM, D) query tile in VMEM, streams the database in
(TN, D) column tiles through the MXU (dist^2 ranking via n2sq - 2 a.b^T), and
maintains a running top-2 merge on the VPU.

Replaces the HBM round trip of the XLA path (ops/matcher.py: full (n1, n2)
matrix + lax.top_k) — the TP-style blocked-matmul matcher the north star names
(BASELINE.json; reference hot loop NNRatioFeatureMatcher.py:31-41).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes (env-overridable for sweeps). TN=2048 measured best on the
# BATCHED pair grid — the config-4/5 shape — where grid-step pipelining
# overlaps the VPU top-2 merge with the next tile's matmul: 39.8 TFLOP/s =
# 20.2% MXU at B=8 x 2499^2 x 128 on v5e (TN=512: 14.1%). Solo-pair timings
# are tunnel-noise-bound (0.14-0.30 ms) and insensitive to TN beyond noise.
_TM = int(os.environ.get("SFM_MATCH_TM", "256"))    # query tile rows
_TN = int(os.environ.get("SFM_MATCH_TN", "2048"))   # database tile columns
# Databases up to this size take the single-shot path: one full-row matmul +
# one top-2 merge per query tile, no fori_loop carry (cur is (TM, n2) f32 =
# 4 MB at the cap — comfortably VMEM-resident next to d2).
_SINGLESHOT_MAX = int(os.environ.get("SFM_MATCH_SINGLESHOT", "4096"))


def _match_kernel(d1_ref, d2_ref, n2sq_ref, dist1_ref, dist2_ref, idx_ref,
                  *, bf16: bool = False):
    # Refs carry a leading batch dim of 1 (the grid's batch axis selects the
    # pair; the same kernel serves the single-pair and batched entry points).
    TM = d1_ref.shape[1]
    n2 = d2_ref.shape[1]
    TN = min(_TN, n2)
    num_tiles = pl.cdiv(n2, TN)

    d1 = d1_ref[0]                     # (TM, D)
    if bf16:
        d1 = d1.astype(jnp.bfloat16)
    big = jnp.float32(1e30)

    if n2 <= _SINGLESHOT_MAX:
        # Single-shot path (n2 fits one tile): one matmul over the full row
        # and ONE top-2 merge — no fori_loop carry serializing the VPU merge
        # against the MXU, and no running-merge bookkeeping at all.
        d2 = d2_ref[0]
        if bf16:
            d2 = d2.astype(jnp.bfloat16)
        cross = jax.lax.dot_general(
            d1, d2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (TM, n2)
        cur = n2sq_ref[0, 0][None, :] - 2.0 * cross
        b1 = jnp.min(cur, axis=1)
        i1 = jnp.argmin(cur, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TM, n2), 1)
        b2 = jnp.min(jnp.where(cols == i1[:, None], big, cur), axis=1)
        dist1_ref[0, :, 0] = b1
        dist2_ref[0, :, 0] = b2
        idx_ref[0, :, 0] = i1
        return

    def body(t, carry):
        b1, i1, b2 = carry
        start = t * TN
        d2_tile = d2_ref[0, pl.ds(start, TN), :]       # (TN, D)
        if bf16:
            d2_tile = d2_tile.astype(jnp.bfloat16)
        n2sq = n2sq_ref[0, 0, pl.ds(start, TN)]        # (TN,)
        cross = jax.lax.dot_general(
            d1, d2_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (TM, TN)
        cur = n2sq[None, :] - 2.0 * cross
        # Mask columns past n2 (last ragged tile).
        cols = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) + start
        cur = jnp.where(cols < n2, cur, big)

        min1 = jnp.min(cur, axis=1)
        arg1 = jnp.argmin(cur, axis=1).astype(jnp.int32)
        local_cols = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
        masked = jnp.where(local_cols == arg1[:, None], big, cur)
        min2 = jnp.min(masked, axis=1)
        g1 = arg1 + start

        new_b1 = jnp.minimum(b1, min1)
        new_i1 = jnp.where(b1 <= min1, i1, g1)
        new_b2 = jnp.minimum(jnp.maximum(b1, min1), jnp.minimum(b2, min2))
        return new_b1, new_i1, new_b2

    init = (
        jnp.full((TM,), big, jnp.float32),
        jnp.zeros((TM,), jnp.int32),
        jnp.full((TM,), big, jnp.float32),
    )
    b1, i1, b2 = jax.lax.fori_loop(0, num_tiles, body, init)
    dist1_ref[0, :, 0] = b1
    dist2_ref[0, :, 0] = b2
    idx_ref[0, :, 0] = i1


def _match_top2_batched(d1, d2, n2sq, interpret: bool, bf16: bool = False):
    """Natively batched grid: d1 (B, n1, D), d2 (B, n2, D), n2sq (B, 1, n2)
    -> (B, n1) dist1/dist2 (relative, ||a||^2 not yet added) + idx."""
    B, n1, D = d1.shape
    n2 = d2.shape[1]
    TM = min(_TM, n1)
    grid = (B, pl.cdiv(n1, TM))

    dist1, dist2, idx = pl.pallas_call(
        functools.partial(_match_kernel, bf16=bf16),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, n1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, n1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, n1, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, TM, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TM, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(d1, d2, n2sq)
    return dist1[..., 0], dist2[..., 0], idx[..., 0]


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def match_top2_fused(d1: jax.Array, d2: jax.Array, mask2=None,
                     interpret: bool = False, bf16: bool = False):
    """(dist1, dist2, idx): per-query nearest and second-nearest squared
    distances (actual, including the ||a||^2 term) and the nearest index.

    d1: (n1, D) queries; d2: (n2, D) database; both float32. Masked database
    rows are excluded by inflating their ||b||^2 term past the tile sentinel.
    ``jax.vmap`` over this function dispatches to the natively-batched grid
    (custom_vmap rule) — the batched matcher (ops/matcher.match_pairs_batch)
    rides it with no (B, n1, n2) HBM distance tensor.

    ``bf16=True`` runs the cross-term matmul with bfloat16 multiplicands
    (float32 accumulation): ~4x the MXU rate on v5e. RootSIFT descriptors
    live in [0, 1] so the rounding is ~0.4% relative on the cross term —
    measure match-set agreement before enabling in a parity-critical path
    (benchmarks/kernels.py reports both rows).
    """
    n1sq = jnp.sum(d1 * d1, axis=-1)
    n2sq = jnp.sum(d2 * d2, axis=-1)
    if mask2 is not None:
        n2sq = jnp.where(mask2, n2sq, 1e12)

    @jax.custom_batching.custom_vmap
    def core(d1, d2, n2sq):
        r1, r2, idx = _match_top2_batched(
            d1[None], d2[None], n2sq[None, None, :], interpret, bf16
        )
        return r1[0], r2[0], idx[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, d1b, d2b, n2sqb):
        bcast = lambda x, b: (
            x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        )
        d1b = bcast(d1b, in_batched[0])
        d2b = bcast(d2b, in_batched[1])
        n2sqb = bcast(n2sqb, in_batched[2])
        out = _match_top2_batched(d1b, d2b, n2sqb[:, None, :], interpret, bf16)
        return out, (True, True, True)

    dist1, dist2, idx = core(d1, d2, n2sq)

    # Add the per-row ||a||^2 term to recover true squared distances.
    sq1 = jnp.maximum(dist1 + n1sq, 0.0)
    sq2 = jnp.maximum(dist2 + n1sq, 0.0)
    return sq1, sq2, idx.astype(jnp.int32)
