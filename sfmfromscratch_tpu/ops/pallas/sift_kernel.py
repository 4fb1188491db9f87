"""Fused SIFT descriptor-histogram Pallas kernel.

Completes the north star's "SIFT descriptors as Pallas kernels"
(BASELINE.json): given the per-keypoint gradient windows, ONE VMEM-resident
pass computes dominant orientation, orientation subtraction, the 4x4x8 cell
histograms and the RootSIFT normalization (reference per-keypoint loops at
ScaleRotInvSIFT.py:24-87, NaiveSIFT.py:122-173).

Why a kernel: the XLA path (ops/sift.py) materializes one-hot tensors for the
histogram matmuls — (K, S^2, 36) for the dominant-orientation histogram alone
is ~90 MB of HBM traffic at K=2500 — where this kernel keeps everything in
VMEM and binning is 36 VPU masked reductions + 8 MXU matmuls against
iota-built 0/1 cell maps (no gather, no scatter, no one-hot in HBM).

Patch *gather* stays in XLA (`ops/sift._extract_patches`): per-keypoint
dynamic_slice is exactly what Mosaic cannot lower, and it is a bandwidth-cheap
operation XLA handles well. Semantics match ops/sift.py bit-for-bit in exact
arithmetic (binning boundaries, drop-vs-wrap out-of-range handling, RootSIFT);
floating-point reassociation differs, so tests compare with tolerances.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GRID = 4
_CELL = 4
_NBINS = 8
_DOM_BINS = 36
_REGION = _GRID * _CELL  # 16
_BLOCK_K = 256           # keypoints per program


def _sift_hist_kernel(mag_ref, ori_ref, out_ref, *, S: int,
                      rotation_invariant: bool, wrap: bool):
    mag = mag_ref[...]                     # (Bk, S*S) window-masked magnitudes
    ori = ori_ref[...]                     # (Bk, S*S) raw orientations
    Bk, P = mag.shape
    pi = math.pi
    f32 = mag.dtype

    if rotation_invariant:
        # 36-bin weighted histogram -> argmax bin center
        # (reference ScaleRotInvSIFT.py:24-31). Unrolled masked reductions;
        # strict > keeps the FIRST max like jnp.argmax.
        w36 = 2.0 * pi / _DOM_BINS
        idx36 = jnp.clip(jnp.floor((ori + pi) / w36), 0, _DOM_BINS - 1)
        best_h = jnp.full((Bk,), -jnp.inf, f32)
        best_b = jnp.zeros((Bk,), f32)
        for b in range(_DOM_BINS):
            h = jnp.sum(mag * (idx36 == float(b)).astype(f32), axis=1)
            take = h > best_h
            best_h = jnp.where(take, h, best_h)
            best_b = jnp.where(take, float(b), best_b)
        dom = -pi + (best_b + 0.5) * w36
        ori = ori - dom[:, None]

    w8 = 2.0 * pi / _NBINS
    if wrap:
        # Wrap into [-pi, pi) instead of dropping.
        ori = ori - jnp.floor((ori + pi) / (2.0 * pi)) * (2.0 * pi)
        wm = mag
    else:
        # np.histogram semantics: out-of-range values contribute nothing
        # (reference ScaleRotInvSIFT.py:62-76).
        in_range = (ori >= -pi) & (ori <= pi)
        wm = mag * in_range.astype(f32)
    idx8 = jnp.clip(jnp.floor((ori + pi) / w8), 0, _NBINS - 1)

    # Static pixel -> descriptor-column map: only the top-left 16x16 of the
    # window feeds the histograms (reference quirk, SURVEY.md §3.4); column of
    # pixel (r, c) in bin b is ((r//4)*4 + c//4)*8 + b.
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
    r = p_iota // S
    c = p_iota % S
    valid = (r < _REGION) & (c < _REGION)
    colmap = (r // _CELL) * (_GRID * _NBINS) + (c // _CELL) * _NBINS
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)

    desc = jnp.zeros((Bk, 128), f32)
    for b in range(_NBINS):
        Mb = ((colmap + b == col_iota) & valid).astype(f32)   # (P, 128)
        contrib = wm * (idx8 == float(b)).astype(f32)         # (Bk, P)
        desc = desc + jnp.dot(contrib, Mb, preferred_element_type=jnp.float32)

    # RootSIFT: L2-normalize then sqrt (reference NaiveSIFT.py:165-170).
    n = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True))
    desc = jnp.where(n > 0, desc / jnp.maximum(n, 1e-12), desc)
    out_ref[...] = jnp.sqrt(desc)


def _hist_pallas_flat(mag: jax.Array, ori: jax.Array, S: int,
                      rotation_invariant: bool, wrap: bool,
                      interpret: bool) -> jax.Array:
    """(K, S*S) windows -> (K, 128) descriptors, grid over keypoint blocks."""
    K, P = mag.shape
    Kp = ((K + _BLOCK_K - 1) // _BLOCK_K) * _BLOCK_K
    if Kp != K:
        mag = jnp.pad(mag, ((0, Kp - K), (0, 0)))
        ori = jnp.pad(ori, ((0, Kp - K), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _sift_hist_kernel, S=S,
            rotation_invariant=rotation_invariant, wrap=wrap,
        ),
        grid=(Kp // _BLOCK_K,),
        out_shape=jax.ShapeDtypeStruct((Kp, 128), mag.dtype),
        in_specs=[
            pl.BlockSpec((_BLOCK_K, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_K, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_K, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mag, ori)
    return out[:K]


@functools.partial(
    jax.jit, static_argnames=("rotation_invariant", "wrap", "interpret")
)
def sift_histograms_pallas(
    mags: jax.Array,
    oris: jax.Array,
    rotation_invariant: bool = True,
    wrap: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """(K, S, S) window-masked magnitude + orientation patches -> (K, 128)
    RootSIFT descriptors. ``jax.vmap`` flattens the batch into the keypoint
    grid (keypoints are independent) instead of failing to lower a batched
    block spec."""
    S = mags.shape[-1]

    @jax.custom_batching.custom_vmap
    def run(m, o):
        return _hist_pallas_flat(
            m.reshape(-1, S * S), o.reshape(-1, S * S), S,
            rotation_invariant, wrap, interpret,
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, m, o):
        B, K = m.shape[0], m.shape[1]
        flat = _hist_pallas_flat(
            m.reshape(B * K, S * S), o.reshape(B * K, S * S), S,
            rotation_invariant, wrap, interpret,
        )
        return flat.reshape(B, K, 128), True

    return run(mags, oris)
